package graft.api

import graft.SparkTestBase

class CheckpointingSpec extends SparkTestBase {
  import spark.implicits._

  private def withMode[A](mode: Option[String], dir: Option[String] = None)(body: => A): A = {
    mode.foreach(spark.conf.set(Checkpointing.ModeKey, _))
    dir.foreach(spark.conf.set(Checkpointing.DirKey, _))
    try body finally {
      spark.conf.set(Checkpointing.ModeKey, "local")
      spark.conf.unset(Checkpointing.DirKey)
    }
  }

  test("default mode is local: no checkpoint dir touched, lineage truncated") {
    val d = Seq(1, 2, 3).toDF("x")
    val cp = Checkpointing.checkpoint(d)
    cp.collect().map(_.getInt(0)).sorted.toSeq shouldBe Seq(1, 2, 3)
    cp.queryExecution.analyzed.toString should not include "Project" // plain scan
  }

  test("reliable mode without a dir (and none pre-set) fails fast") {
    // must run BEFORE any test sets the context checkpoint dir — the guard
    // only fires when no dir has ever been configured on the SparkContext
    assume(spark.sparkContext.getCheckpointDir.isEmpty)
    withMode(Some("reliable")) {
      an[ConfigException] should be thrownBy
        Checkpointing.checkpoint(Seq(1).toDF("x"))
    }
    withMode(Some("sideways")) {
      an[ConfigException] should be thrownBy
        Checkpointing.checkpoint(Seq(1).toDF("x"))
    }
  }

  test("reliable mode writes RDD checkpoint files to the configured dir") {
    val dir = tmpDir("graft-ckpt")
    withMode(Some("reliable"), Some(dir)) {
      val cp = Checkpointing.checkpoint(Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
      cp.count() shouldBe 2
      spark.sparkContext.getCheckpointDir.isDefined shouldBe true
      // a reliable checkpoint leaves rdd-N directories on the filesystem
      val files = new java.io.File(spark.sparkContext.getCheckpointDir.get
        .stripPrefix("file:")).listFiles()
      files should not be null
      files.exists(_.getName.startsWith("rdd-")) shouldBe true
    }
  }

  test("Dedup.clusters converges identically under reliable checkpointing") {
    val dir = tmpDir("graft-ckpt2")
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val local = graft.dedup.Dedup.clusters(pairs).as[(Long, Long)].collect().toSet
    withMode(Some("reliable"), Some(dir)) {
      graft.dedup.Dedup.clusters(pairs).as[(Long, Long)].collect().toSet shouldBe local
    }
    local shouldBe Set((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L), (11L, 10L))
  }
}
