package graft.operators

import graft.SparkTestBase
import graft.api.{ConfigException, RunContext}
import graft.config.TransformConfig

class ClusterEmbeddingsSpec extends SparkTestBase {
  import spark.implicits._

  private val ctx = RunContext(spark, "t", "r")
  // three well-separated directions, several vectors each, plus exact copies
  private val vecs: Seq[(Long, Array[Float])] =
    (0 until 6).map(i => (i.toLong, Array(1f, 0.01f * i, 0f))) ++
    (10 until 16).map(i => (i.toLong, Array(0f, 1f, 0.01f * (i - 10)))) ++
    (20 until 26).map(i => (i.toLong, Array(0.01f * (i - 20), 0f, 1f)))

  private def cluster(opts: (String, String)*) =
    ClusterEmbeddingsTransform(vecs.toDF("vec_id", "embedding"),
      TransformConfig("c", "cluster_embeddings",
        (Map("idColumn" -> "vec_id", "vecColumn" -> "embedding",
          "nClusters" -> "3", "kmeansIters" -> "3") ++ opts.toMap)), ctx)

  test("every row assigned; ids within [0, nClusters); schema appended") {
    val out = cluster()
    out.columns.toSeq shouldBe Seq("vec_id", "embedding", "cluster_id")
    val assigned = out.select("vec_id", "cluster_id").as[(Long, Int)].collect()
    assigned.length shouldBe vecs.length
    all(assigned.map(_._2)) should (be >= 0 and be < 3)
  }

  test("deterministic, and each planted direction family stays together") {
    val a = cluster().select("vec_id", "cluster_id").as[(Long, Int)].collect().sortBy(_._1)
    val b = cluster().select("vec_id", "cluster_id").as[(Long, Int)].collect().sortBy(_._1)
    a shouldBe b
    val byFamily = a.groupBy(_._1 / 10).values.map(_.map(_._2).distinct.length)
    all(byFamily) shouldBe 1 // one cluster per direction family
    a.map(_._2).distinct.length shouldBe 3 // and the families don't merge
  }

  test("appendSim: centroid similarity is high within tight families") {
    val sims = cluster("appendSim" -> "centroid_sim")
      .select("centroid_sim").as[Double].collect()
    sims.length shouldBe vecs.length
    all(sims) should be > 0.99
  }

  test("appendSim is one fused plan node (codebook as a reference object), " +
    "bit-identical to cosine against the assigned centroid") {
    import org.apache.spark.sql.functions._
    val cents = graft.ann.Ann.kmeansCentroids(
      vecs.toDF("vec_id", "embedding"), "vec_id", "embedding", 3, 3)
    val out = cluster("appendSim" -> "centroid_sim")
    // parity: same value as explicitly fusing cosine(vec, centroids(assigned))
    val viaLookup = out.collect().map { r =>
      val sim = graft.functions.expressions.ArgTopCentroids.nearestSim(
        org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
          r.getSeq[Float](1).toArray), cents, isDouble = false, checkNulls = false)
      (r.getLong(0), sim.doubleValue())
    }.toMap
    out.select(col("vec_id"), col("centroid_sim")).as[(Long, Double)].collect()
      .foreach { case (id, s) => s shouldBe viaLookup(id) }
    // plan stays SMALL: no nClusters×dim literal explosion (parquet-backed
    // scan so the projection survives optimization)
    val dir = tmpDir("ncs-plan")
    vecs.toDF("vec_id", "embedding").write.mode("overwrite").parquet(dir)
    val planned = ClusterEmbeddingsTransform(spark.read.parquet(dir),
      TransformConfig("c", "cluster_embeddings",
        Map("idColumn" -> "vec_id", "vecColumn" -> "embedding",
          "nClusters" -> "3", "kmeansIters" -> "3", "appendSim" -> "csim")), ctx)
    val plan = planned.queryExecution.executedPlan.toString
    plan.toLowerCase should include ("nearestcentroidsim")
    plan.length should be < 4000
    // and a null-element vector degrades to null sim + null cluster
    val dirty = (vecs :+ (99L, null.asInstanceOf[Array[Float]]))
      .toDF("vec_id", "embedding")
      .union(Seq((98L, Seq[Option[Float]](Some(1f), None, Some(0f))))
        .toDF("vec_id", "embedding"))
    val nullRows = ClusterEmbeddingsTransform(dirty,
      TransformConfig("c", "cluster_embeddings",
        Map("idColumn" -> "vec_id", "vecColumn" -> "embedding",
          "nClusters" -> "3", "kmeansIters" -> "3", "appendSim" -> "csim")), ctx)
      .where("vec_id IN (98, 99)").select("cluster_id", "csim").collect()
    nullRows.foreach { r => r.isNullAt(0) shouldBe true; r.isNullAt(1) shouldBe true }
  }

  test("empty input with appendSim passes an empty frame through (the " +
    "zero-literal codebook used to fail analysis); null embeddings don't " +
    "crash codebook sampling") {
    val empty = ClusterEmbeddingsTransform(
      vecs.toDF("vec_id", "embedding").where("vec_id < 0"),
      TransformConfig("c", "cluster_embeddings",
        Map("idColumn" -> "vec_id", "vecColumn" -> "embedding",
          "nClusters" -> "3", "appendSim" -> "csim")), ctx)
    empty.count() shouldBe 0
    empty.columns should contain ("csim")
    // a null embedding row in the sample window must not NPE the driver
    val withNull = (vecs.map { case (i, v) => (i, v) } :+
      (99L, null.asInstanceOf[Array[Float]])).toDF("vec_id", "embedding")
    ClusterEmbeddingsTransform(withNull,
      TransformConfig("c", "cluster_embeddings",
        Map("idColumn" -> "vec_id", "vecColumn" -> "embedding",
          "nClusters" -> "3")), ctx).count() shouldBe 19
  }

  test("codebook store round-trip: the persisted codebook assigns exactly " +
    "like in-process training; stamp mismatch and broken stores fail fast") {
    val df = vecs.toDF("vec_id", "embedding")
    val store = CodebookTransform(df, TransformConfig("b", "codebook",
      Map("idColumn" -> "vec_id", "vecColumn" -> "embedding",
        "nLists" -> "3", "kmeansIters" -> "3")), ctx)
    store.columns.toSeq shouldBe
      Seq("list_id", "vec", "cb_n_lists", "cb_kmeans_iters", "cb_rows")
    store.count() shouldBe 3
    store.createOrReplaceTempView("cb_store")
    val viaStore = cluster("codebookView" -> "cb_store")
      .select("vec_id", "cluster_id").as[(Long, Int)].collect().sortBy(_._1)
    val inProc = cluster()
      .select("vec_id", "cluster_id").as[(Long, Int)].collect().sortBy(_._1)
    viaStore shouldBe inProc
    // asserted parameters must match the stamp
    val e = intercept[ConfigException] {
      cluster("codebookView" -> "cb_store", "nClusters" -> "5").collect()
    }
    e.getMessage should include("stamp")
    // a hole in list_id (centroid silently renumbered) fails fast
    store.where("list_id <> 1").createOrReplaceTempView("cb_holey")
    val e2 = intercept[ConfigException] {
      ClusterEmbeddingsTransform(df, TransformConfig("c", "cluster_embeddings",
        Map("idColumn" -> "vec_id", "vecColumn" -> "embedding",
          "codebookView" -> "cb_holey")), ctx).collect()
    }
    e2.getMessage should include("dense")
    // missing layout columns fail fast
    store.select("vec").createOrReplaceTempView("cb_nolid")
    an[ConfigException] should be thrownBy
      ClusterEmbeddingsTransform(df, TransformConfig("c", "cluster_embeddings",
        Map("idColumn" -> "vec_id", "vecColumn" -> "embedding",
          "codebookView" -> "cb_nolid")), ctx).collect()
    // a ZERO-ROW store (producing run saw no vectors) must fail loud —
    // every layout/stamp check passes vacuously on it, and the silent
    // outcome is null cluster ids on every row
    store.where("list_id < 0").createOrReplaceTempView("cb_empty")
    val e3 = intercept[ConfigException] {
      ClusterEmbeddingsTransform(df, TransformConfig("c", "cluster_embeddings",
        Map("idColumn" -> "vec_id", "vecColumn" -> "embedding",
          "codebookView" -> "cb_empty")), ctx).collect()
    }
    e3.getMessage should include("empty")
    // half-present stamp pair gets the guided layout error, not an
    // unresolved-column AnalysisException
    store.select("list_id", "vec", "cb_n_lists").createOrReplaceTempView("cb_halfstamp")
    val e4 = intercept[ConfigException] {
      ClusterEmbeddingsTransform(df, TransformConfig("c", "cluster_embeddings",
        Map("idColumn" -> "vec_id", "vecColumn" -> "embedding",
          "codebookView" -> "cb_halfstamp")), ctx).collect()
    }
    e4.getMessage should include("cb_kmeans_iters")
    // a store that lost its TAIL rows is still dense 0..n-1 — only the
    // produced-count stamp catches it
    store.where("list_id < 2").createOrReplaceTempView("cb_truncated")
    val e5 = intercept[ConfigException] {
      ClusterEmbeddingsTransform(df, TransformConfig("c", "cluster_embeddings",
        Map("idColumn" -> "vec_id", "vecColumn" -> "embedding",
          "codebookView" -> "cb_truncated")), ctx).collect()
    }
    e5.getMessage should include("lost rows")
    // a store round-tripped through wider integer stamps still validates
    store.selectExpr("list_id", "vec", "cast(cb_n_lists as bigint) cb_n_lists",
        "cast(cb_kmeans_iters as bigint) cb_kmeans_iters",
        "cast(cb_rows as bigint) cb_rows")
      .createOrReplaceTempView("cb_widened")
    cluster("codebookView" -> "cb_widened")
      .select("vec_id", "cluster_id").as[(Long, Int)].collect()
      .sortBy(_._1) shouldBe viaStore
    // a STAMP-LESS store (hand-built, only list_id + vec) is rejected:
    // skipping the check would let nClusters silently disagree with the
    // store's true size
    store.select("list_id", "vec").createOrReplaceTempView("cb_nostamps")
    an[ConfigException] should be thrownBy
      ClusterEmbeddingsTransform(df, TransformConfig("c", "cluster_embeddings",
        Map("idColumn" -> "vec_id", "vecColumn" -> "embedding",
          "codebookView" -> "cb_nostamps")), ctx).collect()
    // cb_rows alone missing is ALSO rejected (codebookFrame always writes
    // it, so a store re-projected without it lost the only tail-truncation
    // defense the dense-sequence check cannot provide)
    store.drop("cb_rows").createOrReplaceTempView("cb_norowstamp")
    val eNoRows = intercept[ConfigException] {
      ClusterEmbeddingsTransform(df, TransformConfig("c", "cluster_embeddings",
        Map("idColumn" -> "vec_id", "vecColumn" -> "embedding",
          "codebookView" -> "cb_norowstamp")), ctx).collect()
    }
    eNoRows.getMessage should include("cb_rows")
    // mixed centroid dimensionalities are store corruption, not data
    store.selectExpr("list_id",
        "CASE WHEN list_id = 1 THEN slice(vec, 1, 2) ELSE vec END AS vec",
        "cb_n_lists", "cb_kmeans_iters", "cb_rows")
      .createOrReplaceTempView("cb_mixdim")
    val e7 = intercept[ConfigException] {
      ClusterEmbeddingsTransform(df, TransformConfig("c", "cluster_embeddings",
        Map("idColumn" -> "vec_id", "vecColumn" -> "embedding",
          "codebookView" -> "cb_mixdim")), ctx).collect()
    }
    e7.getMessage should include ("dimensionalities")
    // a null CENTROID ELEMENT must fail loud, never unbox to 0.0f
    store.selectExpr("list_id",
        "CASE WHEN list_id = 1 THEN array(cast(1.0 as float), cast(null as float)) " +
          "ELSE vec END AS vec",
        "cb_n_lists", "cb_kmeans_iters", "cb_rows")
      .createOrReplaceTempView("cb_nullelem")
    val e6 = intercept[ConfigException] {
      ClusterEmbeddingsTransform(df, TransformConfig("c", "cluster_embeddings",
        Map("idColumn" -> "vec_id", "vecColumn" -> "embedding",
          "codebookView" -> "cb_nullelem")), ctx).collect()
    }
    e6.getMessage should include("null")
  }

  test("IVF ANN against the persisted codebook matches in-process IVF " +
    "with the same parameters") {
    val df = vecs.toDF("vec_id", "embedding")
    val store = graft.ann.Ann.codebookFrame(df, "vec_id", "embedding",
      nLists = 3, kmeansIters = 3)
    val queries = df.where("vec_id IN (0, 10, 20)")
      .selectExpr("vec_id AS query_id", "embedding")
    val viaStore = graft.ann.Ann.ivfTopKWithCodebook(df, queries,
      "vec_id", "embedding", "query_id", k = 3, store, nProbe = 1,
      wantNLists = Some(3), wantKmeansIters = Some(3))
      .as[(Long, Long, Int)].collect().sorted
    val inProc = graft.ann.Ann.ivfTopK(df, queries,
      "vec_id", "embedding", "query_id", k = 3, nLists = 3, nProbe = 1,
      kmeansIters = 3)
      .as[(Long, Long, Int)].collect().sorted
    viaStore shouldBe inProc
    viaStore should not be empty
  }

  test("nClusters=1 degenerates to one cluster; bad config fails fast") {
    cluster("nClusters" -> "1").select("cluster_id").as[Int].collect()
      .distinct shouldBe Array(0)
    an[ConfigException] should be thrownBy cluster("nClusters" -> "0")
    ClusterEmbeddingsTransform.validate(TransformConfig("c", "cluster_embeddings",
      Map("idColumn" -> "vec_id", "vecColumn" -> "nope")),
      vecs.toDF("vec_id", "embedding").schema) should not be empty
  }

  test("pq_codebook rejects m/nCentroids < 1 with guided ConfigException, " +
    "not a raw require failure") {
    val df = vecs.toDF("vec_id", "embedding")
    def pq(opts: (String, String)*) = PqCodebookTransform(df,
      TransformConfig("p", "pq_codebook",
        Map("idColumn" -> "vec_id", "vecColumn" -> "embedding") ++ opts), ctx)
    (the[ConfigException] thrownBy pq("m" -> "0")).getMessage should
      include ("pq_codebook: m must be >= 1, got 0")
    (the[ConfigException] thrownBy pq("nCentroids" -> "0")).getMessage should
      include ("pq_codebook: nCentroids must be >= 1, got 0")
  }
}
