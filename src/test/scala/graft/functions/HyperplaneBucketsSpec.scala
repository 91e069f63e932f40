package graft.functions

import graft.SparkTestBase
import graft.functions.expressions.{DotProduct, HyperplaneBuckets}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

class HyperplaneBucketsSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val vecs = {
    val rnd = new scala.util.Random(13)
    (0 until 300).map { i =>
      (i.toLong, Array.fill(32)(rnd.nextFloat() - 0.5f))
    }.toDF("id", "v")
  }

  /** The replaced round-2 form: tables×bits literal-plane DotProducts inlined
    * into the plan. Kept here as the bit-identity reference. */
  private def literalForm(vec: Column, tables: Int, bits: Int, dim: Int): Column =
    array((0 until tables).map { t =>
      (0 until bits).map { j =>
        val w = Seq.tabulate(dim)(i => HyperplaneBuckets.weight(t, j, i))
        when(DotProduct(vec, typedlit(w)) >= 0, 1 << j).otherwise(0)
      }.reduce(_ + _)
    }: _*)

  test("fused expression is bit-identical to the literal-plane form it replaced") {
    val both = vecs.select(
      HyperplaneBuckets(col("v"), 4, 10).as("fused"),
      literalForm(col("v"), 4, 10, 32).as("lit"))
    both.where("fused != lit").count() shouldBe 0
  }

  test("deterministic across evaluations, bucket ids within [0, 2^bits)") {
    val a = vecs.select(col("id"), HyperplaneBuckets(col("v"), 3, 8).as("b")).collect()
    val b = vecs.select(col("id"), HyperplaneBuckets(col("v"), 3, 8).as("b")).collect()
    a.map(_.toString) shouldBe b.map(_.toString)
    val flat = vecs.select(explode(HyperplaneBuckets(col("v"), 3, 8)).as("x"))
    flat.where("x < 0 OR x >= 256").count() shouldBe 0
  }

  test("null vector yields a null bucket array (dropped by explode downstream)") {
    val withNull = Seq((1L, Some(Array(1f, 2f))), (2L, None)).toDF("id", "v")
    val out = withNull.select(col("id"), HyperplaneBuckets(col("v"), 2, 4).as("b"))
    out.where("id = 2 AND b IS NULL").count() shouldBe 1
    withNull.select(col("id"), explode(HyperplaneBuckets(col("v"), 2, 4)))
      .where("id = 2").count() shouldBe 0
  }

  test("a null ELEMENT yields a null bucket array — never read as 0.0 — " +
    "in both interpreted and codegen paths") {
    val dir = tmpDir("hpb-nullelem")
    Seq((1L, Seq[Option[Float]](Some(1f), None)),
        (2L, Seq[Option[Float]](Some(1f), Some(2f))))
      .toDF("id", "v").write.mode("overwrite").parquet(dir)
    val out = spark.read.parquet(dir)
      .select(col("id"), HyperplaneBuckets(col("v"), 2, 4).as("b"))
      .collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    out(1L) shouldBe true
    out(2L) shouldBe false
  }

  test("double arrays accepted; non-array input rejected at analysis") {
    Seq((Array(0.5, -0.5), 0)).toDF("v", "z")
      .select(HyperplaneBuckets(col("v"), 2, 4).as("b"))
      .select(expr("size(b)")).as[Int].head() shouldBe 2
    val bad = Seq(("text", 0)).toDF("v", "z")
    an[Exception] should be thrownBy
      bad.select(HyperplaneBuckets(col("v"), 2, 4)).collect()
  }

  test("plan stays small and inside whole-stage codegen at q30-scale parameters") {
    // the round-2 pathology: (tables=6, bits=12, dim=64) inlined ~9,200
    // literal doubles and fell out of codegen. The fused node must keep the
    // plan tiny and codegen'd at the same parameters.
    val dir = tmpDir("hpb-wsc")
    val rnd = new scala.util.Random(5)
    (0 until 100).map(i => (i.toLong, Array.fill(64)(rnd.nextFloat() - 0.5f)))
      .toDF("id", "v").write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir)
      .select(HyperplaneBuckets(col("v"), 6, 12).as("b"))
    val plan = df.queryExecution.executedPlan.toString
    plan should include regex """\*\(\d+\) Project \[hyperplanebuckets"""
    plan.length should be < 20000
    df.count() shouldBe 100
  }

  test("SQL registration: hyperplane_buckets callable from spark.sql") {
    graft.functions.expressions.GraftExtensions.register(spark)
    vecs.createOrReplaceTempView("hpb_sql_vecs")
    val viaSql = spark.sql(
      "SELECT id, hyperplane_buckets(v, 3, 8) AS b FROM hpb_sql_vecs")
    val viaCol = vecs.select(col("id"), HyperplaneBuckets(col("v"), 3, 8).as("b"))
    viaSql.exceptAll(viaCol).count() shouldBe 0
    // foldable (non-literal) integral args resolve too
    spark.sql("SELECT size(hyperplane_buckets(array(1.0D), 1 + 1, CAST(4 AS BIGINT))) AS n")
      .as[Int].head() shouldBe 2
  }
}
