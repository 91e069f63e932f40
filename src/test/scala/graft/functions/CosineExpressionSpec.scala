package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class CosineExpressionSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val vecs = {
    val rnd = new scala.util.Random(7)
    (0 until 200).map { i =>
      (i.toLong,
        Array.fill(64)(rnd.nextFloat() - 0.5f),
        Array.fill(64)(rnd.nextFloat() - 0.5f))
    }.toDF("id", "a", "b")
  }

  test("native codegen expression is bit-identical to the HOF reference form") {
    val both = vecs.select(
      VectorFunctions.cosine(col("a"), col("b")).as("native"),
      VectorFunctions.cosineHof(col("a"), col("b")).as("hof"))
    both.where("native != hof OR (native IS NULL) != (hof IS NULL)").count() shouldBe 0
  }

  test("identity, orthogonality, zero-vector and null handling") {
    val df = Seq(
      (Array(1f, 2f, 3f), Array(1f, 2f, 3f), "same"),
      (Array(1f, 0f), Array(0f, 1f), "ortho"),
      (Array(0f, 0f), Array(1f, 1f), "zero"))
      .toDF("a", "b", "tag")
    val m = df.select(col("tag"), VectorFunctions.cosine(col("a"), col("b")).as("c"))
      .as[(String, Double)].collect().toMap
    m("same") shouldBe 1.0 +- 1e-9
    m("ortho") shouldBe 0.0
    m("zero") shouldBe 0.0
    val withNull = Seq((Some(Array(1f)), None: Option[Array[Float]])).toDF("a", "b")
    withNull.select(VectorFunctions.cosine(col("a"), col("b")))
      .collect().head.isNullAt(0) shouldBe true
  }

  test("mixed element types (float corpus vs double query) and type errors") {
    val df = Seq((Array(1f, 2f), Array(1.0, 2.0))).toDF("f", "d")
    df.select(VectorFunctions.cosine(col("f"), col("d")).as("c"))
      .as[Double].head() shouldBe 1.0 +- 1e-12
    val bad = Seq(("x", Array(1.0))).toDF("s", "d")
    an[Exception] should be thrownBy
      bad.select(VectorFunctions.cosine(col("s"), col("d"))).collect()
  }

  test("SQL registration via GraftExtensions: cosine_similarity callable from spark.sql") {
    graft.functions.expressions.GraftExtensions.register(spark)
    vecs.createOrReplaceTempView("cosine_sql_vecs")
    val viaSql = spark.sql(
      "SELECT id, cosine_similarity(a, b) AS c FROM cosine_sql_vecs")
    val viaCol = vecs.select(col("id"), VectorFunctions.cosine(col("a"), col("b")).as("c"))
    viaSql.exceptAll(viaCol).count() shouldBe 0
  }

  test("SQL registration: dot_product and shingle_hashes callable from spark.sql") {
    import spark.implicits._
    graft.functions.expressions.GraftExtensions.register(spark)
    spark.sql("SELECT dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
      .as[Double].head() shouldBe 11.0
    spark.sql("SELECT size(shingle_hashes('a b c d', 2)) AS n")
      .as[Int].head() shouldBe 3
  }

  test("NormalizeVector is bit-identical to the HOF reference form; " +
    "zero vector passes through; unit norm") {
    val both = vecs.select(
      VectorFunctions.normalize(col("a")).as("native"),
      VectorFunctions.normalizeHof(col("a")).as("hof"))
    both.where("native != hof").count() shouldBe 0
    val edge = Seq(
      (Array(0f, 0f, 0f), "zero"),
      (Array(3f, 4f), "pyth")).toDF("a", "tag")
    val m = edge.select(col("tag"), VectorFunctions.normalize(col("a")).as("n"))
      .as[(String, Seq[Double])].collect().toMap
    m("zero") shouldBe Seq(0.0, 0.0, 0.0)
    m("pyth") shouldBe Seq(0.6, 0.8)
    val withNull = Seq((1L, None: Option[Array[Float]])).toDF("id", "a")
    withNull.select(VectorFunctions.normalize(col("a")))
      .collect().head.isNullAt(0) shouldBe true
  }

  test("a null ELEMENT null-propagates the whole normalized vector — " +
    "never silently read as 0.0 — in both interpreted and codegen paths") {
    // parquet round-trip: arrays load with containsNull = true and the
    // codegen'd projection runs against a real scan
    val dir = tmpDir("normalize-nullelem")
    Seq((1L, Seq[Option[Double]](Some(1.0), None, Some(2.0))),
        (2L, Seq[Option[Double]](Some(3.0), Some(4.0))))
      .toDF("id", "a").write.mode("overwrite").parquet(dir)
    val out = spark.read.parquet(dir)
      .select(col("id"), VectorFunctions.normalize(col("a")).as("n"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getSeq[Double](1)))
      .toMap
    out(1L) shouldBe null
    out(2L) shouldBe Seq(0.6, 0.8)
  }

  test("null ELEMENTS and length mismatch yield null — matching the " +
    "zip_with HOF reference, never a silent prefix/0.0 score") {
    // parquet round-trip so containsNull = true and the codegen'd branch runs
    val dir = tmpDir("cosine-nullelem")
    Seq(
      (1L, Seq[Option[Float]](Some(1f), None, Some(2f)), Seq[Option[Float]](Some(1f), Some(1f), Some(1f))),
      (2L, Seq[Option[Float]](Some(1f), Some(2f), Some(3f)), Seq[Option[Float]](Some(1f), Some(2f))),
      (3L, Seq[Option[Float]](Some(1f), Some(2f)), Seq[Option[Float]](Some(1f), Some(2f))))
      .toDF("id", "a", "b").write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir).select(
      col("id"),
      VectorFunctions.cosine(col("a"), col("b")).as("cn"),
      VectorFunctions.cosineHof(col("a"), col("b")).as("ch"),
      graft.functions.expressions.DotProduct(col("a"), col("b")).as("dn"),
      VectorFunctions.dot(col("a"), col("b")).as("dh"))
    val rows = df.collect().map(r => r.getLong(0) -> r).toMap
    rows(1L).isNullAt(1) shouldBe true // null element → null
    rows(2L).isNullAt(1) shouldBe true // length mismatch → null
    rows(3L).isNullAt(1) shouldBe false
    // and exact agreement with the HOF forms on every row
    df.where("(cn IS NULL) != (ch IS NULL) OR cn != ch" +
      " OR (dn IS NULL) != (dh IS NULL) OR dn != dh").count() shouldBe 0
  }

  test("the expression participates in whole-stage codegen (no fallback)") {
    // a LocalRelation input would be constant-folded away; use a real scan
    val dir = tmpDir("cosine-wsc")
    vecs.write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir)
      .select(VectorFunctions.cosine(col("a"), col("b")).as("c"))
    // "*(n)" is the WholeStageCodegen marker in the compact plan string —
    // the projection containing the expression must carry it (no fallback)
    df.queryExecution.executedPlan.toString should include regex
      """\*\(\d+\) Project \[cosinesimilarity"""
    df.count() shouldBe 200 // and it actually executes through codegen
  }
}
