package graft.operators

import graft.SparkTestBase
import graft.api.{ConfigException, RunContext}
import graft.config.TransformConfig

class ZOrderSpec extends SparkTestBase {
  import spark.implicits._

  private def ctx = RunContext(spark, "t", "r")
  private def run(df: org.apache.spark.sql.DataFrame, opts: (String, String)*) =
    ZOrderTransform(df, TransformConfig("z", "zorder",
      (Seq("columns" -> "x,y", "lo" -> "0,0", "hi" -> "4,4", "bits" -> "2") ++ opts).toMap), ctx)

  test("morton interleave: golden z-values on a 4x4 grid") {
    // bits=2 over [0,4): bin = value itself; z = interleave(xbits, ybits)
    val d = Seq((0.0, 0.0), (1.0, 0.0), (0.0, 1.0), (1.0, 1.0), (3.0, 3.0), (2.0, 1.0))
      .toDF("x", "y")
    val z = run(d).select("x", "y", "zvalue")
      .collect().map(r => (r.getDouble(0), r.getDouble(1)) -> r.getLong(2)).toMap
    z((0.0, 0.0)) shouldBe 0L  // 00|00
    z((1.0, 0.0)) shouldBe 1L  // x bit0 → position 0
    z((0.0, 1.0)) shouldBe 2L  // y bit0 → position 1
    z((1.0, 1.0)) shouldBe 3L
    z((3.0, 3.0)) shouldBe 15L // all four bits set
    z((2.0, 1.0)) shouldBe 6L  // x=10 → positions 2; y=01 → position 1
  }

  test("locality: z-range of a small 2-D box is tighter than row order") {
    val d = (for (x <- 0 until 16; y <- 0 until 16) yield (x.toDouble, y.toDouble))
      .toDF("x", "y")
    val z = run(d, "lo" -> "0,0", "hi" -> "16,16", "bits" -> "4")
    // the 4x4 box [4,8)x[4,8) occupies exactly ONE contiguous z-range
    // (it is a Z-curve quadrant): 16 cells, max-min = 15
    val inBox = z.where("x >= 4 AND x < 8 AND y >= 4 AND y < 8")
      .select("zvalue").collect().map(_.getLong(0))
    inBox.length shouldBe 16
    (inBox.max - inBox.min) shouldBe 15L
  }

  test("values clamp to bounds; nulls yield null z; cluster sorts within partitions") {
    val d = Seq((-5.0, 2.0), (99.0, 2.0)).toDF("x", "y")
    val z = run(d).select("zvalue").collect().map(_.getLong(0))
    z.foreach { v => v should be >= 0L; v should be <= 15L }
    val withNull = Seq((java.lang.Double.valueOf(1.0), java.lang.Double.valueOf(2.0)),
      (null.asInstanceOf[java.lang.Double], java.lang.Double.valueOf(2.0))).toDF("x", "y")
    run(withNull).where("zvalue IS NULL").count() shouldBe 1
    // cluster mode range-partitions + sorts: plan carries the range exchange
    val clustered = run((1 to 100).map(i => ((i % 7).toDouble, (i % 5).toDouble)).toDF("x", "y"),
      "cluster" -> "true")
    clustered.queryExecution.executedPlan.toString should include ("rangepartitioning")
    // null z-values land LAST under cluster ordering (Spark default is
    // NULLS FIRST — the transform must override), so null-dimension rows
    // end up in the tail files as the file-skipping layout assumes
    val nullsLast = run(withNull, "cluster" -> "true")
      .select("zvalue").coalesce(1).collect().map(r => Option(r.get(0)))
    nullsLast.last shouldBe None
    nullsLast.head should not be None
  }

  test("invalid configs fail fast") {
    val d = Seq((1.0, 2.0)).toDF("x", "y")
    an[ConfigException] should be thrownBy run(d, "columns" -> "x")
    an[ConfigException] should be thrownBy run(d, "bits" -> "40") // 40*2 > 62
    an[ConfigException] should be thrownBy run(d, "hi" -> "0,4") // hi <= lo
    an[ConfigException] should be thrownBy run(d, "lo" -> "0")   // arity
  }
}
