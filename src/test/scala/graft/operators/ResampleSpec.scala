package graft.operators

import java.sql.Timestamp

import graft.SparkTestBase
import graft.api.RunContext
import graft.config.TransformConfig

class ResampleSpec extends SparkTestBase {
  import spark.implicits._

  private def ctx = RunContext(spark, "t", "r")
  private def ts(h: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:30:00")

  private def events = Seq(
    ("a", ts(0), 1.0), ("a", ts(0), 2.0), // hour 0: two events
    ("a", ts(3), 4.0),                    // hours 1-2 missing
    ("b", ts(5), 8.0)).toDF("k", "t", "v")

  private def run(df: org.apache.spark.sql.DataFrame, opts: (String, String)*) =
    ResampleTransform(df, TransformConfig("rs", "resample",
      (Seq("timeColumn" -> "t", "interval" -> "1 hour",
        "aggregations" -> "n:count(*),sv:sum(v)") ++ opts).toMap), ctx)

  test("gaps between a key's first and last bucket are filled with nulls") {
    val out = run(events, "groupBy" -> "k")
    val a = out.where("k = 'a'").orderBy("bucket_start").collect()
    a.length shouldBe 4 // hours 0..3 — gap hours present
    a.map(r => if (r.isNullAt(2)) 0L else r.getLong(2)).toSeq shouldBe Seq(2L, 0L, 0L, 1L)
    a(0).getDouble(3) shouldBe 3.0
    a(1).isNullAt(3) shouldBe true // gap bucket: null aggregate
    // key b spans a single bucket: no gap rows invented
    out.where("k = 'b'").count() shouldBe 1
  }

  test("bucket starts align to the interval grid") {
    val out = run(events, "groupBy" -> "k")
    out.select("bucket_start").collect().foreach { r =>
      r.getTimestamp(0).getTime % (3600 * 1000L) shouldBe 0L
    }
  }

  test("no groupBy: one global grid") {
    val out = run(events)
    out.count() shouldBe 6 // hours 0..5 across all keys
    out.columns.toSeq shouldBe Seq("bucket_start", "n", "sv")
  }

  test("single-path plan: the input is scanned exactly once") {
    // the bounds-frame + grid-join formulation would plan the corpus
    // aggregation twice; the lead()-based gap generator must not
    val plan = run(events, "groupBy" -> "k").queryExecution.executedPlan.toString
    plan.linesIterator.count(_.contains("LocalTableScan")) shouldBe 1
  }
}
