package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.api.RunContext
import graft.config.TransformConfig

class AsofJoinSpec extends SparkTestBase {
  import spark.implicits._

  // numeric time axis keeps the fixtures readable; timestamp parity is
  // covered by the oracle-checked q52 on the events table
  private def trades = Seq(
    ("A", 10L, 1L), ("A", 25L, 2L), ("A", 5L, 3L), ("B", 10L, 4L)
  ).toDF("sym", "t", "trade_id")
  private def quotes = Seq(
    ("A", 8L, 1.0), ("A", 10L, 2.0), ("A", 20L, 3.0), ("B", 50L, 9.0)
  ).toDF("sym", "t", "px")

  test("backward: greatest right time <= left time; tie includes the simultaneous row") {
    val out = AsofJoin.asofJoin(trades, quotes, Seq("sym"), "t", "t")
      .select("trade_id", "asof_px").as[(Long, Option[Double])].collect().toMap
    out(1L) shouldBe Some(2.0) // t=10 matches the quote AT 10, not 8
    out(2L) shouldBe Some(3.0) // t=25 → latest quote 20
    out(3L) shouldBe None      // t=5 → no quote yet
    out(4L) shouldBe None      // B: quote only at 50 > 10
  }

  test("null join keys never match — a null-keyed left row gets a null " +
    "payload, never a null-keyed right row's") {
    val l = Seq((null.asInstanceOf[String], 10L, 1L), ("A", 10L, 2L))
      .toDF("sym", "t", "trade_id")
    val r = Seq((null.asInstanceOf[String], 5L, 99.0), ("A", 5L, 1.5))
      .toDF("sym", "t", "px")
    val out = AsofJoin.asofJoin(l, r, Seq("sym"), "t", "t")
      .select("trade_id", "asof_px").as[(Long, Option[Double])].collect().toMap
    out(1L) shouldBe None      // NULL equals nothing (SQL join semantics)
    out(2L) shouldBe Some(1.5) // real keys unaffected
  }

  test("timestamp_ntz time axis: tolerance interpreted in microseconds") {
    import org.apache.spark.sql.types.TimestampNTZType
    def ts(s: String) = java.time.LocalDateTime.parse(s)
    val l = Seq((1L, ts("2024-01-01T10:00:10"))).toDF("id", "t")
      .withColumn("t", col("t").cast(TimestampNTZType))
    val r = Seq((1L, ts("2024-01-01T10:00:00"), 5.0)).toDF("id", "t", "px")
      .withColumn("t", col("t").cast(TimestampNTZType))
    // 10 s gap: within an 11-second tolerance, outside a 9-second one
    AsofJoin.asofJoin(l, r, Seq("id"), "t", "t", tolerance = Some(11000000L))
      .select("asof_px").as[Option[Double]].head() shouldBe Some(5.0)
    AsofJoin.asofJoin(l, r, Seq("id"), "t", "t", tolerance = Some(9000000L))
      .select("asof_px").as[Option[Double]].head() shouldBe None
  }

  test("forward: least right time >= left time; tolerance gates far matches") {
    val fwd = AsofJoin.asofJoin(trades, quotes, Seq("sym"), "t", "t", direction = "forward")
      .select("trade_id", "asof_px").as[(Long, Option[Double])].collect().toMap
    fwd(1L) shouldBe Some(2.0)  // inclusive at equal time
    fwd(2L) shouldBe None       // nothing after 25 on A
    fwd(3L) shouldBe Some(1.0)  // first quote at 8
    fwd(4L) shouldBe Some(9.0)  // B quote at 50
    val tol = AsofJoin.asofJoin(trades, quotes, Seq("sym"), "t", "t",
      direction = "forward", tolerance = Some(5L))
      .select("trade_id", "asof_px").as[(Long, Option[Double])].collect().toMap
    tol(4L) shouldBe None       // gap 40 > 5: row kept, match nulled
    tol(3L) shouldBe Some(1.0)  // gap 3 <= 5
  }

  test("declarative join_asof resolves the right side as a named view") {
    quotes.createOrReplaceTempView("asof_quotes")
    val out = AsofJoinTransform(trades,
      TransformConfig("a", "join_asof", Map(
        "rightDataset" -> "asof_quotes", "on" -> "sym", "leftTime" -> "t")),
      RunContext(spark, "t", "r"))
    out.columns should contain allOf ("sym", "t", "trade_id", "asof_px")
    out.count() shouldBe 4 // left-outer row count: every trade survives
    an[graft.api.ConfigException] should be thrownBy AsofJoinTransform(
      trades, TransformConfig("bad", "join_asof", Map.empty), RunContext(spark, "t", "r"))
  }

  test("plan has no join node and result is partition-invariant") {
    val out = AsofJoin.asofJoin(trades.repartition(7), quotes.repartition(3),
      Seq("sym"), "t", "t")
    val plan = out.queryExecution.executedPlan.toString
    plan.toLowerCase should not include "join"
    // the whole operator costs exactly ONE shuffle: the co-partitioning
    // exchange feeding the running window (the repartition(7)/(3) inputs
    // union without any extra exchange of their own)
    "Exchange hashpartitioning".r.findAllIn(plan).size shouldBe 1
    val a = out.orderBy("trade_id").collect()
    val b = AsofJoin.asofJoin(trades.coalesce(1), quotes.coalesce(1), Seq("sym"), "t", "t")
      .orderBy("trade_id").collect()
    a should contain theSameElementsInOrderAs b
  }
}
