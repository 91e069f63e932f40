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

  test("null TIMES never match: a null-time left row gets a null payload " +
    "in BOTH directions, and a null-time right row never donates one") {
    val l = Seq(("A", Option.empty[Long], 1L), ("A", Some(10L), 2L))
      .toDF("sym", "t", "trade_id")
    // one real quote on each side of t=10 so both directions have a match
    val r = Seq(("A", Option.empty[Long], 99.0), ("A", Some(5L), 1.5),
        ("A", Some(15L), 2.5))
      .toDF("sym", "t", "px")
    for (dir <- Seq("backward", "forward")) {
      val out = AsofJoin.asofJoin(l, r, Seq("sym"), "t", "t", direction = dir)
        .select("trade_id", "asof_px").as[(Long, Option[Double])].collect().toMap
      withClue(s"direction=$dir: ") {
        out(1L) shouldBe None // null left time compares to nothing
        // and the real row matches its direction's quote — never the
        // null-time right row's 99.0
        out(2L) shouldBe Some(if (dir == "backward") 1.5 else 2.5)
      }
    }
  }

  test("fractional numeric time axes gate tolerance on RAW values (no long " +
    "truncation); negative tolerance and helper collisions rejected") {
    // gap = 5.9 - 5.1 = 0.8 > tolerance 0 — a cast("long") gap would be 0
    val l = Seq(("A", 5.9, 1L)).toDF("sym", "t", "trade_id")
    val r = Seq(("A", 5.1, 7.0)).toDF("sym", "t", "px")
    AsofJoin.asofJoin(l, r, Seq("sym"), "t", "t", tolerance = Some(0L))
      .select("asof_px").as[Option[Double]].head() shouldBe None
    AsofJoin.asofJoin(l, r, Seq("sym"), "t", "t", tolerance = Some(1L))
      .select("asof_px").as[Option[Double]].head() shouldBe Some(7.0)
    an[IllegalArgumentException] should be thrownBy
      AsofJoin.asofJoin(l, r, Seq("sym"), "t", "t", tolerance = Some(-1L))
    val clash = Seq(("A", 1L, 2L)).toDF("sym", "t", "__mt")
    an[graft.api.ConfigException] should be thrownBy
      AsofJoin.asofJoin(clash, r, Seq("sym"), "t", "t")
  }

  test("Int-typed time axes widen to long for the tolerance gap — a huge " +
    "gap must fail the gate, not wrap (or throw under ANSI)") {
    val l = Seq(("A", 2000000000, 1L)).toDF("sym", "t", "trade_id")
    val r = Seq(("A", -1500000000, 7.0)).toDF("sym", "t", "px")
    // true gap 3.5e9 exceeds any int; tolerance 1e9 must reject the match
    AsofJoin.asofJoin(l, r, Seq("sym"), "t", "t",
        tolerance = Some(1000000000L))
      .select("asof_px").as[Option[Double]].head() shouldBe None
    AsofJoin.asofJoin(l, r, Seq("sym"), "t", "t",
        tolerance = Some(4000000000L))
      .select("asof_px").as[Option[Double]].head() shouldBe Some(7.0)
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
