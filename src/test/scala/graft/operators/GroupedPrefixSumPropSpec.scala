package graft.operators

import org.apache.spark.sql.functions.col
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkTestBase

/**
 * Randomized partition-invariance for the shared prefix-sum machine
 * (under `token_cap` and `pack_sequences`): for ANY weights (zeros
 * included), group assignment (null groups included), row count, and
 * partition count, the stamped exclusive per-group running sum must
 * equal the SQL window restatement exactly. Exercises the boundary
 * chain across every shape scalacheck finds: single-group corpora,
 * groups spanning many partitions, partitions holding many groups,
 * empty partitions (parts > rows).
 */
class GroupedPrefixSumPropSpec extends SparkTestBase {
  import spark.implicits._

  test("random corpora match the per-group SQL window at any partition count") {
    val genRow = for {
      g <- Gen.choose(0, 6)
      nullG <- Gen.prob(0.1)
      w <- Gen.choose(0L, 20L)
    } yield (if (nullG) null else s"g$g", w)
    val genCase = for {
      rows <- Gen.choose(1, 120)
      data <- Gen.listOfN(rows, genRow)
      parts <- Gen.choose(1, 9)
    } yield (data, parts)
    val prop = Prop.forAll(genCase) { case (data, parts) =>
      val df = data.zipWithIndex.map { case ((g, w), i) => (i.toLong, g, w) }
        .toDF("id", "grp", "w")
      df.createOrReplaceTempView("pfx")
      val expected = spark.sql(
        """SELECT id, coalesce(sum(w) OVER (PARTITION BY grp ORDER BY id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0L) AS cb
           FROM pfx""").as[(Long, Long)].collect().toMap
      val got = GroupedPrefixSum.stamp(df, Seq("grp"), Seq(col("id")), "w",
          "cb", numPartitions = parts)
        .select("id", "cb").as[(Long, Long)].collect().toMap
      got == expected
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(12), prop)
    assert(res.passed, res.status.toString)
  }

  test("binary group keys compare structurally across partition boundaries") {
    // every row holds a FRESH Array[Byte] instance; two of the three key
    // contents interleave so equal keys meet at partition edges. Raw
    // Array reference equality would restart the running sum there.
    val df = (0 until 60).map { i =>
      (i.toLong, Array[Byte]((i % 3).toByte, 0x7f.toByte), (i % 5).toLong)
    }.toDF("id", "grp", "w")
    df.createOrReplaceTempView("pfxbin")
    val expected = spark.sql(
      """SELECT id, coalesce(sum(w) OVER (PARTITION BY grp ORDER BY id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0L) AS cb
         FROM pfxbin""").as[(Long, Long)].collect().toMap
    for (parts <- Seq(1, 4, 9)) {
      val got = GroupedPrefixSum.stamp(df, Seq("grp"), Seq(col("id")), "w",
          "cb", numPartitions = parts)
        .select("id", "cb").as[(Long, Long)].collect().toMap
      assert(got == expected, s"parts=$parts")
    }
  }

  test("array-typed group keys chain correctly") {
    val df = (0 until 40).map { i =>
      (i.toLong, Seq(i % 2, 7), 1L)
    }.toDF("id", "grp", "w")
    df.createOrReplaceTempView("pfxarr")
    val expected = spark.sql(
      """SELECT id, coalesce(sum(w) OVER (PARTITION BY grp ORDER BY id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0L) AS cb
         FROM pfxarr""").as[(Long, Long)].collect().toMap
    val got = GroupedPrefixSum.stamp(df, Seq("grp"), Seq(col("id")), "w",
        "cb", numPartitions = 5)
      .select("id", "cb").as[(Long, Long)].collect().toMap
    assert(got == expected)
  }

  test("NaN and -0.0 double group keys chain as ONE group (SQL grouping " +
    "semantics) — boxed-numeric NaN != NaN must not fracture the sum") {
    // several NaN rows, a -0.0/0.0 pair, ordinary keys; partition counts
    // that split the NaN run across boundaries
    def d(v: Double): java.lang.Double = java.lang.Double.valueOf(v)
    val data: Seq[(Long, java.lang.Double, Long)] = Seq(
      (1L, d(Double.NaN), 5L), (2L, d(Double.NaN), 5L), (3L, d(Double.NaN), 5L),
      (4L, d(Double.NaN), 5L), (5L, d(1.5), 2L), (6L, d(1.5), 2L),
      (7L, d(-0.0), 3L), (8L, d(0.0), 3L), (9L, null, 1L))
    Seq(1, 3, 7).foreach { parts =>
      val df = data.toDF("id", "grp", "w")
      df.createOrReplaceTempView("pfx_nan")
      val expected = spark.sql(
        """SELECT id, coalesce(sum(w) OVER (PARTITION BY grp ORDER BY id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0L) AS cb
           FROM pfx_nan""").as[(Long, Long)].collect().toMap
      val got = GroupedPrefixSum.stamp(df.repartition(parts), Seq("grp"),
          Seq(col("id")), "w", "cb", parts)
        .select("id", "cb").as[(Long, Long)].collect().toMap
      withClue(s"parts=$parts: ") { got shouldBe expected }
    }
    // the SQL oracle itself: NaNs are one window partition (cb 0,5,10,15),
    // -0.0 groups with 0.0 (cb 0,3) — assert the semantics we chain to
    val df = data.toDF("id", "grp", "w")
    df.createOrReplaceTempView("pfx_nan")
    spark.sql(
      """SELECT id, coalesce(sum(w) OVER (PARTITION BY grp ORDER BY id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0L) AS cb
         FROM pfx_nan WHERE isnan(grp)""").as[(Long, Long)].collect()
      .toMap shouldBe Map(1L -> 0L, 2L -> 5L, 3L -> 10L, 4L -> 15L)
  }

  test("case-insensitive group/weight column resolution (default " +
    "caseSensitive=false parity with validate and Column resolution)") {
    val df = Seq((1L, "a", 2L), (2L, "a", 3L)).toDF("id", "Grp", "W")
    GroupedPrefixSum.stamp(df, Seq("grp"), Seq(col("id")), "w", "cb")
      .select("id", "cb").as[(Long, Long)].collect().toMap shouldBe
      Map(1L -> 0L, 2L -> 2L)
  }

  test("map-typed group columns are rejected fail-fast") {
    val df = Seq((1L, Map("a" -> 1), 1L)).toDF("id", "grp", "w")
    val e = intercept[IllegalArgumentException] {
      GroupedPrefixSum.stamp(df, Seq("grp"), Seq(col("id")), "w", "cb")
    }
    assert(e.getMessage.contains("map-typed"))
  }

  test("negative weights fail loudly — they would silently shift every " +
    "later row's cum_before backwards") {
    val df = Seq((1L, "a", 10L), (2L, "a", -5L), (3L, "a", 7L)).toDF("id", "grp", "w")
    val e = intercept[org.apache.spark.SparkException] {
      GroupedPrefixSum.stamp(df, Seq("grp"), Seq(col("id")), "w", "cb")
        .collect()
    }
    e.getMessage should include ("negative")
  }
}
