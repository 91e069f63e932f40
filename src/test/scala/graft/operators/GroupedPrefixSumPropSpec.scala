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
}
