package graft.functions

import graft.SparkTestBase
import graft.functions.expressions.{MinHashFromHashes, ShingleHashes, SimHashFromHashes}
import org.apache.spark.sql.functions._

class SignatureExpressionsSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy cat"),
    (3L, "completely different text about spark pipelines and shuffles"),
    (4L, ""),
    (5L, "tiny")
  ).toDF("doc_id", "text")

  test("MinHashFromHashes is bit-identical to the min-aggregate and HOF forms") {
    val k = 16
    val sh = ShingleHashes(col("text"), 3)
    val native = docs.select(col("doc_id"), MinHashFromHashes(sh, k).as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    // the replaced aggregate form: explode → min(xxhash64(h, i)) per seed
    val exploded = docs.select(col("doc_id"), explode(sh).as("h"))
    val aggForm = exploded.groupBy("doc_id")
      .agg(array((0 until k).map(i => min(xxhash64(col("h"), lit(i)))): _*).as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    // the HOF fold form (interpreted — fine for a 5-row parity check)
    val hofForm = docs.select(col("doc_id"),
      transform(sequence(lit(0), lit(k - 1)),
        i => array_min(transform(sh, h => xxhash64(h, i)))).as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    native shouldBe aggForm
    native shouldBe hofForm
    native(1L) should have length k
    native(1L) should not be native(3L)
  }

  test("SimHashFromHashes is bit-identical to the conditional-sum aggregate form") {
    val sh = ShingleHashes(col("text"), 1, distinct = false)
    val native = docs.select(col("doc_id"), SimHashFromHashes(sh).as("sig"))
      .as[(Long, Long)].collect().toMap
    val exploded = docs.select(col("doc_id"), explode(sh).as("h"))
    val bitAggs = (0 until 64).map { b =>
      sum(when(call_function("shiftright", col("h"), lit(b)).bitwiseAND(1) === 1, 1)
        .otherwise(-1)).as(s"__b$b")
    }
    val aggForm = exploded.groupBy("doc_id").agg(bitAggs.head, bitAggs.tail: _*)
      .select(col("doc_id"),
        (0 until 64).map(b => when(col(s"__b$b") >= 0, lit(1L << b)).otherwise(0L))
          .reduce(_ + _).as("sig"))
      .as[(Long, Long)].collect().toMap
    native shouldBe aggForm
    // near-identical docs land near in hamming space; unrelated docs far
    java.lang.Long.bitCount(native(1L) ^ native(2L)) should be < 16
    java.lang.Long.bitCount(native(1L) ^ native(3L)) should be > 16
  }

  test("signature stage is a zero-shuffle codegen'd projection") {
    val dir = tmpDir("sigexpr")
    docs.write.mode("overwrite").parquet(dir)
    val fromDisk = spark.read.parquet(dir)
    val sigs = graft.dedup.Dedup.simhashSignatures(fromDisk, "doc_id", "text")
    val plan = sigs.queryExecution.executedPlan.toString
    plan should not include "Exchange"
    plan should include regex """\*\(\d+\) Project"""
    sigs.count() shouldBe 5
    val mh = fromDisk.select(
      MinHashFromHashes(ShingleHashes(col("text"), 3), 64).as("sig"))
    val mhPlan = mh.queryExecution.executedPlan.toString
    mhPlan should not include "Exchange"
    mhPlan should include regex """\*\(\d+\) Project"""
    mh.count() shouldBe 5
  }

  test("BandHashes is bit-identical to the hash(slice, band) HOF form") {
    import graft.functions.expressions.BandHashes
    val bands = 16; val rowsPerBand = 4
    val sigs = docs.select(col("doc_id"),
      MinHashFromHashes(ShingleHashes(col("text"), 3), bands * rowsPerBand).as("sig"))
    val native = sigs.select(col("doc_id"),
      BandHashes(col("sig"), bands, rowsPerBand).as("bh"))
      .as[(Long, Seq[Int])].collect().toMap
    val hofForm = sigs.select(col("doc_id"),
      transform(sequence(lit(0), lit(bands - 1)),
        b => hash(slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand)), b)).as("bh"))
      .as[(Long, Seq[Int])].collect().toMap
    native shouldBe hofForm
    native(1L) should have length bands
    // equal slices in different bands must land in different buckets: the
    // empty doc's signature is Long.MaxValue everywhere, yet its 16 band
    // hashes should all differ because the band index is folded in
    native(4L).distinct should have length bands
  }

  test("null input and SQL registration") {
    graft.functions.expressions.GraftExtensions.register(spark)
    val withNull = Seq((1L, Some("a b c")), (2L, None)).toDF("id", "text")
      .select(col("id"), ShingleHashes(col("text"), 2).as("sh"))
    withNull.select(MinHashFromHashes(col("sh"), 4).as("s"))
      .where(col("s").isNull).count() shouldBe 1
    withNull.select(SimHashFromHashes(col("sh")).as("s"))
      .where(col("s").isNull).count() shouldBe 1
    withNull.createOrReplaceTempView("sig_sql_docs")
    spark.sql("SELECT minhash_from_hashes(sh, 2 + 2) AS m, simhash_from_hashes(sh) AS s FROM sig_sql_docs WHERE id = 1")
      .selectExpr("size(m)").as[Int].head() shouldBe 4
    // k < 1 must fail analysis (a clear plan error), not throw
    // NegativeArraySizeException per row on executors / silently emit
    // empty signatures that band into one degenerate bucket
    an[Exception] should be thrownBy
      spark.sql("SELECT minhash_from_hashes(sh, -1) FROM sig_sql_docs").collect()
    an[Exception] should be thrownBy
      spark.sql("SELECT minhash_from_hashes(sh, 0) FROM sig_sql_docs").collect()
  }
}
