package graft.dedup

import graft.SparkTestBase
import graft.api.{ConfigException, RunContext}
import graft.config.TransformConfig
import graft.operators.{MinhashDedupTransform, MinhashSignaturesTransform}

/** The persisted-signature loop for incremental MinHash dedup: run N writes
  * the [[Dedup.minhashSignatures]] store to parquet; run N+1 dedups an
  * increment against the store WITHOUT the reference corpus's text — the
  * last honest 100 TB gap from round 8 (reference signatures were
  * recomputed from text every run). */
class SignatureStoreSpec extends SparkTestBase {
  import spark.implicits._

  private val ctx = RunContext(spark, "t", "r")

  private val refDocs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog while seventeen " +
      "astonished penguins watch from a nearby iceberg in complete silence"),
    (2L, "spark catalyst optimizer rules rewrite logical plans into " +
      "efficient physical operators before tungsten code generation runs"),
    (3L, "a third reference document about distributed shuffle hash " +
      "partitioning and the adaptive query execution framework"))
  private def refDF = refDocs.toDF("doc_id", "text")

  // the near-copy drops "astonished " from ref 1 — a J≈0.86 pair whose
  // band collision is pinned by the deterministic hashes (the same pair
  // DedupAgainstSpec uses); a one-word edit on a ~17-token doc can
  // deterministically miss all 16 bands, so don't swap in a shorter pair
  private def increment = Seq(
    (10L, refDocs(1)._2),                                  // exact copy of ref 2
    (11L, refDocs.head._2.replace("astonished ", "")),     // near-copy of ref 1
    (12L, "a genuinely fresh document with entirely novel content about " +
      "penguin husbandry on temperate research stations"))
    .toDF("doc_id", "text")

  test("store round-trip matches the recompute-from-text path exactly") {
    val dir = tmpDir("sigstore")
    Dedup.minhashSignatures(refDF, "doc_id", "text")
      .write.mode("overwrite").parquet(dir)
    val store = spark.read.parquet(dir)

    val viaStore = Dedup.minhashNearDupsAgainstSignatures(
      increment, store, "doc_id", "text", threshold = 0.5)
      .as[(Long, Long, Double)].collect().toSet
    val viaText = Dedup.minhashNearDupsAgainst(
      increment, refDF, "doc_id", "text", "doc_id", "text", threshold = 0.5)
      .as[(Long, Long, Double)].collect().toSet
    viaStore shouldBe viaText
    viaStore.map(_._1) shouldBe Set(10L, 11L)
    viaStore should contain ((10L, 2L, 1.0)) // exact copy verifies at J=1
  }

  test("the store carries no text: run N+1 reads signatures only") {
    val dir = tmpDir("sigstore")
    Dedup.minhashSignatures(refDF, "doc_id", "text")
      .write.mode("overwrite").parquet(dir)
    val store = spark.read.parquet(dir)
    // layout: slim signature columns + parameter stamp — no text anywhere
    store.columns.sorted shouldBe
      Array("doc_id", "mh_bands", "mh_rows_per_band", "mh_shingle", "sh", "sig")
    // and the matching plan scans exactly two files: the increment's source
    // and the store parquet — no scan of the reference text is even possible
    // since no frame in the query refers to it
    val out = Dedup.minhashNearDupsAgainstSignatures(
      increment, store, "doc_id", "text", threshold = 0.5)
    out.count() shouldBe 2
  }

  test("parameter mismatch fails fast instead of finding zero duplicates") {
    val dir = tmpDir("sigstore")
    Dedup.minhashSignatures(refDF, "doc_id", "text", bands = 8, rowsPerBand = 8)
      .write.mode("overwrite").parquet(dir)
    val store = spark.read.parquet(dir)
    val e = intercept[ConfigException] {
      Dedup.minhashNearDupsAgainstSignatures(
        increment, store, "doc_id", "text", bands = 16, rowsPerBand = 4)
    }
    e.getMessage should include ("bands=8")
    e.getMessage should include ("bands=16")
    // a MIXED-stamp store (two differently-parameterized builds appended)
    // fails regardless of which partition a single-row sample would hit
    val mixed = store.unionByName(
      Dedup.minhashSignatures(refDF, "doc_id", "text", bands = 8, rowsPerBand = 8,
        shingleSize = 5))
    an[ConfigException] should be thrownBy
      Dedup.minhashNearDupsAgainstSignatures(
        increment, mixed, "doc_id", "text", bands = 8, rowsPerBand = 8)
  }

  test("a frame that is not a signature store is rejected with the layout error") {
    val e = intercept[ConfigException] {
      Dedup.minhashNearDupsAgainstSignatures(
        increment, refDF, "doc_id", "text")
    }
    e.getMessage should include ("missing column(s)")
  }

  test("a store without parameter stamps is rejected (skipping the check " +
    "would re-open the silent-zero-duplicates hole); a store with wider " +
    "integer stamps still validates") {
    val full = Dedup.minhashSignatures(refDF, "doc_id", "text")
    // stamp columns stripped: cannot prove parameters → guided error
    val e = intercept[ConfigException] {
      Dedup.minhashNearDupsAgainstSignatures(
        increment, full.drop("mh_bands", "mh_rows_per_band", "mh_shingle"),
        "doc_id", "text")
    }
    e.getMessage should include ("mh_bands")
    // half-stamped store gets the same guided error, not UNRESOLVED_COLUMN
    an[ConfigException] should be thrownBy
      Dedup.minhashNearDupsAgainstSignatures(
        increment, full.drop("mh_rows_per_band"), "doc_id", "text")
    // bigint-stamped store (a rebuild through a widening tool) validates
    import org.apache.spark.sql.functions.col
    val widened = full
      .withColumn("mh_bands", col("mh_bands").cast("long"))
      .withColumn("mh_rows_per_band", col("mh_rows_per_band").cast("long"))
      .withColumn("mh_shingle", col("mh_shingle").cast("long"))
    Dedup.minhashNearDupsAgainstSignatures(
      increment, widened, "doc_id", "text", threshold = 0.5).count() shouldBe 2
  }

  test("YAML surface: minhash_signatures produces the store; signatureView consumes it") {
    val dir = tmpDir("sigstore")
    // run N: corpus → signature store → parquet (the producer transform
    // feeding a file sink; here the write is the sink's job, done inline)
    MinhashSignaturesTransform(refDF,
      TransformConfig("sig", "minhash_signatures",
        Map("idColumn" -> "doc_id", "textColumn" -> "text")), ctx)
      .write.mode("overwrite").parquet(dir)
    // run N+1: load the store, register, dedup the increment against it
    spark.read.parquet(dir).createOrReplaceTempView("sig_store")
    val out = MinhashDedupTransform(increment,
      TransformConfig("d", "dedup_minhash",
        Map("idColumn" -> "doc_id", "textColumn" -> "text",
          "signatureView" -> "sig_store", "threshold" -> "0.5")), ctx)
    out.select("doc_id").as[Long].collect().sorted shouldBe Array(12L)
  }

  test("referenceView and signatureView are mutually exclusive") {
    refDF.createOrReplaceTempView("sig_ref_corpus")
    refDF.createOrReplaceTempView("sig_ref_store")
    val e = intercept[ConfigException] {
      MinhashDedupTransform(increment,
        TransformConfig("d", "dedup_minhash",
          Map("idColumn" -> "doc_id", "textColumn" -> "text",
            "referenceView" -> "sig_ref_corpus",
            "signatureView" -> "sig_ref_store")), ctx)
    }
    e.getMessage should include ("mutually exclusive")
  }
}
