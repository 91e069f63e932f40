package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/**
 * Document-deduplication suite for training-data pipelines: exact,
 * MinHash+LSH, SimHash, and n-gram-Jaccard near-dup detection.
 *
 * Scale design: every stage is either per-row (signatures — codegen'd
 * higher-order functions, no UDFs) or a key-partitioned shuffle
 * (band-bucket join). Candidate generation is O(rows × bands), never
 * O(rows²); the quadratic step (pair verification) happens only inside
 * LSH buckets, which stay small for non-adversarial corpora. Skewed
 * buckets (boilerplate shingles) are capped with `maxBucketSize` the way
 * production near-dup pipelines drop mega-clusters.
 */
object Dedup {

  /** Exact dedup on a normalized text key: survivor = lowest id per key.
    * One shuffle on the (hashed) key; deterministic. */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(sha2(trim(lower(col(textCol))), 256).as("text_hash"))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_copies"))

  /**
   * MinHash signature column: k independent min-hashes over word-shingle
   * sets. hash_i(s) = xxhash64(shingle, seed=i); per-row nested HOFs —
   * no explode, no shuffle, one pass.
   */
  def minhashSignature(text: Column, k: Int, shingleSize: Int): Column = {
    val sh = array_distinct(TextFunctions.wordNgrams(text, shingleSize))
    transform(sequence(lit(0), lit(k - 1)),
      i => array_min(transform(sh, s => xxhash64(s, i))))
  }

  /**
   * MinHash + LSH near-duplicate pairs.
   * signature → `bands` bands of `rowsPerBand` → explode to (band, bandHash)
   * → self-join per bucket → verify with EXACT Jaccard over shingle sets.
   * Returns (idA, idB, jaccard) with idA < idB, jaccard ≥ threshold.
   */
  def minhashNearDups(
      df: DataFrame, idCol: String, textCol: String,
      bands: Int = 16, rowsPerBand: Int = 4, shingleSize: Int = 3,
      threshold: Double = 0.5, maxBucketSize: Int = 1000): DataFrame = {
    val k = bands * rowsPerBand
    val sigd = df.select(
      col(idCol).as("doc_id"),
      array_distinct(TextFunctions.wordNgrams(col(textCol), shingleSize)).as("shingles"),
      minhashSignature(col(textCol), k, shingleSize).as("sig"))

    val banded = sigd.select(
      col("doc_id"), col("shingles"),
      explode(transform(sequence(lit(0), lit(bands - 1)),
        b => struct(b.as("band"), hash(slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand)), b).as("bh"))))
        .as("bb"))
      .select(col("doc_id"), col("shingles"), col("bb.band"), col("bb.bh"))

    // cap pathological buckets (boilerplate/empty docs) before the self-join
    val bucketed = banded
      .withColumn("bucket_n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("band", "bh")))
      .filter(col("bucket_n") <= maxBucketSize)

    val l = bucketed.select(col("band"), col("bh"),
      col("doc_id").as("id_a"), col("shingles").as("sh_a"))
    val r = bucketed.select(col("band"), col("bh"),
      col("doc_id").as("id_b"), col("shingles").as("sh_b"))
    val pairs = l.join(r, Seq("band", "bh")).filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "sh_a", "sh_b").dropDuplicates("id_a", "id_b")

    val inter = size(array_intersect(col("sh_a"), col("sh_b"))).cast("double")
    val union = size(array_union(col("sh_a"), col("sh_b"))).cast("double")
    pairs
      .withColumn("jaccard", round(when(union === 0, 0.0).otherwise(inter / union), 4))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** 64-bit SimHash over tokens: per-bit weighted vote folded per-row
    * (no shuffle), reassembled into one long. */
  def simhash64(text: Column): Column = {
    val t = TextFunctions.tokens(text)
    val counters = aggregate(
      t, array_repeat(lit(0), 64),
      (acc, w) => zip_with(acc, sequence(lit(0), lit(63)),
        (c, b) => c + when(call_function("shiftright", xxhash64(w), b).bitwiseAND(1) === 1, 1).otherwise(-1)))
    aggregate(
      zip_with(counters, sequence(lit(0), lit(63)),
        (c, b) => when(c >= 0, call_function("shiftleft", lit(1L), b)).otherwise(0L)),
      lit(0L), (acc, v) => acc + v)
  }

  /**
   * SimHash near-dup pairs: block on 16-bit chunks (any pair within
   * `maxHamming` ≤ 3 shares at least one of 4 chunks — pigeonhole), then
   * verify with bit_count(a XOR b). Linear candidate generation.
   */
  def simhashNearDups(df: DataFrame, idCol: String, textCol: String,
                      maxHamming: Int = 3): DataFrame = {
    val sigs = df.select(col(idCol).as("doc_id"), simhash64(col(textCol)).as("sig"))
    val chunked = sigs.select(col("doc_id"), col("sig"),
      explode(transform(sequence(lit(0), lit(3)),
        c => struct(c.as("chunk"),
          call_function("shiftright", col("sig"), c * 16).bitwiseAND(0xFFFFL).as("ch")))).as("cc"))
      .select(col("doc_id"), col("sig"), col("cc.chunk"), col("cc.ch"))
    val l = chunked.select(col("chunk"), col("ch"), col("doc_id").as("id_a"), col("sig").as("sig_a"))
    val r = chunked.select(col("chunk"), col("ch"), col("doc_id").as("id_b"), col("sig").as("sig_b"))
    l.join(r, Seq("chunk", "ch")).filter(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("hamming", bit_count(col("sig_a").bitwiseXOR(col("sig_b"))))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }

  /**
   * Exact n-gram Jaccard similarity for a candidate pair set — the
   * verification primitive behind minhashNearDups, exposed directly for
   * small/blocked inputs.
   */
  def ngramJaccard(a: Column, b: Column, n: Int): Column = {
    val sa = array_distinct(TextFunctions.wordNgrams(a, n))
    val sb = array_distinct(TextFunctions.wordNgrams(b, n))
    val inter = size(array_intersect(sa, sb)).cast("double")
    val union = size(array_union(sa, sb)).cast("double")
    round(when(union === 0, 0.0).otherwise(inter / union), 4)
  }
}
