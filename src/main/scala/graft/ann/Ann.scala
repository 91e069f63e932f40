package graft.ann

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._
import graft.dedup.Dedup

/**
 * Approximate-nearest-neighbor search over an embedding column
 * (ArrayType(Float)).
 *
 * Two paths:
 *  - [[bruteForceTopK]]: exact cosine top-k. The query set is broadcast
 *    (it's small), the corpus streams once — O(corpus × queries) with no
 *    corpus shuffle except the final per-query top-k, which is a
 *    rank-within-partition on queryId. The right baseline, and viable at
 *    100 TB whenever |queries| is modest.
 *  - [[lshTopK]]: random-hyperplane LSH bucketing (deterministic
 *    hash-derived hyperplanes, no RNG/broadcast state). Candidates =
 *    bucket collisions across `tables` independent hash tables; exact
 *    cosine re-rank inside candidates. Trades recall for a corpus scan
 *    that touches only colliding buckets — the scale path when queries
 *    are many.
 */
object Ann {

  /** Exact cosine top-k: queries df (queryIdCol, vecCol) × corpus df
    * (idCol, vecCol) → (query_id, vec_id, rank). */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
                     idCol: String, vecCol: String, queryIdCol: String,
                     k: Int): DataFrame = {
    val q = broadcast(queries.select(
      col(queryIdCol).as("query_id"), col(vecCol).as("qvec")))
    val scored = corpus.select(col(idCol).as("vec_id"), col(vecCol).as("cvec"))
      .crossJoin(q)
      .withColumn("sim", cosine(col("cvec"), col("qvec")))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "vec_id", "rank")
  }

  /** LSH-bucketed ANN top-k: same output shape as bruteForceTopK, lower
    * recall, corpus joined on (table, bucket) instead of crossed. */
  def lshTopK(corpus: DataFrame, queries: DataFrame,
              idCol: String, vecCol: String, queryIdCol: String,
              k: Int, bits: Int = 12, tables: Int = 4): DataFrame = {
    def bucketed(df: DataFrame, id: String, out: String): DataFrame =
      df.select(col(id), col(vecCol)).crossJoin(
        broadcast(spark_range_table(df, tables))) // one row per hash table
        .withColumn(out, hyperplaneBucketTable(col(vecCol), col("table_id"), bits))
    // hyperplanes differ per table via the table_id salt in the hash
    val c = bucketed(corpus, idCol, "bucket")
      .select(col(idCol).as("vec_id"), col(vecCol).as("cvec"), col("table_id"), col("bucket"))
    val q = bucketed(queries, queryIdCol, "bucket")
      .select(col(queryIdCol).as("query_id"), col(vecCol).as("qvec"), col("table_id"), col("bucket"))
    val cands = c.join(broadcast(q), Seq("table_id", "bucket"))
      .dropDuplicates("query_id", "vec_id")
      .withColumn("sim", cosine(col("cvec"), col("qvec")))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("vec_id"))
    cands.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "vec_id", "rank")
  }

  private def spark_range_table(df: DataFrame, tables: Int): DataFrame =
    df.sparkSession.range(tables).select(col("id").cast("int").as("table_id"))

  /** Per-table hyperplane bucket: weights seeded by (table, bit, dim). */
  private def hyperplaneBucketTable(vec: Column, table: Column, bits: Int): Column = {
    val bitCols = (0 until bits).map { j =>
      val proj = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1),
          (x, i) => x.cast("double") * ((hash(table, lit(j), i) % 1000).cast("double") / 1000.0)),
        lit(0.0), (acc, v) => acc + v)
      when(proj >= 0, 1 << j).otherwise(0)
    }
    bitCols.reduce(_ + _)
  }

  /**
   * Embedding near-duplicate pairs via hyperplane-LSH blocking + exact
   * cosine verification: (id_a, id_b, sim) with sim ≥ threshold. Multiple
   * tables recover pairs a single bucketing would split.
   */
  def cosineNearDups(corpus: DataFrame, idCol: String, vecCol: String,
                     threshold: Double, bits: Int = 8, tables: Int = 4): DataFrame = {
    val ids = corpus.select(col(idCol).as("doc_id"), col(vecCol).as("vec"))
    val tabled = ids.crossJoin(broadcast(spark_range_table(corpus, tables)))
      .withColumn("bucket", hyperplaneBucketTable(col("vec"), col("table_id"), bits))
    val l = tabled.select(col("table_id"), col("bucket"), col("doc_id").as("id_a"), col("vec").as("va"))
    val r = tabled.select(col("table_id"), col("bucket"), col("doc_id").as("id_b"), col("vec").as("vb"))
    l.join(r, Seq("table_id", "bucket")).filter(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("sim", cosine(col("va"), col("vb")))
      .filter(col("sim") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("sim"), 4).as("sim"))
  }
}
