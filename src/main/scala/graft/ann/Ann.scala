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

  /**
   * (id, table_id, bucket) rows for every (row, hash table) pair, computed
   * as posexplode(vec) + tables×bits codegen'd sum aggregates (map-side
   * partial agg) — the projections are ordinary expressions, not per-row
   * interpreted HOF folds. Hyperplane weight for (table t, bit j, dim i)
   * derives from murmur3 hash(t, j, i): deterministic, identical on every
   * executor, zero broadcast state.
   */
  private def bucketTable(df: DataFrame, id: String, vecCol: String,
                          tables: Int, bits: Int): DataFrame = {
    val exploded = df.select(col(id),
      posexplode(col(vecCol)).as(Seq("i", "x")))
    val projAggs = for (t <- 0 until tables; j <- 0 until bits) yield
      sum(col("x").cast("double") *
        ((hash(lit(t), lit(j), col("i")) % 1000).cast("double") / 1000.0)).as(s"__p_${t}_$j")
    val projected = exploded.groupBy(id).agg(projAggs.head, projAggs.tail: _*)
    val buckets = (0 until tables).map { t =>
      struct(lit(t).as("table_id"),
        (0 until bits).map(j =>
          when(col(s"__p_${t}_$j") >= 0, 1 << j).otherwise(0)).reduce(_ + _).as("bucket"))
    }
    projected.select(col(id), explode(array(buckets: _*)).as("tb"))
      .select(col(id), col("tb.table_id"), col("tb.bucket"))
  }

  /** LSH-bucketed ANN top-k: same output shape as bruteForceTopK, lower
    * recall, corpus joined on (table, bucket) instead of crossed. */
  def lshTopK(corpus: DataFrame, queries: DataFrame,
              idCol: String, vecCol: String, queryIdCol: String,
              k: Int, bits: Int = 12, tables: Int = 4): DataFrame = {
    val c = bucketTable(corpus, idCol, vecCol, tables, bits)
      .join(corpus.select(col(idCol), col(vecCol)), Seq(idCol))
      .select(col(idCol).as("vec_id"), col(vecCol).as("cvec"), col("table_id"), col("bucket"))
    val q = bucketTable(queries, queryIdCol, vecCol, tables, bits)
      .join(queries.select(col(queryIdCol), col(vecCol)), Seq(queryIdCol))
      .select(col(queryIdCol).as("query_id"), col(vecCol).as("qvec"), col("table_id"), col("bucket"))
    val cands = c.join(broadcast(q), Seq("table_id", "bucket"))
      .dropDuplicates("query_id", "vec_id")
      .withColumn("sim", cosine(col("cvec"), col("qvec")))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("vec_id"))
    cands.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "vec_id", "rank")
  }

  /**
   * IVF (inverted-file) ANN top-k — the other classic scale path.
   * Coarse quantizer: `nLists` corpus vectors chosen by deterministic hash
   * order stand in for centroids (hash-reservoir sampling — no k-means
   * iterations, no RNG state; at 100 TB you'd warm-start real centroids the
   * same way). Every corpus vector is assigned to its nearest centroid (one
   * broadcast pass); queries probe their `nProbe` nearest lists, so the
   * search touches nProbe/nLists of the corpus instead of all of it.
   * Same output shape as [[bruteForceTopK]].
   */
  def ivfTopK(corpus: DataFrame, queries: DataFrame,
              idCol: String, vecCol: String, queryIdCol: String,
              k: Int, nLists: Int = 64, nProbe: Int = 8): DataFrame = {
    val centroids = broadcast(
      corpus.select(col(idCol), col(vecCol))
        .orderBy(xxhash64(col(idCol)), col(idCol)).limit(nLists)
        .select(monotonically_increasing_id().as("list_id"), col(vecCol).as("centroid")))

    val wAssign = Window.partitionBy(idCol).orderBy(
      col("csim").desc, col("list_id"))
    val assigned = corpus.select(col(idCol), col(vecCol)).crossJoin(centroids)
      .withColumn("csim", cosine(col(vecCol), col("centroid")))
      .withColumn("r", row_number().over(wAssign)).filter(col("r") === 1)
      .select(col(idCol).as("vec_id"), col(vecCol).as("cvec"), col("list_id"))

    val wProbe = Window.partitionBy(queryIdCol).orderBy(col("csim").desc, col("list_id"))
    val probes = queries.select(col(queryIdCol), col(vecCol)).crossJoin(centroids)
      .withColumn("csim", cosine(col(vecCol), col("centroid")))
      .withColumn("r", row_number().over(wProbe)).filter(col("r") <= nProbe)
      .select(col(queryIdCol).as("query_id"), col(vecCol).as("qvec"), col("list_id"))

    val cands = assigned.join(broadcast(probes), Seq("list_id"))
      .withColumn("sim", cosine(col("cvec"), col("qvec")))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("vec_id"))
    cands.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "vec_id", "rank")
  }

  /**
   * Embedding near-duplicate pairs via hyperplane-LSH blocking + exact
   * cosine verification: (id_a, id_b, sim) with sim ≥ threshold. Multiple
   * tables recover pairs a single bucketing would split.
   */
  def cosineNearDups(corpus: DataFrame, idCol: String, vecCol: String,
                     threshold: Double, bits: Int = 8, tables: Int = 4): DataFrame = {
    val ids = corpus.select(col(idCol).as("doc_id"), col(vecCol).as("vec"))
    val tabled = bucketTable(ids, "doc_id", "vec", tables, bits)
      .join(ids, Seq("doc_id"))
    val l = tabled.select(col("table_id"), col("bucket"), col("doc_id").as("id_a"), col("vec").as("va"))
    val r = tabled.select(col("table_id"), col("bucket"), col("doc_id").as("id_b"), col("vec").as("vb"))
    l.join(r, Seq("table_id", "bucket")).filter(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("sim", cosine(col("va"), col("vb")))
      .filter(col("sim") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("sim"), 4).as("sim"))
  }
}
