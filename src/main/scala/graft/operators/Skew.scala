package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.api.ConfigException

/**
 * Explicit key-salting for skewed joins — the manual fallback for when
 * AQE's skewJoin split (on by default, runtime/Main.scala) is not enough:
 * AQE can only split a skewed PARTITION after the shuffle materializes;
 * salting splits the skewed KEY itself, so one hot key (the classic
 * boilerplate-document or null-ish dimension key at 100 TB) fans out over
 * `saltBuckets` reducers.
 *
 * Shape: the probe side gets a deterministic salt in [0, saltBuckets)
 * derived from a seeded xxhash64 over the whole probe row (all probe
 * columns, so identical key values still spread across buckets — hashing
 * only the join keys would send the entire hot key to one bucket and
 * defeat the salting); the build side is replicated once per salt value
 * (explode of a literal sequence — build-side rows × saltBuckets, so keep
 * the build side the smaller table). Join keys become (keys…, salt).
 * Result multiset is IDENTICAL to the unsalted join: salt only changes
 * row routing, never matching. The salt's content-hash term is stable,
 * but the per-row term (which spreads byte-identical rows) derives from
 * partition layout and row order — so routing is reproducible only when
 * the upstream scan order is (e.g. a stable file source); after a
 * nondeterministic shuffle, reruns may route rows differently while the
 * RESULT stays identical. Pass `seed` to re-roll the assignment (e.g. if
 * a pathological input correlates with the default seed).
 *
 * Supported join types: inner and left_outer (an unmatched probe row
 * surfaces exactly once). right/full/semi/anti would see the replicated
 * build side and are rejected — reformulate with the probe side on the
 * left.
 */
object Skew {

  def saltedJoin(probe: DataFrame, build: DataFrame, keys: Seq[String],
                 saltBuckets: Int, joinType: String = "inner",
                 seed: Long = 42L): DataFrame = {
    if (saltBuckets < 1)
      throw new ConfigException(s"saltedJoin: saltBuckets must be >= 1, got $saltBuckets")
    val supported = Set("inner", "left", "left_outer")
    if (!supported.contains(joinType))
      throw new ConfigException(
        s"saltedJoin: joinType '$joinType' unsupported (build side is replicated); " +
          "use inner/left with the probe side on the left")
    graft.config.ExprUtils.requireNoHelperCollision("salted join",
      probe.columns ++ build.columns, "__graft_salt")
    val saltCol = "__graft_salt"
    // the build side is replicated across EVERY salt, so ANY probe-side
    // salt assignment joins correctly — which is what makes the
    // row-position term safe: it splits byte-identical probe rows
    // (duplicated boilerplate documents, THE flagship hot-key case) that
    // a pure content hash would send to one bucket, defeating the salt
    val p = probe.withColumn(saltCol,
      saltExpr(hashableColumns(probe), saltBuckets, seed,
        perRow = Some(monotonically_increasing_id())))
    val b = build.withColumn(saltCol,
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    p.join(b, keys :+ saltCol, joinType).drop(saltCol)
  }

  /** Probe columns xxhash64 accepts: map-typed columns are rejected by
    * Spark's hash functions (and are irrelevant to bucket spreading). */
  private def containsMap(dt: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    dt match {
      case _: MapType => true
      case s: StructType => s.fields.exists(f => containsMap(f.dataType))
      case a: ArrayType => containsMap(a.elementType)
      case _ => false
    }
  }

  private def hashableColumns(df: DataFrame): Seq[String] =
    df.schema.fields.filterNot(f => containsMap(f.dataType)).map(_.name).toSeq

  /** The bucket assignment: seeded xxhash64 over the named columns (plus
    * an optional per-row term), mod saltBuckets. Exposed so specs (and
    * curious operators) can observe the routing saltedJoin uses. */
  def saltExpr(columns: Seq[String], saltBuckets: Int, seed: Long = 42L,
               perRow: Option[Column] = None) =
    pmod(xxhash64((columns.map(col) ++ perRow :+ lit(seed)): _*),
      lit(saltBuckets)).cast("int")
}
