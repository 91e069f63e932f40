package graft.operators

import org.apache.spark.sql.DataFrame
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
 * Shape: the probe side gets a random salt in [0, saltBuckets); the build
 * side is replicated once per salt value (explode of a literal sequence —
 * build-side rows × saltBuckets, so keep the build side the smaller
 * table). Join keys become (keys…, salt). Result multiset is IDENTICAL to
 * the unsalted join: salt only changes row routing, never matching —
 * which also makes the nondeterministic `rand()` salt safe under task
 * retries (any salt assignment yields the same join output).
 *
 * Supported join types: inner and left_outer (an unmatched probe row
 * surfaces exactly once). right/full/semi/anti would see the replicated
 * build side and are rejected — reformulate with the probe side on the
 * left.
 */
object Skew {

  def saltedJoin(probe: DataFrame, build: DataFrame, keys: Seq[String],
                 saltBuckets: Int, joinType: String = "inner"): DataFrame = {
    if (saltBuckets < 1)
      throw new ConfigException(s"saltedJoin: saltBuckets must be >= 1, got $saltBuckets")
    val supported = Set("inner", "left", "left_outer")
    if (!supported.contains(joinType))
      throw new ConfigException(
        s"saltedJoin: joinType '$joinType' unsupported (build side is replicated); " +
          "use inner/left with the probe side on the left")
    val saltCol = "__graft_salt"
    val p = probe.withColumn(saltCol, (rand() * saltBuckets).cast("int"))
    val b = build.withColumn(saltCol,
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    p.join(b, keys :+ saltCol, joinType).drop(saltCol)
  }
}
