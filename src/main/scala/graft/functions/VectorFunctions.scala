package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Dense-vector math over ArrayType(Float/Double) embedding columns, built
 * from zip_with/aggregate higher-order functions: codegen'd, per-row,
 * shuffle-free. Sequential left-to-right folds make results bit-deterministic
 * for a given element order — required for oracle-checked ANN ranking.
 */
object VectorFunctions {

  /** Elementwise dot product (inputs cast to double). */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity, null-safe for zero vectors. Backed by the native
    * codegen'd [[graft.functions.expressions.CosineSimilarity]] expression
    * (single fused loop); arithmetic is bit-identical to [[cosineHof]]. */
  def cosine(a: Column, b: Column): Column =
    graft.functions.expressions.CosineSimilarity(a, b)

  /** Composable higher-order-function form (three interpreted array walks);
    * kept as the reference implementation the native expression must match. */
  def cosineHof(a: Column, b: Column): Column = {
    val d = dot(a, b); val na = norm(a); val nb = norm(b)
    when(na === 0.0 || nb === 0.0, 0.0).otherwise(d / (na * nb))
  }

  /** L2-normalized copy of the vector (doubles). */
  def normalize(a: Column): Column = {
    val n = norm(a)
    when(n === 0.0, transform(a, x => x.cast("double")))
      .otherwise(transform(a, x => x.cast("double") / n))
  }

  /**
   * Deterministic random-hyperplane sign bits (SimHash for vectors): bit j
   * is the sign of a pseudo-random projection whose weights derive from
   * murmur3 `hash(j, i)` — no RNG state, identical across executors, so
   * the bucketing is reproducible cluster-wide with zero broadcast.
   * Returns an int bucket id from `bits` hyperplanes.
   */
  def hyperplaneBucket(vec: Column, bits: Int): Column = {
    val bitCols = (0 until bits).map { j =>
      val proj = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1),
          (x, i) => x.cast("double") * ((hash(lit(j), i) % 1000).cast("double") / 1000.0)),
        lit(0.0), (acc, v) => acc + v)
      when(proj >= 0, 1 << j).otherwise(0)
    }
    bitCols.reduce(_ + _)
  }
}
