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

  /** L2-normalized copy of the vector (doubles). Backed by the native
    * codegen'd [[graft.functions.expressions.NormalizeVector]] (single
    * fused pass); arithmetic is bit-identical to [[normalizeHof]]. */
  def normalize(a: Column): Column =
    graft.functions.expressions.NormalizeVector(a)

  /** Composable higher-order-function form (interpreted, norm fold
    * evaluated twice via the zero guard); kept as the reference
    * implementation the native expression must match. */
  def normalizeHof(a: Column): Column = {
    val n = norm(a)
    when(n === 0.0, transform(a, x => x.cast("double")))
      .otherwise(transform(a, x => x.cast("double") / n))
  }

  /**
   * Symmetric per-vector int8 quantization scale: `max|x| / 127` (1.0 for
   * the zero vector so dequantization is total). At 100 TB, int8 embeddings
   * cut ANN storage and scan I/O 4× versus float32; the scale column rides
   * along per row.
   */
  def int8Scale(vec: Column): Column = {
    val absmax = array_max(transform(vec, x => abs(x.cast("double"))))
    when(absmax === 0.0, 1.0).otherwise(absmax / 127.0)
  }

  /** Quantized copy: `round(x / scale)` as ints in [-127, 127]. Pass the
    * SAME pre-computed scale column to [[dequantizeInt8]]. */
  def quantizeInt8(vec: Column, scale: Column): Column =
    transform(vec, x => round(x.cast("double") / scale).cast("int"))

  /** Approximate inverse: `q * scale`; per-element error ≤ scale / 2. */
  def dequantizeInt8(q: Column, scale: Column): Column =
    transform(q, x => x.cast("double") * scale)

  // Hyperplane bucketing lives ONLY in the native
  // graft.functions.expressions.HyperplaneBuckets (one plan node, cached
  // planes, null-safe). A HOF twin here once drifted to an incompatible
  // weight formula with no callers — deleted rather than kept as a trap.
}
