package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.types._

/**
 * Native per-row signature expressions over a hashed-shingle array —
 * the zero-shuffle replacement for the explode + hash-aggregate signature
 * stage of [[graft.dedup.Dedup]].
 *
 * Why per-row beats explode+aggregate at scale: the aggregate form's
 * exchange carries every document's partial state (k minima plus the
 * collected shingle set — roughly the whole hashed corpus) through one
 * full shuffle before any blocking happens. These expressions compute the
 * same signatures inside the scan projection: the only shuffle left in the
 * near-dup pipelines is the SLIM banded/chunked candidate frame. (The
 * earlier HOF form of the same idea — `transform(sequence(0,k-1), i ->
 * array_min(transform(sh, h -> xxhash64(h,i))))` — evaluates interpreted
 * and re-inlines under CollapseProject; a native expression has neither
 * problem and stays inside whole-stage codegen.)
 *
 * Both are bit-compatible with the aggregate formulations they replace
 * (spec-asserted): the k-th MinHash equals `min(xxhash64(h, k))` =
 * `XXH64.hashInt(k, XXH64.hashLong(h, 42))` over the shingle hashes, and
 * the SimHash bit votes equal `sum(when(shiftright(h,b)&1=1,1).otherwise(-1))`.
 */
case class MinHashFromHashes(child: Expression, k: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  // validated at analysis (not a require) so a bad SQL-function argument
  // fails the query plan instead of throwing NegativeArraySizeException
  // per row on executors; k = 0 would silently emit empty signatures that
  // all band into one degenerate bucket
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) if k < 1 => TypeCheckResult.TypeCheckFailure(
      s"minhash_from_hashes expects k >= 1, got $k")
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_from_hashes expects array<bigint> (shingle hashes), got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    MinHashFromHashes.compute(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.MinHashFromHashes.compute($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashFromHashes {
  private val Seed = 42L // Spark's xxhash64 default seed — keeps bit-parity

  def apply(hashes: Column, k: Int): Column =
    GraftBridge.column(MinHashFromHashes(GraftBridge.expression(hashes), k))

  /** All k seeded minima in one pass: O(|hashes| × k) hashInt calls, zero
    * allocation beyond the k-long result. Static for codegen. */
  def compute(hashes: ArrayData, k: Int): ArrayData = {
    val n = hashes.numElements()
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var j = 0
    while (j < n) {
      val t = XXH64.hashLong(hashes.getLong(j), Seed)
      var i = 0
      while (i < k) {
        val h = XXH64.hashInt(i, t)
        if (h < mins(i)) mins(i) = h
        i += 1
      }
      j += 1
    }
    new GenericArrayData(mins)
  }
}

/**
 * All LSH band hashes of a MinHash signature in one pass: element `b` of
 * the result is the 32-bit Murmur3 hash of band `b`'s `rowsPerBand`
 * signature slice (then of `b` itself, so equal slices in different bands
 * land in different buckets). Bit-identical to the HOF form it replaces —
 * `transform(sequence(0, bands-1), b -> hash(slice(sig, b*r+1, r), b))` —
 * which evaluated INTERPRETED (lambda + slice allocation per band per row;
 * profiled at sf0.1 it tripled the banding stage over the signature scan).
 * `posexplode` over the result yields the (band, bh) pairs directly.
 */
case class BandHashes(child: Expression, bands: Int, rowsPerBand: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) if bands >= 1 && rowsPerBand >= 1 =>
      TypeCheckResult.TypeCheckSuccess
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckFailure(
      s"band_hashes: bands and rowsPerBand must be >= 1, got $bands/$rowsPerBand")
    case other => TypeCheckResult.TypeCheckFailure(
      s"band_hashes expects array<bigint> (the MinHash signature), got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    BandHashes.compute(input.asInstanceOf[ArrayData], bands, rowsPerBand)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.BandHashes.compute($c, $bands, $rowsPerBand)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BandHashes {
  def apply(sig: Column, bands: Int, rowsPerBand: Int): Column =
    GraftBridge.column(BandHashes(GraftBridge.expression(sig), bands, rowsPerBand))

  /** Murmur3 chain matching Spark's `hash(slice, band)` exactly: seed 42,
    * fold the band's signature longs, then the band index. Static for
    * codegen. A short signature (fewer than bands×rowsPerBand minima)
    * hashes whatever slice exists — same as the slice() form. */
  def compute(sig: ArrayData, bands: Int, rowsPerBand: Int): ArrayData = {
    import org.apache.spark.unsafe.hash.Murmur3_x86_32
    val n = sig.numElements()
    val out = new Array[Int](bands)
    var b = 0
    while (b < bands) {
      var h = 42
      var j = b * rowsPerBand
      val end = math.min(j + rowsPerBand, n)
      while (j < end) {
        h = Murmur3_x86_32.hashLong(sig.getLong(j), h)
        j += 1
      }
      out(b) = Murmur3_x86_32.hashInt(b, h)
      b += 1
    }
    new GenericArrayData(out)
  }
}

/** 64-bit SimHash from token-occurrence hashes (multiset — frequency
  * weights the bit votes): bit b of the result is set iff the b-th bits of
  * the inputs vote net-nonnegative. Same output as the 64-conditional-sum
  * aggregate it replaces, computed per row inside the scan. */
case class SimHashFromHashes(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash_from_hashes expects array<bigint> (token hashes), got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    SimHashFromHashes.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.SimHashFromHashes.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHashFromHashes {
  def apply(hashes: Column): Column =
    GraftBridge.column(SimHashFromHashes(GraftBridge.expression(hashes)))

  /** Static for codegen. ((h >> b) & 1) == ((h >>> b) & 1) for b < 64, so
    * the vote matches the aggregate form's arithmetic shiftright exactly. */
  def compute(hashes: ArrayData): Long = {
    val votes = new Array[Int](64)
    val n = hashes.numElements()
    var j = 0
    while (j < n) {
      val h = hashes.getLong(j)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      j += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) >= 0) sig |= (1L << b)
      b += 1
    }
    sig
  }
}
