package graft.functions.expressions

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.types._

/**
 * Native Catalyst expression: ALL random-hyperplane LSH bucket ids of an
 * embedding vector in one fused loop — `tables` independent hash tables,
 * each bucket a `bits`-bit signature where bit j is the sign of the dot
 * product against a deterministic hash-derived hyperplane.
 *
 * Why a custom Expression (SURVEY §7.3, and the round-2 verdict's headline):
 * the previous form inlined tables×bits separate `DotProduct(vec,
 * typedlit(dim doubles))` sub-expressions into one projection — at
 * (tables=6, bits=12, dim=64) that is ~9,200 literal doubles in the plan.
 * Plan stringification had to be truncated, and past the 64 KB JVM method
 * limit whole-stage codegen bails to interpreted eval: q30 regressed to
 * 50.8 s on a 4,020-row input. Here the plan carries ONE node with two int
 * parameters; the hyperplane weights are derived from the same hash family
 * *inside* the expression (the [[ShingleHashes]] treatment) and cached per
 * executor, so codegen stays inside whole-stage limits no matter how many
 * planes are configured.
 *
 * Weights are bit-identical to the replaced literal form:
 * w(t,j,i) = (murmur3((t,j,i)) % 1000) / 1000.0 — identical on every
 * executor and across runs, no RNG state, no broadcast. Bucket bit j of
 * table t is `dot(vec, w(t,j,·)) >= 0`, accumulated left-to-right like
 * [[DotProduct]], so bucket assignments match the old plan exactly
 * (bit-identity spec in HyperplaneBucketsSpec).
 *
 * NULL vectors — and vectors CONTAINING a null element (parquet embedding
 * columns default to containsNull=true; a null slot must never silently
 * read as 0.0) — yield a NULL bucket array (the usual null-safe contract),
 * so an `explode` downstream drops them from candidate generation — unlike
 * the literal form, which bucketed null vectors into bucket 0 of every
 * table and fed null similarities to the ranker. The per-element null scan
 * is skipped when the schema says containsNull=false.
 */
case class HyperplaneBuckets(child: Expression, tables: Int, bits: Int)
    extends UnaryExpression {

  require(tables >= 1, s"hyperplane_buckets: tables must be >= 1, got $tables")
  require(bits >= 1 && bits <= 30,
    s"hyperplane_buckets: bits must be in [1, 30], got $bits")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  // null input OR null element both produce a null result
  override def nullable: Boolean = true

  private def checkElems: Boolean = child.dataType match {
    case ArrayType(_, cn) => cn
    case _ => true
  }

  private def elemKind: Int = child.dataType match {
    case ArrayType(FloatType, _)   => 0
    case ArrayType(DoubleType, _)  => 1
    case ArrayType(IntegerType, _) => 2
    case ArrayType(LongType, _)    => 3
    case _                         => -1
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemKind >= 0) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hyperplane_buckets expects a numeric array input, got ${child.dataType.simpleString}")

  override def nullSafeEval(input: Any): Any =
    HyperplaneBuckets.compute(
      input.asInstanceOf[ArrayData], tables, bits, elemKind, checkElems)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = graft.functions.expressions.HyperplaneBuckets.compute(
         |  $c, $tables, $bits, $elemKind, $checkElems);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HyperplaneBuckets {

  /** Column-API entry point. */
  def apply(vec: Column, tables: Int, bits: Int): Column =
    GraftBridge.column(HyperplaneBuckets(GraftBridge.expression(vec), tables, bits))

  /** Deterministic hyperplane weight for (table t, bit j, dim i) — the same
    * formula the literal-plane form used, kept for bucket-assignment
    * stability across releases. */
  def weight(t: Int, j: Int, i: Int): Double =
    (scala.util.hashing.MurmurHash3.productHash((t, j, i)) % 1000) / 1000.0

  /** Executor-side plane cache: (tables, bits, dim) → flattened
    * [tables×bits×dim] weight matrix. O(tables·bits·dim) doubles — a few KB
    * for any sane configuration — materialized once per JVM, never
    * shipped in the plan. */
  private val planeCache = new ConcurrentHashMap[Long, Array[Double]]()

  private def planes(tables: Int, bits: Int, dim: Int): Array[Double] = {
    val key = (tables.toLong << 42) | (bits.toLong << 21) | dim.toLong
    var cached = planeCache.get(key)
    if (cached == null) {
      val w = new Array[Double](tables * bits * dim)
      var t = 0
      while (t < tables) {
        var j = 0
        while (j < bits) {
          val base = (t * bits + j) * dim
          var i = 0
          while (i < dim) { w(base + i) = weight(t, j, i); i += 1 }
          j += 1
        }
        t += 1
      }
      planeCache.putIfAbsent(key, w)
      cached = w
    }
    cached
  }

  @inline private def elem(a: ArrayData, kind: Int, i: Int): Double = kind match {
    case 0 => a.getFloat(i).toDouble
    case 1 => a.getDouble(i)
    case 2 => a.getInt(i).toDouble
    case 3 => a.getLong(i).toDouble
    case _ => throw new IllegalStateException("unreachable")
  }

  /** One fused pass over tables×bits planes. Static so generated code calls
    * it directly (stays inside whole-stage codegen). Returns null when the
    * vector contains a null element (only scanned if `checkNulls`). */
  def compute(arr: ArrayData, tables: Int, bits: Int, kind: Int,
              checkNulls: Boolean): ArrayData = {
    val dim = arr.numElements()
    if (checkNulls) {
      var i = 0
      while (i < dim) { if (arr.isNullAt(i)) return null; i += 1 }
    }
    val w = planes(tables, bits, dim)
    val out = new Array[Int](tables)
    var t = 0
    while (t < tables) {
      var bucket = 0
      var j = 0
      while (j < bits) {
        val base = (t * bits + j) * dim
        var dot = 0.0
        var i = 0
        while (i < dim) { dot += elem(arr, kind, i) * w(base + i); i += 1 }
        if (dot >= 0) bucket |= (1 << j)
        j += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }
}
