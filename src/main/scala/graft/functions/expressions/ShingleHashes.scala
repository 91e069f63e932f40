package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native Catalyst expression: DISTINCT 64-bit hashes of the word n-gram
 * shingles of a text column, in one pass over the UTF-8 bytes with zero
 * per-shingle string allocation.
 *
 * Semantics mirror `array_distinct(transform(wordNgrams(text, n), xxhash64))`
 * from [[graft.functions.TextFunctions.wordNgrams]]: lowercase, whitespace
 * tokens, shorter-than-n docs degrade to ONE shingle over all tokens, and
 * blank docs yield ONE sentinel shingle (wordNgrams("") = [""], so all
 * blank docs pair with each other at jaccard 1.0 — blank duplicates ARE
 * duplicates). (The hash VALUES differ from xxhash64-of-string — they are
 * xxh64 over token-hash windows — which is immaterial: shingle hashes are
 * set-membership features; any stable 64-bit hash family works. Whitespace
 * here is bytes ≤ 0x20 — ASCII space/tab/newline — a deliberate, documented
 * narrowing of the regex `\s` used by TextFunctions.tokens; texts whose
 * only token boundaries are exotic Unicode whitespace tokenize coarser.)
 *
 * Why a custom Expression (SURVEY §7.3): profiled at sf0.1, the HOF form —
 * per-token `concat_ws` building shingle STRINGS, then array_distinct over
 * strings, then string re-hashing — was ~70% of the whole MinHash near-dup
 * pipeline (4.5 s of 6.4 s): interpreted lambda evaluation plus one string
 * allocation per (token × n). Here each token is hashed directly from the
 * byte run and shingles combine token hashes, so the scan is allocation-free
 * modulo one lowercase copy per row. `doGenCode` emits a static call, so the
 * operator stays inside whole-stage codegen.
 */
case class ShingleHashes(child: Expression, n: Int, distinct: Boolean = true)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes expects a string input, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    ShingleHashes.compute(input.asInstanceOf[UTF8String], n, distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.ShingleHashes.compute($c, $n, $distinct)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleHashes {
  private val Seed = 42L

  /** Column-API entry point (distinct shingle hashes). */
  def apply(text: Column, n: Int): Column = apply(text, n, distinct = true)

  /** `distinct = false` keeps one hash per shingle OCCURRENCE (multiset) —
    * what frequency-weighted consumers like SimHash need. */
  def apply(text: Column, n: Int, distinct: Boolean): Column =
    GraftBridge.column(ShingleHashes(GraftBridge.expression(text), n, distinct))

  /** One-pass scan: token byte-runs → xxh64 per token → rolling n-window
    * combine → distinct. Static so generated code can call it directly. */
  def compute(input: UTF8String, n: Int, distinct: Boolean = true): ArrayData = {
    val bytes = input.toLowerCase.getBytes
    // token hashes, one pass over the byte array (ws = ASCII <= 0x20)
    var tokenHashes = new Array[Long](math.max(8, bytes.length / 6))
    var nTokens = 0
    var i = 0
    while (i < bytes.length) {
      while (i < bytes.length && (bytes(i) & 0xFF) <= 0x20) i += 1
      val start = i
      while (i < bytes.length && (bytes(i) & 0xFF) > 0x20) i += 1
      if (i > start) {
        if (nTokens == tokenHashes.length) {
          val grown = new Array[Long](tokenHashes.length * 2)
          System.arraycopy(tokenHashes, 0, grown, 0, nTokens)
          tokenHashes = grown
        }
        tokenHashes(nTokens) = XXH64.hashUnsafeBytes(
          bytes, Platform.BYTE_ARRAY_OFFSET + start, i - start, Seed)
        nTokens += 1
      }
    }
    // blank doc → one sentinel shingle (parity with wordNgrams(""), which
    // yields [""] — so identical blank docs still count as duplicates)
    if (nTokens == 0)
      return new GenericArrayData(Array(XXH64.hashLong(0L, Seed)))
    val width = math.min(n, nTokens) // short docs degrade to one full-width shingle
    val nShingles = nTokens - width + 1
    val raw = new Array[Long](nShingles)
    var w = 0
    while (w < nShingles) {
      var h = Seed
      var j = 0
      while (j < width) { h = XXH64.hashLong(tokenHashes(w + j), h); j += 1 }
      raw(w) = h
      w += 1
    }
    if (!distinct) return new GenericArrayData(raw)
    val out = new java.util.LinkedHashSet[java.lang.Long]()
    var r = 0
    while (r < nShingles) { out.add(raw(r)); r += 1 }
    val arr = new Array[Long](out.size)
    val it = out.iterator()
    var idx = 0
    while (it.hasNext) { arr(idx) = it.next(); idx += 1 }
    new GenericArrayData(arr)
  }
}
