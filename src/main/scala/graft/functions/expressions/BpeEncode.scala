package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.text.Bpe

/**
 * Native Catalyst expression: BPE-encode a text column against a trained
 * merges table ([[graft.text.Bpe]]) — returns the token array (with the
 * `</w>` end-of-word markers); `size(...)` of it is the tokenizer-exact
 * token count that `token_cap`/`pack_sequences` budget with.
 *
 * Why a custom Expression (the [[TokenSignals]] case): the greedy merge
 * walk is genuinely imperative — no composition of built-in functions
 * expresses "repeatedly merge the lowest-rank adjacent pair" — and a
 * Scala UDF would pay serialization per row. The merges list rides into
 * generated code as ONE reference object (O(numMerges) strings per
 * executor, broadcast-for-free through the plan), so encoding is a pure
 * zero-shuffle projection.
 *
 * Per-executor word→tokens memo: corpus word frequency is Zipfian, so
 * almost every occurrence hits the memo and a 100 TB encode pays the
 * merge walk once per DISTINCT word per executor. The memo is a
 * ConcurrentHashMap (expression instances are shared across a stage's
 * tasks) hard-capped at [[BpeEncode.MemoMax]] entries — beyond that new
 * words encode unmemoized rather than grow executor memory unboundedly.
 */
case class BpeEncode(child: Expression, merges: Seq[(String, String)],
                     memoMax: Int = BpeEncode.MemoMax)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bpe_encode expects a string column, got ${other.simpleString}")
  }

  @transient private lazy val rank = Bpe.ranks(merges)
  @transient private lazy val memo =
    new java.util.concurrent.ConcurrentHashMap[String, Array[UTF8String]]()

  def compute(input: UTF8String): GenericArrayData = {
    val out = Array.newBuilder[UTF8String]
    Bpe.words(input.toString).foreach { w =>
      val cached = memo.get(w)
      val toks =
        if (cached != null) cached
        else {
          val enc = Bpe.encodeWord(w, rank).map(UTF8String.fromString)
          if (memo.size() < memoMax) memo.put(w, enc)
          enc
        }
      out ++= toks
    }
    new GenericArrayData(out.result().asInstanceOf[Array[Any]])
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the instance carries the merges + memo — reference it (TokenSignals
    // pattern), keeping the row loop inside whole-stage codegen
    val ref = ctx.addReferenceObj("bpeEncode", this, classOf[BpeEncode].getName)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BpeEncode {
  /** Memo hard cap: 64k distinct words ≈ a few MB of token arrays —
    * covers any realistic vocabulary's hot set while bounding executor
    * memory against adversarial high-entropy corpora. */
  val MemoMax = 65536

  def apply(text: Column, merges: Seq[(String, String)]): Column =
    GraftBridge.column(BpeEncode(GraftBridge.expression(text), merges))

  /** Tokenizer-exact token count. */
  def count(text: Column, merges: Seq[(String, String)]): Column =
    org.apache.spark.sql.functions.size(apply(text, merges))
}

/**
 * [[BpeEncode]]'s id-emitting sibling: the token-ID array (`array<int>`)
 * — the `input_ids` a training run actually consumes — encoded against a
 * merges list and its [[Bpe.loadVocab]] vocabulary. Symbols outside the
 * vocabulary (characters the training corpus never contained) map to
 * [[Bpe.Unk]]'s id 0. Same codegen/memo shape as [[BpeEncode]]; the memo
 * holds the final int arrays, so the per-word cost after warmup is one
 * map hit regardless of vocabulary size.
 */
case class BpeEncodeIds(child: Expression, merges: Seq[(String, String)],
                        vocab: IndexedSeq[String],
                        memoMax: Int = BpeEncode.MemoMax)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bpe_encode_ids expects a string column, got ${other.simpleString}")
  }

  @transient private lazy val rank = Bpe.ranks(merges)
  @transient private lazy val ids: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer]()
    // FIRST id wins on a duplicate product — the loadVocab contract
    vocab.zipWithIndex.foreach { case (t, i) => m.putIfAbsent(t, i) }
    m
  }
  @transient private lazy val memo =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Int]]()

  def compute(input: UTF8String): GenericArrayData = {
    val out = Array.newBuilder[Int]
    Bpe.words(input.toString).foreach { w =>
      val cached = memo.get(w)
      val enc =
        if (cached != null) cached
        else {
          val e = Bpe.encodeWord(w, rank).map { t =>
            val id = ids.get(t)
            if (id == null) 0 else id.intValue()
          }
          if (memo.size() < memoMax) memo.put(w, e)
          e
        }
      out ++= enc
    }
    new GenericArrayData(out.result())
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeEncodeIds", this, classOf[BpeEncodeIds].getName)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BpeEncodeIds {
  def apply(text: Column, merges: Seq[(String, String)],
            vocab: IndexedSeq[String]): Column =
    GraftBridge.column(BpeEncodeIds(GraftBridge.expression(text), merges, vocab))
}

/**
 * The INVERSE of [[BpeEncodeIds]]: map a token-id array back to
 * whitespace-normalized text through the vocabulary (`</w>` markers
 * become the word separator; out-of-range ids render as [[Bpe.Unk]] so a
 * corrupted id is VISIBLE in the output, never an exception). With
 * [[BpeEncodeIds]]'s roundtrip contract (q136), decode(encode(text)) is
 * the whitespace-normalized text for any in-alphabet corpus.
 */
case class BpeDecodeIds(child: Expression, vocab: IndexedSeq[String])
    extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bpe_decode_ids expects array<int> (the token-id column), got ${other.simpleString}")
  }

  def compute(input: org.apache.spark.sql.catalyst.util.ArrayData): UTF8String = {
    val sb = new java.lang.StringBuilder()
    val n = input.numElements()
    var i = 0
    while (i < n) {
      // null slots render as <unk> too — a hole must be visible
      val tok =
        if (input.isNullAt(i)) Bpe.Unk
        else {
          val id = input.getInt(i)
          if (id >= 0 && id < vocab.length) vocab(id) else Bpe.Unk
        }
      sb.append(tok)
      i += 1
    }
    // </w> marks word ends: separator, then strip the separator spaces at
    // the ends (ONLY ' ' — a Java trim would also eat control chars that
    // legitimately live inside words). Leading spaces only occur for
    // corrupted ids (a bare </w> token first), but those must still
    // render cleanly.
    val out = sb.toString.replace(Bpe.Eow, " ")
    var a = 0; var b = out.length
    while (a < b && out.charAt(a) == ' ') a += 1
    while (b > a && out.charAt(b - 1) == ' ') b -= 1
    UTF8String.fromString(out.substring(a, b))
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeDecodeIds", this, classOf[BpeDecodeIds].getName)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BpeDecodeIds {
  def apply(ids: Column, vocab: IndexedSeq[String]): Column =
    GraftBridge.column(BpeDecodeIds(GraftBridge.expression(ids), vocab))
}
