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
 * Byte fallback (`byteFallback=true`, from the store's training stamp):
 * a codepoint outside `alpha` (the store's trained alphabet) decomposes
 * into its UTF-8 bytes as `<0xNN>` tokens — all 256 seeded in a
 * fallback store's alphabet — so encoding a corpus the tokenizer never
 * saw emits ZERO `<unk>` and stays losslessly detokenizable (the GPT-2 /
 * SentencePiece byte-fallback idea). Without it, unseen codepoints pass
 * through as themselves here (string tokens) and collapse to `<unk>`
 * only at the id layer ([[BpeEncodeIds]]).
 *
 * Per-executor word→tokens memo: corpus word frequency is Zipfian, so
 * almost every occurrence hits the memo and a 100 TB encode pays the
 * merge walk once per DISTINCT word per executor. The memo is a
 * ConcurrentHashMap (expression instances are shared across a stage's
 * tasks) hard-capped at [[BpeEncode.MemoMax]] entries — beyond that new
 * words encode unmemoized rather than grow executor memory unboundedly.
 */
case class BpeEncode(child: Expression, merges: Seq[(String, String)],
                     memoMax: Int = BpeEncode.MemoMax,
                     alpha: Seq[String] = Nil, byteFallback: Boolean = false)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bpe_encode expects a string column, got ${other.simpleString}")
  }

  @transient private lazy val rank = Bpe.ranks(merges)
  @transient private lazy val alphaSet: java.util.HashSet[String] =
    if (!byteFallback) null
    else new java.util.HashSet[String](java.util.Arrays.asList(alpha: _*))
  @transient private lazy val memo =
    new java.util.concurrent.ConcurrentHashMap[String, Array[UTF8String]]()

  def compute(input: UTF8String): GenericArrayData = {
    val out = Array.newBuilder[UTF8String]
    Bpe.words(input.toString).foreach { w =>
      val cached = memo.get(w)
      val toks =
        if (cached != null) cached
        else {
          val enc = Bpe.encodeWord(w, rank, alphaSet).map(UTF8String.fromString)
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

  /** Encode configured by a validated store read — the byte-fallback
    * stamp rides along, so a fallback store always gets a fallback
    * encoder. */
  def apply(text: Column, loaded: Bpe.Loaded): Column =
    // the alphabet only steers the FALLBACK decomposition — for the common
    // non-fallback store it would ride the expression (serialization,
    // case-class equality on every plan transform) entirely unread
    GraftBridge.column(BpeEncode(GraftBridge.expression(text), loaded.merges,
      MemoMax, if (loaded.byteFallback) loaded.alpha else Nil,
      loaded.byteFallback))

  /** Tokenizer-exact token count. */
  def count(text: Column, merges: Seq[(String, String)]): Column =
    org.apache.spark.sql.functions.size(apply(text, merges))

  def count(text: Column, loaded: Bpe.Loaded): Column =
    org.apache.spark.sql.functions.size(apply(text, loaded))
}

/**
 * [[BpeEncode]]'s id-emitting sibling: the token-ID array (`array<int>`)
 * — the `input_ids` a training run actually consumes — encoded against a
 * merges list and its [[Bpe.loadVocab]] vocabulary. Symbols outside the
 * vocabulary (characters the training corpus never contained) map to
 * [[Bpe.Unk]]'s id 0 by default; under `byteFallback` they decompose to
 * UTF-8 byte tokens FIRST (each with a real id), so `<unk>` never
 * appears; `failOnOov=true` instead refuses the row loudly — the
 * encode-time drift guard for pipelines that would rather stop than
 * degrade when the corpus has drifted outside the trained alphabet.
 * Same codegen/memo shape as [[BpeEncode]]; the memo holds the final int
 * arrays, so the per-word cost after warmup is one map hit regardless of
 * vocabulary size.
 */
case class BpeEncodeIds(child: Expression, merges: Seq[(String, String)],
                        vocab: IndexedSeq[String],
                        memoMax: Int = BpeEncode.MemoMax,
                        alpha: Seq[String] = Nil, byteFallback: Boolean = false,
                        failOnOov: Boolean = false)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bpe_encode_ids expects a string column, got ${other.simpleString}")
  }

  @transient private lazy val rank = Bpe.ranks(merges)
  @transient private lazy val alphaSet: java.util.HashSet[String] =
    if (!byteFallback) null
    else new java.util.HashSet[String](java.util.Arrays.asList(alpha: _*))
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
          val e = Bpe.encodeWord(w, rank, alphaSet).map { t =>
            val id = ids.get(t)
            if (id != null) id.intValue()
            else if (failOnOov) throw new graft.api.TransformException(
              s"bpe_encode_ids: symbol '$t' (in word '$w') is outside the " +
                "trained vocabulary and onOov=fail — the corpus has drifted " +
                "outside the store's alphabet; retrain the store, encode " +
                "with a byteFallback=true store, or accept <unk> (onOov=unk)")
            else 0
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

  def apply(text: Column, loaded: Bpe.Loaded): Column =
    apply(text, loaded, failOnOov = false)

  def apply(text: Column, loaded: Bpe.Loaded, failOnOov: Boolean): Column =
    // alpha unread unless byteFallback — see BpeEncode.apply
    GraftBridge.column(BpeEncodeIds(GraftBridge.expression(text), loaded.merges,
      loaded.vocab, BpeEncode.MemoMax,
      if (loaded.byteFallback) loaded.alpha else Nil, loaded.byteFallback,
      failOnOov))
}

/**
 * The INVERSE of [[BpeEncodeIds]]: map a token-id array back to
 * whitespace-normalized text through the vocabulary (`</w>` markers
 * become the word separator; out-of-range ids render as [[Bpe.Unk]] so a
 * corrupted id is VISIBLE in the output, never an exception). Under
 * `byteFallback` (the store's training stamp), maximal runs of `<0xNN>`
 * byte tokens decode as UTF-8 — a malformed run renders as U+FFFD
 * (visible, never an exception) — so decode(encode(text)) reconstructs
 * the whitespace-normalized text even for corpora entirely outside the
 * trained alphabet. With [[BpeEncodeIds]]'s roundtrip contract (q136),
 * decode(encode(text)) is the whitespace-normalized text for any
 * in-alphabet corpus.
 *
 * == Marker collisions (resolved by escaping) ==
 *
 * Decoding is textual, so a document whose TEXT literally contains the
 * 4-char marker string `</w>` would be indistinguishable from a word
 * boundary in the concatenated token stream. The pre-tokenizer therefore
 * ESCAPES the whole marker family at encode/train time
 * ([[Bpe.escapeMarkers]]: `</w{k}>` → `</w{k+1}>`, injective), and this
 * decoder inverts it ([[Bpe.unescapeMarkers]]) after the marker
 * replacement — decode(encode(text)) is the whitespace-normalized text
 * even when the text is full of literal markers. The remaining benign
 * alias: a merge product that literally spells `<unk>` maps to id 0,
 * which decodes back to the SAME string `<unk>` (textually lossless; it
 * only blurs OOV accounting for corpora that both contain the literal
 * and re-merge it). Under byteFallback a literal `<0xNN>` that training
 * fully re-merged would alias a byte token — [[Bpe.mergesFrame]] refuses
 * that at train time for fallback stores.
 */
case class BpeDecodeIds(child: Expression, vocab: IndexedSeq[String],
                        byteFallback: Boolean = false)
    extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bpe_decode_ids expects array<int> (the token-id column), got ${other.simpleString}")
  }

  def compute(input: org.apache.spark.sql.catalyst.util.ArrayData): UTF8String = {
    val sb = new java.lang.StringBuilder()
    // byte-fallback state: a maximal run of byte tokens buffers here and
    // flushes as ONE UTF-8 decode (REPLACE on malformed — visible U+FFFD,
    // never an exception) when a non-byte token or the end arrives
    var byteBuf: java.io.ByteArrayOutputStream = null
    def flushBytes(): Unit =
      if (byteBuf != null && byteBuf.size() > 0) {
        sb.append(new String(byteBuf.toByteArray,
          java.nio.charset.StandardCharsets.UTF_8))
        byteBuf.reset()
      }
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
      val b = if (byteFallback) Bpe.byteTokenValue(tok) else -1
      if (b >= 0) {
        if (byteBuf == null) byteBuf = new java.io.ByteArrayOutputStream(16)
        byteBuf.write(b)
      } else {
        flushBytes()
        sb.append(tok)
      }
      i += 1
    }
    flushBytes()
    // </w> marks word ends: separator, then strip the separator spaces at
    // the ends (ONLY ' ' — a Java trim would also eat control chars that
    // legitimately live inside words). Leading spaces only occur for
    // corrupted ids (a bare </w> token first), but those must still
    // render cleanly. Every `</w>` here IS a marker — encode escaped the
    // literal family (Bpe.escapeMarkers), so the textual replace is sound;
    // unescapeMarkers then restores literal `</w{k}>` text exactly.
    val out = Bpe.unescapeMarkers(sb.toString.replace(Bpe.Eow, " "))
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

  def apply(ids: Column, loaded: Bpe.Loaded): Column =
    GraftBridge.column(BpeDecodeIds(GraftBridge.expression(ids), loaded.vocab,
      loaded.byteFallback))
}

/**
 * Out-of-vocabulary observability: the number of codepoints in a text
 * row that lie OUTSIDE a trained store's alphabet (whitespace excluded —
 * it is the pre-tokenizer's separator, never a symbol). This is exactly
 * the number of `<unk>` ids a non-fallback [[BpeEncodeIds]] would emit
 * for the row (an out-of-alphabet codepoint can never participate in a
 * trained merge, so each one survives as a single unmapped symbol), and
 * under byteFallback the number of codepoints that took the byte path —
 * the drift metric that makes cross-corpus encode quality VISIBLE
 * (`sum(oov)/sum(tokens)` over a run) instead of silently degraded.
 * One zero-shuffle codegen'd projection, same scale shape as the encode.
 */
case class BpeOovCount(child: Expression, alpha: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bpe_oov_count expects a string column, got ${other.simpleString}")
  }

  @transient private lazy val alphaSet: java.util.HashSet[String] =
    new java.util.HashSet[String](java.util.Arrays.asList(alpha: _*))

  def compute(input: UTF8String): Int = {
    var oov = 0
    Bpe.words(input.toString).foreach { w =>
      var i = 0
      while (i < w.length) {
        val cp = w.codePointAt(i)
        val n = Character.charCount(cp)
        if (!alphaSet.contains(w.substring(i, i + n))) oov += 1
        i += n
      }
    }
    oov
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeOovCount", this, classOf[BpeOovCount].getName)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BpeOovCount {
  def apply(text: Column, alpha: Seq[String]): Column =
    GraftBridge.column(BpeOovCount(GraftBridge.expression(text), alpha))

  def apply(text: Column, loaded: Bpe.Loaded): Column =
    apply(text, loaded.alpha)
}
