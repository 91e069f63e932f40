package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.api.{ConfigException, RunContext}
import graft.config.TransformConfig

/** The declarative BPE surface: the bpe_train → persist → register →
  * bpe_tokenize/bpe_token_count store cycle, the tokenizer-exact
  * mergesView mode of token_cap / pack_sequences / text_signals, and the
  * guided failure modes. */
class BpeTransformSpec extends SparkTestBase {
  import spark.implicits._

  private def ctx = RunContext(spark, "t", "r")
  private def t(typ: String, opts: (String, String)*) =
    TransformConfig(s"$typ-t", typ, opts.toMap)
  private def ap(df: org.apache.spark.sql.DataFrame, tc: TransformConfig) =
    graft.runtime.Registries.transforms().get(tc.transformType).apply(df, tc, ctx)

  private def corpus = Seq(
    (1L, "low lowest low", "web"),
    (2L, "newest newest wider", "web"),
    (3L, "low low low lower lower widest", "code"),
    (4L, "newest newest newest newest widest widest", "code")
  ).toDF("doc_id", "text", "source")

  /** Train through the registry, persist, read back, register the view —
    * the full store cycle every consumer test goes through. */
  private def registeredStore(name: String, opts: (String, String)*): String = {
    val store = ap(corpus, t("bpe_train",
      (Seq("textColumn" -> "text") ++ opts): _*))
    val dir = tmpDir(s"bpe-$name")
    store.write.mode("overwrite").parquet(dir)
    spark.read.parquet(dir).createOrReplaceTempView(name)
    name
  }

  test("bpe_train → persist → register → bpe_tokenize/bpe_token_count, " +
    "and the count equals the token array size") {
    val view = registeredStore("v_bpe1", "numMerges" -> "6")
    val toks = ap(corpus, t("bpe_tokenize",
      "textColumn" -> "text", "mergesView" -> view))
    toks.columns should contain ("bpe_tokens")
    val counted = ap(toks, t("bpe_token_count",
      "textColumn" -> "text", "mergesView" -> view))
    counted.where(col("n_bpe_tokens") =!=
        org.apache.spark.sql.functions.size(col("bpe_tokens")))
      .count() shouldBe 0L
    // the trained merges compress: fewer tokens than characters, more
    // than whitespace words
    val r = counted
      .select(sum(col("n_bpe_tokens")).cast("long"),
        sum(org.apache.spark.sql.functions.length(col("text"))).cast("long"))
      .as[(Long, Long)].head()
    r._1 should be < r._2
    // tokens concatenate back to the words (</w> marks word ends)
    val detok = toks.select(
        trim(regexp_replace(concat_ws("", col("bpe_tokens")), "</w>", " ")),
        regexp_replace(col("text"), "\\s+", " "))
      .as[(String, String)].collect()
    detok.foreach { case (d, orig) => d shouldBe orig }
  }

  test("token_cap with mergesView equals token_cap over a pre-computed " +
    "BPE count column, and the helper weight stays out of the schema") {
    val view = registeredStore("v_bpe2", "numMerges" -> "6")
    val withCount = ap(corpus, t("bpe_token_count",
      "textColumn" -> "text", "mergesView" -> view))
    val viaView = ap(corpus, t("token_cap",
      "idColumn" -> "doc_id", "textColumn" -> "text", "mergesView" -> view,
      "groupBy" -> "source", "budget" -> "8"))
    val viaColumn = ap(withCount, t("token_cap",
      "idColumn" -> "doc_id", "weightColumn" -> "n_bpe_tokens",
      "groupBy" -> "source", "budget" -> "8"))
    viaView.columns.toSeq shouldBe corpus.columns.toSeq // no helper leak
    viaView.select("doc_id").as[Long].collect().toSet shouldBe
      viaColumn.select("doc_id").as[Long].collect().toSet
  }

  test("pack_sequences with mergesView packs in tokenizer-exact tokens") {
    val view = registeredStore("v_bpe3", "numMerges" -> "6")
    val withCount = ap(corpus, t("bpe_token_count",
      "textColumn" -> "text", "mergesView" -> view))
    val viaView = ap(corpus, t("pack_sequences",
      "idColumn" -> "doc_id", "textColumn" -> "text", "mergesView" -> view,
      "seqLen" -> "5"))
    val viaColumn = ap(withCount, t("pack_sequences",
      "idColumn" -> "doc_id", "weightColumn" -> "n_bpe_tokens",
      "seqLen" -> "5"))
    val key = Seq("doc_id", "seq_id", "tok_start", "tok_end", "pos_in_seq")
    viaView.select(key.head, key.tail: _*).collect().toSet shouldBe
      viaColumn.select(key.head, key.tail: _*).collect().toSet
    // exactly-N invariant in BPE tokens: every sequence but the last
    // carries seqLen units
    val spans = viaView.groupBy("seq_id")
      .agg(sum(col("tok_end") - col("tok_start")).as("units"))
    val maxSeq = spans.agg(max("seq_id")).as[Long].head()
    spans.where(col("seq_id") =!= maxSeq).where(col("units") =!= 5)
      .count() shouldBe 0L
  }

  test("text_signals with mergesView reports the tokenizer-exact " +
    "bpe_tokens signal instead of the regex proxy") {
    val view = registeredStore("v_bpe4", "numMerges" -> "6")
    val exact = ap(corpus, t("text_signals",
      "textColumn" -> "text", "signals" -> "bpe_tokens",
      "mergesView" -> view))
    val viaCount = ap(corpus, t("bpe_token_count",
      "textColumn" -> "text", "mergesView" -> view))
    exact.select("doc_id", "n_bpe_tokens").collect().toSet shouldBe
      viaCount.select("doc_id", "n_bpe_tokens").collect().toSet
  }

  test("bpe_tokenize emit=ids + bpe_vocab: every id array detokenizes " +
    "back to the string tokens through the persisted vocabulary") {
    val view = registeredStore("v_bpe6", "numMerges" -> "6")
    val both = ap(ap(corpus, t("bpe_tokenize",
        "textColumn" -> "text", "mergesView" -> view)),
      t("bpe_tokenize", "textColumn" -> "text", "mergesView" -> view,
        "emit" -> "ids"))
    both.columns should contain allOf ("bpe_tokens", "input_ids")
    val vocab = ap(corpus, t("bpe_vocab", "mergesView" -> view))
    vocab.columns.toSeq shouldBe Seq("token_id", "token")
    // <unk> holds id 0, every id is in-range, and mapping each id back
    // through the vocab reproduces the string tokens row-for-row
    vocab.where("token_id = 0").select("token")
      .as[String].head() shouldBe "<unk>"
    val v = vocab.orderBy("token_id").as[(Int, String)].collect().map(_._2)
    both.select("bpe_tokens", "input_ids").as[(Seq[String], Seq[Int])]
      .collect().foreach { case (toks, ids) =>
        ids.map(v(_)) shouldBe toks // corpus words: no <unk> substitution
      }
    // an out-of-vocabulary character maps to <unk>=0, never an error
    val oov = ap(Seq((9L, "zzz", "web")).toDF("doc_id", "text", "source"),
      t("bpe_tokenize", "textColumn" -> "text", "mergesView" -> view,
        "emit" -> "ids"))
    oov.select("input_ids").as[Seq[Int]].head() shouldBe
      Seq(0, 0, 0, v.indexOf("</w>"))
  }

  test("bpe_detokenize inverts the id encode; corrupted ids render as " +
    "<unk>, never an exception") {
    import org.apache.spark.sql.functions._
    val view = registeredStore("v_bpe8", "numMerges" -> "6")
    val round = ap(ap(corpus, t("bpe_tokenize", "textColumn" -> "text",
        "mergesView" -> view, "emit" -> "ids")),
      t("bpe_detokenize", "idsColumn" -> "input_ids", "mergesView" -> view))
    // decode(encode(text)) == whitespace-normalized text, per document
    round.where("detok_text <> regexp_replace(trim(text), '\\\\s+', ' ')")
      .count() shouldBe 0L
    // out-of-range / negative / null-array ids are VISIBLE, not fatal
    val dirty = Seq(
      (1L, Seq(999999, -3)), (2L, Seq.empty[Int]),
      (3L, null.asInstanceOf[Seq[Int]])).toDF("doc_id", "input_ids")
    val out = ap(dirty, t("bpe_detokenize", "idsColumn" -> "input_ids",
        "mergesView" -> view))
      .orderBy("doc_id").select("detok_text").as[String].collect()
    out(0) shouldBe "<unk><unk>"
    out(1) shouldBe ""
    out(2) shouldBe null
    // guided: missing view / output collision
    intercept[ConfigException] {
      ap(dirty, t("bpe_detokenize", "idsColumn" -> "input_ids",
        "mergesView" -> "nope_view"))
    }.getMessage should include ("nope_view")
    intercept[ConfigException] {
      ap(dirty.withColumn("detok_text", lit("x")),
        t("bpe_detokenize", "idsColumn" -> "input_ids", "mergesView" -> view))
    }.getMessage should include ("already exists")
  }

  test("pack_sequences emit=input_ids materializes fixed-length training " +
    "rows whose concatenation equals the corpus's id stream") {
    val view = registeredStore("v_bpe7", "numMerges" -> "6")
    val packed = ap(corpus, t("pack_sequences",
      "idColumn" -> "doc_id", "textColumn" -> "text", "mergesView" -> view,
      "seqLen" -> "5", "emit" -> "input_ids"))
    packed.columns.toSeq should contain theSameElementsAs
      Seq("seq_id", "input_ids", "n_docs", "seq_weight")
    // exactly-N: every sequence but the last holds exactly 5 ids, and
    // seq_weight agrees with the array it describes
    val rows = packed.orderBy("seq_id")
      .as[(Long, Seq[Int], Long, Long)].collect()
    rows.init.foreach { case (_, ids, _, w) =>
      ids.size shouldBe 5; w shouldBe 5 }
    rows.last._2.size shouldBe rows.last._4
    // lossless: the concatenation of sequences in seq_id order IS the
    // concatenation of per-document id arrays in doc_id order
    val stream = ap(corpus, t("bpe_tokenize", "textColumn" -> "text",
        "mergesView" -> view, "emit" -> "ids"))
      .orderBy("doc_id").as[(Long, String, String, Seq[Int])]
      .collect().flatMap(_._4).toSeq
    rows.flatMap(_._2).toSeq shouldBe stream
    // appendId: the end-of-text separator convention — exactly one
    // separator after every (non-empty) document, counted in the weights
    val sep = 9999
    val withSep = ap(corpus, t("pack_sequences",
      "idColumn" -> "doc_id", "textColumn" -> "text", "mergesView" -> view,
      "seqLen" -> "5", "emit" -> "input_ids", "appendId" -> sep.toString))
    val sepStream = withSep.orderBy("seq_id")
      .as[(Long, Seq[Int], Long, Long)].collect().flatMap(_._2).toSeq
    sepStream.count(_ == sep) shouldBe corpus.count()
    // removing the separators leaves exactly the plain id stream
    sepStream.filterNot(_ == sep) shouldBe stream
    // an empty document gets NO separator (a separator-only doc is noise)
    val withEmpty = corpus.unionByName(
      Seq((9L, "   ", "web")).toDF("doc_id", "text", "source"))
    ap(withEmpty, t("pack_sequences",
      "idColumn" -> "doc_id", "textColumn" -> "text", "mergesView" -> view,
      "seqLen" -> "5", "emit" -> "input_ids", "appendId" -> sep.toString))
      .as[(Long, Seq[Int], Long, Long)].collect()
      .flatMap(_._2).count(_ == sep) shouldBe corpus.count()
    intercept[ConfigException] {
      ap(corpus, t("pack_sequences", "idColumn" -> "doc_id",
        "textColumn" -> "text", "mergesView" -> view, "seqLen" -> "5",
        "emit" -> "input_ids", "appendId" -> "eos"))
    }.getMessage should include ("appendId")
    // weightColumn contradicts the derived ids → guided rejection
    intercept[ConfigException] {
      ap(corpus, t("pack_sequences", "idColumn" -> "doc_id",
        "textColumn" -> "text", "mergesView" -> view, "seqLen" -> "5",
        "emit" -> "input_ids", "weightColumn" -> "doc_id"))
    }.getMessage should include ("weightColumn does not apply")
    // and input_ids without the tokenizer store is meaningless
    intercept[ConfigException] {
      ap(corpus, t("pack_sequences", "idColumn" -> "doc_id",
        "textColumn" -> "text", "seqLen" -> "5", "emit" -> "input_ids"))
    }.getMessage should include ("mergesView")
  }

  test("pack_sequences padId + emitMask emit RECTANGULAR tensors: every " +
    "row exactly seqLen ids, mask 1s cover the real ids, pads carry 0s") {
    val view = registeredStore("v_bpe11", "numMerges" -> "6")
    val packed = ap(corpus, t("pack_sequences",
      "idColumn" -> "doc_id", "textColumn" -> "text", "mergesView" -> view,
      "seqLen" -> "5", "emit" -> "input_ids",
      "padId" -> "-1", "emitMask" -> "true"))
    packed.columns.toSeq should contain theSameElementsAs
      Seq("seq_id", "input_ids", "attention_mask", "n_docs", "seq_weight")
    val rows = packed.orderBy("seq_id")
      .as[(Long, Seq[Int], Long, Long, Seq[Int])].collect()
    rows.foreach { case (_, ids, _, w, mask) =>
      ids.size shouldBe 5         // rectangular: EVERY row, not just full ones
      mask.size shouldBe 5
      mask.count(_ == 1) shouldBe w
      mask shouldBe (Seq.fill(w.toInt)(1) ++ Seq.fill(5 - w.toInt)(0))
      ids.drop(w.toInt).foreach(_ shouldBe -1) // pads after the real ids
      ids.take(w.toInt).foreach(_ should not be -1)
    }
    // stripping pads leaves exactly the unpadded stream (losslessness)
    val plain = ap(corpus, t("pack_sequences",
      "idColumn" -> "doc_id", "textColumn" -> "text", "mergesView" -> view,
      "seqLen" -> "5", "emit" -> "input_ids"))
      .orderBy("seq_id").as[(Long, Seq[Int], Long, Long)]
      .collect().flatMap(_._2).toSeq
    rows.flatMap(_._2).filterNot(_ == -1).toSeq shouldBe plain
    // guided failures: mask without pad, pad outside emit=input_ids
    intercept[ConfigException] {
      ap(corpus, t("pack_sequences", "idColumn" -> "doc_id",
        "textColumn" -> "text", "mergesView" -> view, "seqLen" -> "5",
        "emit" -> "input_ids", "emitMask" -> "true"))
    }.getMessage should include ("padId")
    intercept[ConfigException] {
      ap(corpus, t("pack_sequences", "idColumn" -> "doc_id",
        "weightColumn" -> "doc_id", "seqLen" -> "5", "padId" -> "-1"))
    }.getMessage should include ("emit=input_ids")
    intercept[ConfigException] {
      ap(corpus, t("pack_sequences", "idColumn" -> "doc_id",
        "textColumn" -> "text", "mergesView" -> view, "seqLen" -> "5",
        "emit" -> "input_ids", "padId" -> "none"))
    }.getMessage should include ("padId")
  }

  test("guided failures: mode conflicts, unknown views, stamp mismatches, " +
    "and output collisions") {
    val view = registeredStore("v_bpe5", "numMerges" -> "6")
    intercept[ConfigException] { // both weight definitions
      ap(corpus, t("token_cap", "idColumn" -> "doc_id",
        "weightColumn" -> "doc_id", "mergesView" -> view, "budget" -> "5"))
    }.getMessage should include ("mutually exclusive")
    intercept[ConfigException] { // neither weight definition
      ap(corpus, t("token_cap", "idColumn" -> "doc_id", "budget" -> "5"))
    }.getMessage should include ("weightColumn")
    intercept[ConfigException] { // mergesView needs textColumn
      ap(corpus, t("token_cap", "idColumn" -> "doc_id",
        "mergesView" -> view, "budget" -> "5"))
    }.getMessage should include ("textColumn")
    intercept[ConfigException] { // unregistered view
      ap(corpus, t("bpe_tokenize",
        "textColumn" -> "text", "mergesView" -> "nope_view"))
    }.getMessage should include ("nope_view")
    intercept[ConfigException] { // stamp mismatch fails loud
      ap(corpus, t("bpe_token_count", "textColumn" -> "text",
        "mergesView" -> view, "numMerges" -> "999"))
    }.getMessage should include ("numMerges 999")
    intercept[ConfigException] { // token-weighted substring is nonsense
      ap(corpus, t("pack_sequences", "idColumn" -> "doc_id",
        "textColumn" -> "text", "mergesView" -> view,
        "seqLen" -> "5", "emit" -> "text"))
    }.getMessage should include ("emit=text")
    intercept[ConfigException] { // output column collision
      ap(corpus.withColumn("bpe_tokens", lit(1)), t("bpe_tokenize",
        "textColumn" -> "text", "mergesView" -> view))
    }.getMessage should include ("already exists")
  }

  test("bpe_train byteFallback → store cycle: cross-corpus encode emits " +
    "zero <unk>, oovColumn observes the fallback codepoints, and " +
    "detokenize reconstructs the unseen corpus") {
    val view = registeredStore("v_bpe9", "numMerges" -> "6",
      "byteFallback" -> "true")
    // a corpus entirely outside the low/newest training alphabet
    val unseen = Seq((1L, "zq 漢字", "web"), (2L, "low zq", "web"))
      .toDF("doc_id", "text", "source")
    val ids = ap(unseen, t("bpe_tokenize", "textColumn" -> "text",
      "mergesView" -> view, "emit" -> "ids", "oovColumn" -> "n_oov"))
    ids.columns should contain ("n_oov")
    val rows = ap(ids, t("bpe_detokenize", "idsColumn" -> "input_ids",
        "mergesView" -> view))
      .orderBy("doc_id")
      .select("input_ids", "n_oov", "detok_text", "text")
      .as[(Seq[Int], Int, String, String)].collect()
    rows.foreach { case (idArr, _, detok, text) =>
      idArr should not contain 0
      detok shouldBe text
    }
    rows.map(_._2).toSeq shouldBe Seq(4, 2) // z,q,漢,字 then z,q
    // guided option failures
    intercept[ConfigException] {
      ap(corpus, t("bpe_train", "textColumn" -> "text",
        "byteFallback" -> "maybe"))
    }.getMessage should include ("byteFallback")
    intercept[ConfigException] { // onOov applies to ids only
      ap(corpus, t("bpe_tokenize", "textColumn" -> "text",
        "mergesView" -> view, "onOov" -> "fail"))
    }.getMessage should include ("emit=ids")
    intercept[ConfigException] {
      ap(corpus, t("bpe_tokenize", "textColumn" -> "text",
        "mergesView" -> view, "emit" -> "ids", "onOov" -> "explode"))
    }.getMessage should include ("onOov")
    intercept[ConfigException] { // oovColumn collision
      ap(corpus.withColumn("n_oov", lit(1)), t("bpe_token_count",
        "textColumn" -> "text", "mergesView" -> view, "oovColumn" -> "n_oov"))
    }.getMessage should include ("n_oov")
    intercept[ConfigException] { // …and case-INSENSITIVELY: withColumn
      // resolves N_OOV == n_oov, so the guard must too
      ap(corpus.withColumn("N_OOV", lit(1)), t("bpe_token_count",
        "textColumn" -> "text", "mergesView" -> view, "oovColumn" -> "n_oov"))
    }.getMessage should include ("n_oov")
  }

  test("text_signals rejects a mergesView that would be loaded and never " +
    "used (bpe_tokens not selected)") {
    val view = registeredStore("v_bpe10", "numMerges" -> "6")
    intercept[ConfigException] {
      ap(corpus, t("text_signals", "textColumn" -> "text",
        "signals" -> "tokens,chars", "mergesView" -> view))
    }.getMessage should include ("bpe_tokens")
    // and the valid pairing still works with an explicit signal list
    ap(corpus, t("text_signals", "textColumn" -> "text",
      "signals" -> "chars,bpe_tokens", "mergesView" -> view))
      .columns should contain allOf ("n_chars", "n_bpe_tokens")
  }
}
