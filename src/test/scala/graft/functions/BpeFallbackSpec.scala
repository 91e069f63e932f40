package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.api.ConfigException
import graft.functions.expressions.{BpeDecodeIds, BpeEncode, BpeEncodeIds, BpeOovCount}
import graft.text.Bpe

/** Byte-level fallback (the GPT-2/SentencePiece cross-corpus property):
  * a store trained on corpus A must encode corpus B with ZERO `<unk>` —
  * unseen codepoints decompose into UTF-8 byte tokens seeded in the
  * alphabet — and detokenize back to the whitespace-normalized text. Plus
  * the OOV observability expression and the loud train/load guards. */
class BpeFallbackSpec extends SparkTestBase {
  import spark.implicits._

  /** A store trained on a DISJOINT (Greek) corpus: nothing in an ASCII /
    * CJK / emoji probe is in its corpus alphabet, so every probe
    * codepoint exercises the fallback path. */
  private lazy val greekStore = Bpe.mergesFrame(
    Seq.fill(4)("αβ αβγ γβα").toDF("text"), "text",
    numMerges = 8, byteFallback = true)
  private lazy val greekLoaded = Bpe.load(greekStore)

  test("byteFallback seeds all 256 byte tokens into the alphabet and " +
    "stamps the store; the stamp survives a parquet round-trip") {
    greekStore.columns should contain ("bpe_byte_fallback")
    val alpha = greekStore.where(col("kind") === "alpha")
      .select("lhs").as[String].collect().toSet
    Bpe.ByteTokens.foreach(bt => alpha should contain (bt))
    // corpus symbols ride beside the byte tokens
    alpha should contain allOf ("α", "β", "γ", Bpe.Eow)
    val dir = tmpDir("bpe-bff")
    greekStore.write.mode("overwrite").parquet(dir)
    val loaded = Bpe.load(spark.read.parquet(dir))
    loaded.byteFallback shouldBe true
    loaded.alpha.size shouldBe (256 + 4)
    // a pre-fallback store (no stamp column) loads as byteFallback=false
    Bpe.load(greekStore.drop("bpe_byte_fallback")).byteFallback shouldBe false
  }

  test("wordSymbolsFallback decomposes out-of-alphabet codepoints into " +
    "UTF-8 byte tokens, golden values") {
    val alphaSet = new java.util.HashSet[String]()
    Seq("a", "b", Bpe.Eow).foreach(alphaSet.add)
    // in-alphabet passes through; é = U+00E9 = 0xC3 0xA9; 𐀀 = U+10000 =
    // 0xF0 0x90 0x80 0x80 (a surrogate PAIR, one codepoint, four bytes)
    Bpe.wordSymbolsFallback("aéb", alphaSet).toSeq shouldBe
      Seq("a", "<0xC3>", "<0xA9>", "b", Bpe.Eow)
    Bpe.wordSymbolsFallback("𐀀", alphaSet).toSeq shouldBe
      Seq("<0xF0>", "<0x90>", "<0x80>", "<0x80>", Bpe.Eow)
    // plain ASCII out-of-alphabet: one byte each
    Bpe.wordSymbolsFallback("cab", alphaSet).toSeq shouldBe
      Seq("<0x63>", "a", "b", Bpe.Eow)
  }

  test("cross-corpus encode: a Greek-trained fallback store encodes " +
    "ASCII/CJK/emoji text with ZERO <unk> and detokenizes it back exactly") {
    val probes = Seq(
      "the quick brown fox", "hello, world! 123",
      "漢字 と かな", "emoji 🙂 mixed αβ text",
      "tabs\tand\nnewlines collapse")
    val df = probes.toDF("text")
    val out = df.select(
        BpeEncodeIds(col("text"), greekLoaded).as("ids"),
        BpeDecodeIds(BpeEncodeIds(col("text"), greekLoaded), greekLoaded)
          .as("detok"),
        col("text"))
      .as[(Seq[Int], String, String)].collect()
    out.foreach { case (ids, detok, text) =>
      withClue(s"text '$text': ") {
        ids should not contain 0 // zero <unk>
        detok shouldBe text.trim.replaceAll("[ \\t\\n\\u000B\\f\\r]+", " ")
      }
    }
    // the same store WITHOUT fallback emits <unk> on every probe — the
    // silent-degradation mode fallback exists to eliminate
    val plain = Bpe.load(Bpe.mergesFrame(
      Seq.fill(4)("αβ αβγ γβα").toDF("text"), "text", numMerges = 8))
    df.select(BpeEncodeIds(col("text"), plain).as("ids"))
      .as[Seq[Int]].collect()
      .foreach(ids => ids should contain (0))
  }

  test("property: any well-formed Unicode text (incl. non-BMP) " +
    "roundtrips under byteFallback (seeded random corpora)") {
    val rnd = new scala.util.Random(13)
    // codepoint pools spanning 1..4-byte UTF-8; '<' excluded so generated
    // text can never spell the in-band marker strings (the documented
    // roundtrip boundary, asserted separately below)
    val pools = Seq(
      ('a' to 'z').map(_.toInt), (0xC0 to 0xFF), // 1- and 2-byte
      (0x4E00 to 0x4E80), (0x1F600 to 0x1F640))  // 3- and 4-byte (non-BMP)
    def word(): String = (1 to (1 + rnd.nextInt(5))).map { _ =>
      val pool = pools(rnd.nextInt(pools.length))
      new String(Character.toChars(pool(rnd.nextInt(pool.size))))
    }.mkString
    val texts = (1 to 40).map(_ =>
      (1 to (1 + rnd.nextInt(6))).map(_ => word()).mkString(" "))
    val out = texts.toDF("text").select(
        col("text"),
        BpeDecodeIds(BpeEncodeIds(col("text"), greekLoaded), greekLoaded)
          .as("detok"),
        BpeEncodeIds(col("text"), greekLoaded).as("ids"))
      .as[(String, String, Seq[Int])].collect()
    out.foreach { case (text, detok, ids) =>
      withClue(s"text '$text': ") {
        detok shouldBe text
        ids should not contain 0
      }
    }
    // an unpaired surrogate is NOT well-formed: it degrades VISIBLY to the
    // UTF-8 encoder's replacement '?', never an exception or silent drop
    Seq("a\uD800b").toDF("text")
      .select(BpeDecodeIds(BpeEncodeIds(col("text"), greekLoaded), greekLoaded))
      .as[String].head() shouldBe "a?b"
  }

  test("string-token encode takes the same fallback path, and literal " +
    "marker text roundtrips through the escape (the closed former boundary)") {
    val toks = Seq("hi αβ").toDF("text")
      .select(BpeEncode(col("text"), greekLoaded))
      .as[Seq[String]].head()
    toks.take(3) shouldBe Seq("<0x68>", "<0x69>", Bpe.Eow)
    toks.drop(3).mkString shouldBe ("αβ" + Bpe.Eow) // trained merges apply
    // text literally containing "</w>" used to reconstruct with a space
    // there (marker and literal were indistinguishable in-band); the
    // pre-tokenizer's marker escaping (Bpe.escapeMarkers) now keeps them
    // apart, so the roundtrip holds even through the byte-fallback path
    Seq("a</w>b").toDF("text")
      .select(BpeDecodeIds(BpeEncodeIds(col("text"), greekLoaded), greekLoaded))
      .as[String].head() shouldBe "a</w>b"
  }

  test("BpeOovCount counts out-of-alphabet codepoints — the <unk> count a " +
    "non-fallback encode would emit — and is null-safe") {
    val plain = Bpe.load(Bpe.mergesFrame(
      Seq.fill(4)("ab abc cba").toDF("text"), "text", numMerges = 4))
    val out = Seq("ab cba", "ab zq", "ζ𐀀", "  ", null: String).toDF("text")
      .select(BpeOovCount(col("text"), plain).as("oov"))
      .collect().map(r => if (r.isNullAt(0)) -1 else r.getInt(0)).toSeq
    out shouldBe Seq(0, 2, 2, 0, -1)
    // mirror property: oov == number of <unk> ids emitted
    val texts = Seq("ab cz", "zzz", "abc abc", "q")
    texts.toDF("text").select(
        BpeOovCount(col("text"), plain).as("oov"),
        BpeEncodeIds(col("text"), plain).as("ids"))
      .as[(Int, Seq[Int])].collect()
      .foreach { case (oov, ids) => oov shouldBe ids.count(_ == 0) }
  }

  test("train refuses byteFallback merges whose product spells a reserved " +
    "token, and reservedCollisions names them") {
    Bpe.reservedCollisions(Seq(("a", "b"), ("<0x4", "1>"), ("<un", "k>")))
      .toSet shouldBe Set("<0x41>", "<unk>")
    Bpe.reservedCollisions(Seq(("a", "b"), ("<0x", "4"))) shouldBe empty
    // empty-corpus training fails loudly at BUILD time with the real cause
    val emptyErr = intercept[ConfigException] {
      Bpe.mergesFrame(Seq("", "   ", null: String).toDF("text"), "text")
    }
    emptyErr.getMessage should include ("produced no words")
  }

  test("a byteFallback-stamped store missing byte tokens is refused at load") {
    val broken = greekStore.where(
      col("kind") =!= "alpha" || col("lhs") =!= "<0x41>")
    // row-count stamp catches the lost row first unless we also patch it —
    // patch alpha_rows down so ONLY the byte-token completeness check fires
    val patched = broken.withColumn("bpe_alpha_rows",
        col("bpe_alpha_rows") - 1)
      .withColumn("merge_rank",
        when(col("kind") === "alpha" && col("merge_rank") > 65, // '<0x41>' rank
          col("merge_rank") - 1).otherwise(col("merge_rank")))
    val e = intercept[ConfigException] { Bpe.load(patched) }
    e.getMessage should (include ("byte token") or include ("dense"))
  }

  test("onOov=fail (failOnOov) refuses an out-of-vocabulary encode loudly") {
    val plain = Bpe.load(Bpe.mergesFrame(
      Seq.fill(4)("ab abc cba").toDF("text"), "text", numMerges = 4))
    val thrown = intercept[Exception] {
      Seq("ab zap").toDF("text")
        .select(BpeEncodeIds(col("text"), plain, failOnOov = true))
        .collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    messages(thrown).mkString should include ("onOov=fail")
    // in-vocabulary rows pass untouched under the same flag
    Seq("ab abc").toDF("text")
      .select(BpeEncodeIds(col("text"), plain, failOnOov = true).as("ids"))
      .as[Seq[Int]].head() should not contain 0
    // a byteFallback store never trips it — fallback IS the escape hatch
    Seq("zap 漢").toDF("text")
      .select(BpeEncodeIds(col("text"), greekLoaded, failOnOov = true).as("ids"))
      .as[Seq[Int]].head() should not contain 0
  }
}
