package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class TextFunctionsSpec extends SparkTestBase {
  import spark.implicits._
  import TextFunctions._

  private def one[T](c: org.apache.spark.sql.Column, text: String): T =
    Seq(text).toDF("t").select(c.as("r")).collect().head.getAs[T]("r")

  test("token counts: whitespace vs BPE-ish") {
    one[Int](tokenCount(col("t")), "Hello  world, here we go") shouldBe 5
    one[Int](tokenCount(col("t")), "   ") shouldBe 0
    // bpe-ish: [Hello][,][ ][world][!][!] → Hello, world!! = 2 words + 3 puncts
    one[Int](bpeTokenCount(col("t")), "Hello, world!!") shouldBe 5
    one[Int](bpeTokenCount(col("t")), "v2.0") shouldBe 4 // v | 2 | . | 0
  }

  test("punct and stopword ratios") {
    one[Double](punctRatio(col("t")), "ab,.") shouldBe 0.5
    one[Double](stopwordRatio(col("t")), "the cat and the hat") shouldBe 0.6
  }

  test("native TokenSignals-backed signals are bit-identical to the HOF " +
    "reference forms on adversarial texts") {
    val texts = Seq(
      "the cat and the hat", "  leading and trailing  ", "", "   ",
      "UPPER lower MiXeD", "punct,.:;!? soup###", "tabs\tand\nnewlines here",
      "ünïcödé tøkens détente 日本語 の テスト", "a", "- bullet line\n* another\n• third",
      "der die das und ist", "le la les et est", "el la los las es",
      "single…\nellipsis...\nend", "repeat repeat repeat repeat",
      null.asInstanceOf[String])
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "t")
    val cmp = df.select(
      meanTokenLength(col("t")).as("m_n"), meanTokenLengthHof(col("t")).as("m_h"),
      stopwordRatio(col("t")).as("s_n"), stopwordRatioHof(col("t")).as("s_h"),
      langId(col("t")).as("l_n"), langIdHof(col("t")).as("l_h"),
      fingerprint(col("t")).as("f_n"), fingerprintHof(col("t")).as("f_h"))
    cmp.where(
      "m_n IS DISTINCT FROM m_h OR s_n IS DISTINCT FROM s_h OR " +
      "l_n IS DISTINCT FROM l_h OR f_n IS DISTINCT FROM f_h").count() shouldBe 0
  }

  test("TokenSignals/LineSignals over an array with null elements skips " +
    "them instead of NPEing (expression constructible on any array<string>)") {
    import graft.functions.expressions.{TokenSignals, LineSignals}
    val df = Seq(1).toDF("i").select(
      array(lit("the"), lit(null).cast("string"), lit("cat")).as("toks"),
      array(lit("- bullet"), lit(null).cast("string"), lit("end...")).as("lines"))
    val ts = df.select(TokenSignals(col("toks"),
      Seq("the"), Seq("the"), Seq(Seq("the"))).as("s")).select("s.*").collect().head
    ts.getAs[Int]("n") shouldBe 3 // size() parity: null elements count
    ts.getAs[Long]("sum_len") shouldBe 6L
    ts.getAs[Int]("stop_hits") shouldBe 1
    val ls = df.select(LineSignals(col("lines")).as("s")).select("s.*").collect().head
    ls.getAs[Int]("n") shouldBe 3
    ls.getAs[Int]("bullets") shouldBe 1
    ls.getAs[Int]("ellipsis") shouldBe 1
  }

  test("edge tabs/newlines produce no phantom empty tokens (trim() only " +
    "strips ASCII space; split keeps boundary empties)") {
    one[Int](tokenCount(col("t")), "hello world\n") shouldBe 2
    one[Int](tokenCount(col("t")), "\thello\n") shouldBe 1
    one[Int](tokenCount(col("t")), "\t\n ") shouldBe 0
    one[Double](meanTokenLength(col("t")), "hello\n") shouldBe 5.0
    // fingerprint must not hash a phantom "" token: newline-terminated text
    // fingerprints identically to the clean text
    one[Long](fingerprint(col("t")), "a b c\n") shouldBe
      one[Long](fingerprint(col("t")), "a b c")
  }

  test("NULL text yields null quality score and null language id — not the " +
    "0.68 / \"zh\" artifacts of null-skipping least()/greatest()") {
    val df = Seq((1L, null.asInstanceOf[String]), (2L, "the cat is here and it is fine"))
      .toDF("id", "t")
    val rows = df.select(col("id"), qualityScore(col("t")).as("q"),
      langId(col("t")).as("l"), langIdHof(col("t")).as("lh")).collect()
      .map(r => r.getLong(0) -> r).toMap
    rows(1L).isNullAt(1) shouldBe true
    rows(1L).isNullAt(2) shouldBe true
    rows(1L).isNullAt(3) shouldBe true
    rows(2L).isNullAt(1) shouldBe false
    rows(2L).getString(2) shouldBe "en"
  }

  test("language id picks the profile with most function-word hits") {
    one[String](langId(col("t")), "the cat is on the mat and it is happy") shouldBe "en"
    one[String](langId(col("t")), "der hund ist nicht mit der katze") shouldBe "de"
    one[String](langId(col("t")), "le chat est pour la maison et les jardins") shouldBe "fr"
    one[String](langId(col("t")), "el perro es una mascota para la casa") shouldBe "es"
    one[String](langId(col("t")), "这 是 不 好 的 人") shouldBe "zh"
    // zero hits for every profile → unknown, NOT the lexicographically
    // largest language code (the struct tie-break labeled all numbers/code
    // documents "zh")
    one[String](langId(col("t")), "12345 67890 @@@") shouldBe "und"
    one[String](langIdHof(col("t")), "12345 67890 @@@") shouldBe "und"
  }

  test("fingerprint: equal for equal text, different for reordered tokens") {
    val df = Seq("alpha beta gamma", "alpha beta gamma", "gamma beta alpha").toDF("t")
      .select(fingerprint(col("t")).as("f"))
    val fps = df.as[Long].collect()
    fps(0) shouldBe fps(1)
    fps(0) should not be fps(2)
  }

  test("repetition fractions: golden values, monotone in repeats, degenerate docs are 0") {
    import org.apache.spark.sql.functions.col
    val df = Seq(
      (1L, "a b c d"),           // all distinct: word 0, bigram 0
      (2L, "a a a a"),           // words 4→1 distinct = 0.75; bigrams 3→1 = 0.6667
      (3L, "a b a b a"),         // words 5→2 = 0.6; bigrams 4→2 = 0.5
      (4L, "one"),               // single token: both 0
      (5L, ""))                  // blank: both 0
      .toDF("doc_id", "text")
      .select(col("doc_id"),
        TextFunctions.dupWordFraction(col("text")).as("w"),
        TextFunctions.dupNgramFraction(col("text"), 2).as("b"))
    val m = df.collect().map(r => (r.getLong(0), (r.getDouble(1), r.getDouble(2)))).toMap
    m(1L) shouldBe ((0.0, 0.0))
    m(2L) shouldBe ((0.75, 0.6667))
    m(3L) shouldBe ((0.6, 0.5))
    m(4L) shouldBe ((0.0, 0.0))
    m(5L) shouldBe ((0.0, 0.0))
  }

  test("word n-grams slide correctly and degrade on short docs") {
    one[Seq[String]](wordNgrams(col("t"), 2), "a b c") shouldBe Seq("a b", "b c")
    one[Seq[String]](wordNgrams(col("t"), 3), "a b") shouldBe Seq("a b")
  }

  test("native ShingleHashes matches wordNgrams semantics: count, degrade, case, distinct") {
    import graft.functions.expressions.ShingleHashes
    def sh(text: String, n: Int): collection.Seq[Long] =
      one[collection.Seq[Long]](ShingleHashes(col("t"), n), text)
    sh("a b c d", 2) should have length 3              // "a b","b c","c d"
    sh("a b a b a", 2).toSet should have size 2        // distinct {"a b","b a"}
    sh("a b", 3) should have length 1                  // short doc → one full shingle
    sh("   ", 3) should have length 1                  // blank → sentinel shingle
    sh("   ", 3) shouldBe sh("", 3)                    // all blanks are mutual dups
    sh("Hello World Now", 2) shouldBe sh("hello world now", 2) // lowercased
    sh("x y z", 2) should not be sh("z y x", 2)        // order-sensitive
    // identical distinct-shingle COUNT as the string-based HOF form on prose
    val prose = "the quick brown fox jumps over the lazy dog the quick brown fox"
    sh(prose, 3).length shouldBe
      one[Seq[String]](array_distinct(wordNgrams(col("t"), 3)), prose).length
  }

  test("quality score is in [0,1] and rewards fluent text over punctuation soup") {
    val fluent = one[Double](qualityScore(col("t")),
      "the quick brown fox jumps over the lazy dog and it is a fine day for running")
    val soup = one[Double](qualityScore(col("t")), "@@@!!! ### $$$ %%% ^^^ &&&")
    fluent should be > soup
    fluent should (be >= 0.0 and be <= 1.0)
    soup should (be >= 0.0 and be <= 1.0)
  }

  test("tfidf: golden smooth-idf values; corpus-wide terms score tf exactly") {
    import spark.implicits._
    val d = Seq((1L, "a A b"), (2L, "a c")).toDF("doc_id", "text")
    val rows = graft.functions.TextFunctions.tfidf(d, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    rows.size shouldBe 4
    // 'a' appears in both docs: idf = ln(3/3) + 1 = 1 → tfidf = tf
    rows((1L, "a")) shouldBe ((2L, 2L, 2.0))
    rows((2L, "a")) shouldBe ((1L, 2L, 1.0))
    // 'b' in one doc: ln(3/2) + 1 = 1.4055 at 4 decimals
    rows((1L, "b")) shouldBe ((1L, 1L, 1.4055))
    rows((2L, "c")) shouldBe ((1L, 1L, 1.4055))
  }

  test("bm25: golden value and document-length normalization") {
    import spark.implicits._
    val d = Seq((1L, "a a b"), (2L, "a c")).toDF("doc_id", "text")
    val rows = graft.functions.TextFunctions.bm25(d, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getDouble(5)).toMap
    // (1,'b'): idf = ln(1 + 1.5/1.5) = ln 2; norm = 2.2/(1 + 1.2(0.25 + 0.75·3/2.5))
    rows((1L, "b")) shouldBe 0.6407
    // same tf=1, df=1, but 'c' sits in the SHORTER doc → higher score than 'b'
    rows((2L, "c")) should be > rows((1L, "b"))
  }

  test("char-gram NLL: golden values; repetitive docs are more predictable") {
    import spark.implicits._
    // corpus trigram counts: aaa×3 (2 from doc1, 1 from doc2), aab×1 → total 4
    val d = Seq((1L, "aaaa"), (2L, "aaab"), (3L, "x")).toDF("doc_id", "text")
    val rows = graft.functions.TextFunctions.charGramNll(d, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    rows.keySet shouldBe Set(1L, 2L) // doc 3 is shorter than n → no row
    rows(1L) shouldBe ((2L, 0.2877))                 // -ln(3/4)
    rows(2L)._2 shouldBe ((0.2877 + 1.3863) / 2) +- 0.0001 // avg(-ln 3/4, -ln 1/4)
    // the self-repetitive doc is more predictable under the corpus model
    rows(1L)._2 should be < rows(2L)._2
  }

  test("token entropy: golden values, uniform = log2(n), degenerate = 0") {
    import spark.implicits._
    val d = Seq(
      (1L, "a b c d"),      // uniform over 4 → exactly 2 bits
      (2L, "a a a a"),      // single token → 0 bits
      (3L, "a a b"),        // H = log2(3) - (2·log2 2)/3 = 0.9183
      (4L, "   "),          // no tokens → no row
      (5L, null)).toDF("doc_id", "text")
    val rows = graft.functions.TextFunctions.tokenEntropy(d, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    rows(1L) shouldBe ((4L, 4L, 2.0))
    rows(2L) shouldBe ((4L, 1L, 0.0))
    rows(3L) shouldBe ((3L, 2L, 0.9183))
    rows.keySet shouldBe Set(1L, 2L, 3L)
  }
}
