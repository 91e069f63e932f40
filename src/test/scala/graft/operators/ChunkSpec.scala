package graft.operators

import graft.SparkTestBase
import graft.api.{ConfigException, RunContext}
import graft.config.TransformConfig

class ChunkSpec extends SparkTestBase {
  import spark.implicits._

  private def ctx = RunContext(spark, "t", "r")
  private def chunk(df: org.apache.spark.sql.DataFrame, opts: (String, String)*) =
    ChunkTransform(df, TransformConfig("c", "chunk",
      (Seq("idColumn" -> "id", "textColumn" -> "t") ++ opts).toMap), ctx)

  test("chunk grid: stride = size - overlap, last chunk reaches the end") {
    val df = Seq((1L, "abcdefghij")).toDF("id", "t") // 10 chars
    val out = chunk(df, "size" -> "4", "overlap" -> "1") // stride 3
      .orderBy("chunk_id").collect()
    out.map(_.getString(2)).toSeq shouldBe Seq("abcd", "defg", "ghij")
    out.map(_.getLong(1)).toSeq shouldBe Seq(0L, 1L, 2L)
    out.map(_.getInt(3)).toSeq shouldBe Seq(4, 4, 4)
  }

  test("short, exact-fit, empty and null texts") {
    val df = Seq((1L, "ab"), (2L, "abcd"), (3L, ""), (4L, null))
      .toDF("id", "t")
    val out = chunk(df, "size" -> "4").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getString(2)).toSeq).toMap
    out(1L) shouldBe Seq("ab")   // shorter than size → one chunk
    out(2L) shouldBe Seq("abcd") // exact fit → one chunk, not two
    out(3L) shouldBe Seq("")     // empty → one empty chunk
    out.contains(4L) shouldBe false // null → no chunks
  }

  test("every character is covered and consecutive chunks overlap correctly") {
    val text = scala.util.Random.alphanumeric.take(137).mkString
    val df = Seq((1L, text)).toDF("id", "t")
    val rows = chunk(df, "size" -> "50", "overlap" -> "10")
      .orderBy("chunk_id").collect()
    val rebuilt = rows.map(_.getString(2)).reduce((a, b) => a + b.drop(10))
    rebuilt shouldBe text
    // every chunk except possibly the last is full-size
    rows.dropRight(1).foreach(_.getInt(3) shouldBe 50)
    rows.last.getString(2) shouldBe text.takeRight(rows.last.getInt(3))
  }

  test("keep columns pass through; zero-shuffle plan") {
    val df = Seq((1L, "hello world", "en")).toDF("id", "t", "lang")
    val out = chunk(df, "size" -> "6", "keep" -> "lang")
    out.columns.toSeq shouldBe Seq("id", "lang", "chunk_id", "chunk_text", "chunk_len")
    out.collect().foreach(_.getString(1) shouldBe "en")
    out.queryExecution.executedPlan.toString should not include "Exchange"
  }

  test("invalid size/overlap fail fast") {
    val df = Seq((1L, "x")).toDF("id", "t")
    intercept[ConfigException] { chunk(df, "size" -> "0") }
    intercept[ConfigException] { chunk(df, "size" -> "5", "overlap" -> "5") }
    intercept[ConfigException] { chunk(df, "size" -> "5", "overlap" -> "-1") }
    // re-chunking chunked data: kept output-name columns collide loudly
    val chunked = Seq((1L, "x", 0L)).toDF("id", "t", "chunk_id")
    intercept[ConfigException] { chunk(chunked, "size" -> "5", "keep" -> "chunk_id") }
  }

  /** A tokenizer store over a tiny corpus, registered for unit=tokens. */
  private def tokenStore(name: String): String = {
    graft.text.Bpe.mergesFrame(
      Seq("low low low low low lower lower newest newest newest " +
        "newest newest newest widest widest widest").toDF("text"),
      "text", numMerges = 6).createOrReplaceTempView(name)
    name
  }

  test("unit=tokens: windows over the BPE id stream — same grid " +
    "arithmetic, token-boundary cuts, ids + detokenized text emitted") {
    val view = tokenStore("v_chunk_bpe")
    // "low lowest newest low" → ids per golden: low,</w> | low,est</w> |
    // n,ew,est</w> | low,</w> = 9 tokens
    val df = Seq((1L, "low lowest newest low")).toDF("id", "t")
    val out = chunk(df, "unit" -> "tokens", "mergesView" -> view,
      "size" -> "4", "overlap" -> "1") // stride 3 → ceil((9-4)/3)+1 = 3
      .orderBy("chunk_id")
      .select("chunk_id", "chunk_ids", "chunk_text", "chunk_len")
      .as[(Long, Seq[Int], String, Int)].collect()
    out.map(_._1).toSeq shouldBe Seq(0L, 1L, 2L)
    // the windows tile the 9-token stream with 1-token overlap
    val stream = out.head._2 ++ out.tail.flatMap(_._2.drop(1))
    stream.size shouldBe 9
    out.dropRight(1).foreach(_._4 shouldBe 4)
    out.last._4 shouldBe 3 // 9 - 2*3
    // detok of each window: [low </w> low est</w>] [est</w> n ew est</w>]
    // [est</w> low </w>] — subword pieces rejoin without a space
    out.map(_._3).toSeq shouldBe Seq("low lowest", "est newest", "est low")
    // short/empty/null follow the char-mode contract
    val edge = chunk(Seq((1L, "low"), (2L, ""), (3L, null))
        .toDF("id", "t"),
      "unit" -> "tokens", "mergesView" -> view, "size" -> "4")
      .select("id", "chunk_len").as[(Long, Int)].collect().toMap
    edge(1L) shouldBe 2  // low </w> → one short chunk
    edge(2L) shouldBe 0  // empty → one empty chunk
    edge.contains(3L) shouldBe false // null → no chunks
    // zero-shuffle plan in token mode too
    chunk(df, "unit" -> "tokens", "mergesView" -> view, "size" -> "4")
      .queryExecution.executedPlan.toString should not include "Exchange"
    // guided contradictions
    intercept[ConfigException] {
      chunk(df, "unit" -> "tokens", "size" -> "4")
    }.getMessage should include ("mergesView")
    intercept[ConfigException] {
      chunk(df, "mergesView" -> view, "size" -> "4")
    }.getMessage should include ("unit")
    intercept[ConfigException] {
      chunk(df, "unit" -> "lines", "size" -> "4")
    }.getMessage should include ("chars|tokens")
  }
}
