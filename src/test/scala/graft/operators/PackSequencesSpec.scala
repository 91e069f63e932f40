package graft.operators

import graft.SparkTestBase
import graft.api.ConfigException
import graft.config.TransformConfig

class PackSequencesSpec extends SparkTestBase {
  import spark.implicits._

  private def ctx = graft.api.RunContext(spark, "t", "r")

  // ids 1..12 with mixed weights, including one doc (w=25) that spans
  // multiple length-10 sequences and zero-weight docs that must vanish
  private def corpus = Seq(
    (1L, 4L), (2L, 3L), (3L, 25L), (4L, 0L), (5L, 7L), (6L, 1L),
    (7L, 10L), (8L, 2L), (9L, 0L), (10L, 5L), (11L, 6L), (12L, 3L)
  ).toDF("doc_id", "w")

  /** SQL-window restatement of the packing semantics. */
  private def expected(seqLen: Long): Set[(Long, Long, Long, Long, Long)] = {
    corpus.createOrReplaceTempView("c")
    spark.sql(
      s"""SELECT doc_id, seq_id,
            greatest(0L, seq_id * $seqLen - cb) AS tok_start,
            least(w, (seq_id + 1) * $seqLen - cb) AS tok_end,
            greatest(0L, cb - seq_id * $seqLen) AS pos_in_seq
          FROM (
            SELECT doc_id, w, cb,
                   explode(sequence(cb div $seqLen, (cb + w - 1) div $seqLen)) AS seq_id
            FROM (
              SELECT doc_id, w,
                     coalesce(sum(w) OVER (ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0L) AS cb
              FROM c) WHERE w > 0)""")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
  }

  private def packed(seqLen: Long, parts: Int) =
    PackSequences.pack(corpus, "doc_id", "w", seqLen, numPartitions = parts)
      .select("doc_id", "seq_id", "tok_start", "tok_end", "pos_in_seq")
      .as[(Long, Long, Long, Long, Long)].collect().toSet

  test("matches the SQL window; long docs span sequences; w=0 docs vanish") {
    val got = packed(10L, 3)
    got shouldBe expected(10L)
    // the 25-weight doc crosses at least two sequence boundaries
    got.count(_._1 == 3L) should be >= 3
    got.exists(_._1 == 4L) shouldBe false
    got.exists(_._1 == 9L) shouldBe false
  }

  test("every sequence except the last carries exactly seqLen weight") {
    val spans = packed(10L, 2).toSeq
    val bySeq = spans.groupBy(_._2).view
      .mapValues(_.map(s => s._4 - s._3).sum).toMap
    val last = bySeq.keys.max
    bySeq.filter(_._1 != last).values.toSet shouldBe Set(10L)
    bySeq(last) should be <= 10L
    // spans within a doc never overlap and cover the doc exactly
    val perDoc = spans.groupBy(_._1).view.mapValues(_.sortBy(_._3)).toMap
    val w = corpus.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    perDoc.foreach { case (doc, ss) =>
      ss.head._3 shouldBe 0L
      ss.last._4 shouldBe w(doc)
      ss.sliding(2).foreach {
        case Seq(a, b) => b._3 shouldBe a._4
        case _ => ()
      }
    }
  }

  test("partition-invariant") {
    packed(10L, 1) shouldBe packed(10L, 7)
    packed(7L, 2) shouldBe expected(7L)
  }

  test("materialize reassembles the corpus exactly, in order") {
    val texts = Seq(
      (1L, "abcd"), (2L, "efg"), (3L, "hijklmnopqrstuvwxyz0123456"), (4L, ""),
      (5L, "ABCDEFG"), (6L, "!"), (7L, "1234567890"), (8L, "~~")
    ).toDF("doc_id", "text")
      .withColumn("w", org.apache.spark.sql.functions.length($"text").cast("long"))
    val seqs = PackSequences.materialize(texts, "doc_id", "text", "w", 10L, 3)
      .orderBy("seq_id").collect()
    // concatenating the sequences in order reproduces the corpus in id order
    val whole = seqs.map(_.getString(1)).mkString
    whole shouldBe "abcd" + "efg" + "hijklmnopqrstuvwxyz0123456" + "" +
      "ABCDEFG" + "!" + "1234567890" + "~~"
    // every sequence except the last is exactly 10 chars
    seqs.dropRight(1).foreach { r =>
      r.getString(1).length shouldBe 10
      r.getLong(3) shouldBe 10L   // seq_weight
    }
    seqs.last.getString(1).length should be <= 10
  }

  test("grouped packing restarts seq_id per stratum; matches the SQL window") {
    val strata = (1L to 60L).map(i => (i, s"s${i % 4}", (i % 9) + 1))
      .toDF("doc_id", "src", "w")
    strata.createOrReplaceTempView("g")
    val expected = spark.sql(
      """SELECT doc_id, src, seq_id,
           greatest(0L, seq_id * 10 - cb) AS tok_start,
           least(w, (seq_id + 1) * 10 - cb) AS tok_end,
           greatest(0L, cb - seq_id * 10) AS pos_in_seq
         FROM (
           SELECT doc_id, src, w, cb,
                  explode(sequence(cb div 10, (cb + w - 1) div 10)) AS seq_id
           FROM (
             SELECT doc_id, src, w,
                    coalesce(sum(w) OVER (PARTITION BY src ORDER BY doc_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0L) AS cb
             FROM g) WHERE w > 0)""")
      .as[(Long, String, Long, Long, Long, Long)].collect().toSet
    val got = PackSequences.packGrouped(strata, "doc_id", "w", Seq("src"), 10L, 5)
      .select("doc_id", "src", "seq_id", "tok_start", "tok_end", "pos_in_seq")
      .as[(Long, String, Long, Long, Long, Long)].collect().toSet
    got shouldBe expected
    // every stratum has its own seq 0, and no sequence mixes strata
    got.filter(_._3 == 0L).map(_._2) shouldBe Set("s0", "s1", "s2", "s3")
    // grouped materialize: concatenation within each stratum is id-ordered
    val texts = strata.withColumn("text",
      org.apache.spark.sql.functions.expr("repeat(substring(src, 2, 1), cast(w as int))"))
    val seqs = PackSequences.materialize(texts, "doc_id", "text", "w", 10L,
      numPartitions = 3, groupCols = Seq("src"))
    seqs.columns should contain allOf ("src", "seq_id", "seq_text")
    // a stratum's sequences contain only its own digit
    seqs.collect().foreach { r =>
      val digit = r.getString(0).substring(1)
      r.getString(2).toSet shouldBe Set(digit.head)
    }
  }

  test("declarative transform registered; config errors fail fast") {
    val out = PackSequencesTransform(corpus, TransformConfig("t", "pack_sequences",
      Map("idColumn" -> "doc_id", "weightColumn" -> "w", "seqLen" -> "10")), ctx)
    out.columns should contain allOf ("seq_id", "tok_start", "tok_end", "pos_in_seq")
    graft.runtime.Registries.transforms().get("pack_sequences") shouldBe PackSequencesTransform
    an[ConfigException] should be thrownBy PackSequencesTransform(corpus,
      TransformConfig("t", "pack_sequences",
        Map("idColumn" -> "doc_id", "weightColumn" -> "w", "seqLen" -> "0")), ctx)
    val dbl = corpus.selectExpr("doc_id", "cast(w as double) as w")
    an[Exception] should be thrownBy PackSequencesTransform(dbl,
      TransformConfig("t", "pack_sequences",
        Map("idColumn" -> "doc_id", "weightColumn" -> "w", "seqLen" -> "10")), ctx)
  }
}
