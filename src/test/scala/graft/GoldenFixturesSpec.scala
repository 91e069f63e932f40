package graft

/** Golden-fixture freshness gate: every (doc_id, md5(text)) in the CURRENT
  * testdata must appear in each committed fixture. The fixtures key on the
  * text hash precisely so that testdata drift fails LOUDLY — this spec
  * turns that failure into a diagnosable `sbt test` red with a
  * regeneration hint (tools/gen_golden_*.py) instead of three bare
  * rowcount mismatches in the oracle report. */
class GoldenFixturesSpec extends SparkTestBase {
  private val fixtures = Seq(
    "q96_compression_ratio.parquet" -> "tools/gen_golden_q96.py",
    "q24_fingerprint.parquet"       -> "tools/gen_golden_q24.py")
  private val sfs = Seq("sf0.001", "sf0.01", "sf0.1")
    .filter(sf => new java.io.File(s"/root/testdata/$sf/documents.parquet").exists())

  test("fixture covers the q31 id range: q31_multimodal.parquet") {
    // q31's synthetic images derive from doc_id alone (not text), so the
    // fixture keys on doc_id: every doc_id < 100 in current testdata must
    // be covered — a regeneration that changes the id range fails loudly
    assume(sfs.nonEmpty, "/root/testdata not present on this machine")
    val fix = spark.read.parquet("src/test/resources/golden/q31_multimodal.parquet")
      .select("doc_id")
    sfs.foreach { sf =>
      val docs = spark.read.parquet(s"/root/testdata/$sf/documents.parquet")
        .where("doc_id < 100").select("doc_id")
      val missing = docs.join(fix, Seq("doc_id"), "left_anti").count()
      withClue(s"$sf: doc_id range drifted — regenerate with `python3 tools/gen_golden_q31.py`: ") {
        missing shouldBe 0L
      }
    }
  }

  fixtures.foreach { case (fixture, regen) =>
    test(s"fixture covers current testdata: $fixture") {
      assume(sfs.nonEmpty, "/root/testdata not present on this machine")
      sfs.foreach { sf =>
        val docs = spark.read.parquet(s"/root/testdata/$sf/documents.parquet")
          .selectExpr("doc_id", "md5(text) AS text_md5")
        val fix = spark.read
          .parquet(s"src/test/resources/golden/$fixture")
          .select("doc_id", "text_md5")
        val missing = docs.join(fix, Seq("doc_id", "text_md5"), "left_anti").count()
        withClue(s"$sf: testdata drifted since the fixture was built — regenerate with `python3 $regen`: ") {
          missing shouldBe 0L
        }
      }
    }
  }
}
