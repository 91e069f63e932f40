package graft.operators

import graft.SparkTestBase
import graft.api.{ConfigException, RunContext}
import graft.config.TransformConfig

class DriftSpec extends SparkTestBase {
  import spark.implicits._

  private def ctx = RunContext(spark, "t", "r")

  test("identical distributions score zero; a shift scores positive") {
    val ref = (1L to 1000L).map(i => (i, (i % 100).toDouble)).toDF("id", "v")
    val same = ref
    val zero = Drift.psi(same, ref, Seq("v")).collect().head
    zero.getDouble(1) shouldBe 0.0
    zero.getLong(2) shouldBe 1000L
    zero.getLong(3) shouldBe 1000L
    // shift the whole distribution up by half its range
    val shifted = ref.selectExpr("id", "v + 50.0 AS v")
    val d = Drift.psi(shifted, ref, Seq("v")).collect().head.getDouble(1)
    d should be > 0.25
  }

  test("NaN values are excluded like nulls — one NaN must not poison " +
    "max() and collapse every bin to 0 (drift would read 'stable')") {
    val ref = ((1L to 1000L).map(i => (i, (i % 100).toDouble)) :+
      (2000L, Double.NaN)).toDF("id", "v")
    val shifted = ref.where("id <= 1000").selectExpr("id", "v + 50.0 AS v")
    val row = Drift.psi(shifted, ref, Seq("v")).collect().head
    row.getLong(2) shouldBe 1000L       // NaN not counted in n_ref
    row.getDouble(1) should be > 0.25   // the shift is still detected
  }

  test("a constant reference column still detects drift away from the " +
    "constant (two-bin split, not one collapsed bin)") {
    val ref = (1L to 100L).map(i => (i, 200.0)).toDF("id", "v")
    val drifted = (1L to 100L).map(i => (i, 500.0)).toDF("id", "v")
    Drift.psi(drifted, ref, Seq("v")).collect().head.getDouble(1) should be > 1.0
    // identical constant current still scores zero
    Drift.psi(ref, ref, Seq("v")).collect().head.getDouble(1) shouldBe 0.0
  }

  test("matches a hand-computed two-bin PSI") {
    // ref: 8 low, 2 high → p = (0.8, 0.2); current: 5/5 → q = (0.5, 0.5)
    val ref = ((1 to 8).map(_ => 0.0) ++ (1 to 2).map(_ => 10.0))
      .zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val cur = ((1 to 5).map(_ => 0.0) ++ (1 to 5).map(_ => 10.0))
      .zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val got = Drift.psi(cur, ref, Seq("v"), bins = 2).collect().head.getDouble(1)
    val expected = (0.5 - 0.8) * math.log(0.5 / 0.8) + (0.5 - 0.2) * math.log(0.5 / 0.2)
    got shouldBe (math.rint(expected * 1e6) / 1e6) +- 1e-9
  }

  test("out-of-range current values clamp into edge bins; nulls excluded; " +
    "degenerate constant reference is safe") {
    val ref = (1 to 10).map(i => (i.toLong, i.toDouble)).toDF("id", "v")
    val cur = Seq((1L, -100.0), (2L, 100.0), (3L, 5.0), (4L, 5.0)).toDF("id", "v")
    noException should be thrownBy Drift.psi(cur, ref, Seq("v")).collect()
    val const = (1 to 5).map(i => (i.toLong, 7.0)).toDF("id", "v")
    val d = Drift.psi(const, const, Seq("v")).collect().head.getDouble(1)
    d shouldBe 0.0
    val withNulls = Seq((1L, Some(1.0)), (2L, None)).toDF("id", "v")
    Drift.psi(withNulls, ref, Seq("v")).collect().head.getLong(3) shouldBe 1L
  }

  test("an all-null side surfaces as a visible null-psi row, never vanishes") {
    val ref = (1 to 10).map(i => (i.toLong, i.toDouble)).toDF("id", "v")
    val allNull = Seq((1L, Option.empty[Double]), (2L, None)).toDF("id", "v")
    // current side empty of non-null values: the drift monitor's own
    // failure case — must be a loud row, not an absent one
    val row = Drift.psi(allNull, ref, Seq("v")).collect()
    row.length shouldBe 1
    row.head.isNullAt(1) shouldBe true          // psi undefined
    row.head.getLong(2) shouldBe 10L            // n_ref
    row.head.getLong(3) shouldBe 0L             // n_current
    // reference side all-null likewise — and n_current must report the
    // TRUE current-side count, not 0, even with no reference stats to bin
    // against
    val row2 = Drift.psi(ref, allNull, Seq("v")).collect()
    row2.length shouldBe 1
    row2.head.isNullAt(1) shouldBe true
    row2.head.getLong(2) shouldBe 0L            // n_ref
    row2.head.getLong(3) shouldBe 10L           // n_current: real count
  }

  test("column names with quotes/backticks/dots survive (no string-built SQL)") {
    val weird = Seq("it's", "a.b", "tick`col")
    val ref = (1 to 20).map(i =>
      (i.toLong, i.toDouble, (i % 5).toDouble, (i % 3).toDouble))
      .toDF(Seq("id") ++ weird: _*)
    val rows = Drift.psi(ref, ref, weird).collect()
    rows.map(_.getString(0)).sorted shouldBe weird.sorted
    all(rows.map(_.getDouble(1))) shouldBe 0.0
  }

  test("multiple columns in one pass; transform registered; errors fail fast") {
    val ref = (1 to 100).map(i => (i.toLong, i.toDouble, (i % 10).toLong))
      .toDF("id", "a", "b")
    ref.createOrReplaceTempView("drift_ref")
    val out = DriftTransform(ref, TransformConfig("t", "drift",
      Map("columns" -> "a, b", "referenceView" -> "drift_ref")), ctx)
    out.columns.toSeq shouldBe Seq("column", "psi", "n_ref", "n_current")
    out.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap shouldBe
      Map("a" -> 0.0, "b" -> 0.0)
    an[ConfigException] should be thrownBy DriftTransform(ref,
      TransformConfig("t", "drift",
        Map("columns" -> "a", "referenceView" -> "drift_ref", "bins" -> "1")), ctx)
    DriftTransform.validate(TransformConfig("t", "drift",
      Map("columns" -> "nope", "referenceView" -> "drift_ref")),
      ref.schema) should not be empty
    // runtime resolution is case-INSENSITIVE like validate and Spark —
    // a config that passes validation must not fail at apply
    DriftTransform(ref, TransformConfig("t", "drift",
      Map("columns" -> "A, B", "referenceView" -> "drift_ref")), ctx)
      .count() shouldBe 2
  }
}
