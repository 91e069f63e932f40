package graft.operators

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkTestBase
import graft.api.RunContext
import graft.config.TransformConfig

/**
 * Randomized third-engine oracle for the weighted sample: the expected
 * winner set is recomputed in PURE JVM code (java.security MD5, BigInt
 * hex parse, the same (v+0.5)/2^52 uniform and -ln(u)/w race) and must
 * equal Spark's selection exactly — independently of both the Spark
 * expression pipeline and q130's DuckDB restatement. Catches any drift
 * in the engine-portable hash recipe from a third direction.
 */
class WeightedSamplePropSpec extends SparkTestBase {
  import spark.implicits._

  private def ctx = RunContext(spark, "t", "r")
  private def t(tp: String, opts: (String, String)*) =
    TransformConfig("x", tp, opts.toMap)

  private def raceKey(seed: Long, id: Long, w: Double): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"$seed:$id".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val v = BigInt(hex.substring(0, 13), 16).toDouble
    val u = (v + 0.5) / 4503599627370496.0 // 2^52
    -math.log(u) / w
  }

  test("random corpora: Spark's winner set equals the pure-JVM race exactly") {
    val genCase = for {
      rows <- Gen.choose(5, 120)
      weights <- Gen.listOfN(rows, Gen.oneOf(
        Gen.choose(0.01, 100.0), Gen.const(0.0), Gen.const(-1.0)))
      k <- Gen.choose(1, 40)
      seed <- Gen.choose(0L, 1000L)
    } yield (weights.zipWithIndex.map { case (w, i) => (i.toLong, w) }, k, seed)
    val prop = Prop.forAll(genCase) { case (data, k, seed) =>
      val d = data.toDF("doc_id", "w")
      val got = SampleTransform(d, t("sample", "on" -> "doc_id",
        "weightColumn" -> "w", "k" -> k.toString, "seed" -> seed.toString), ctx)
        .select("doc_id").as[Long].collect().toSet
      val expected = data.filter(_._2 > 0)
        .map { case (id, w) => (raceKey(seed, id, w), id) }
        .sorted.take(k).map(_._2).toSet
      got == expected
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(12), prop)
    assert(res.passed, res.status.toString)
  }
}
