package graft.functions

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.apache.spark.sql.catalyst.util.GenericArrayData

import graft.SparkTestBase
import graft.functions.expressions.{PqAdcAt, PqAdcNeg}

/**
 * Randomized drift-guard algebra for the ADC kernels
 * ([[graft.functions.expressions.PqAdcAt]] /
 * [[graft.functions.expressions.PqAdcNeg]]) — the newest codegen'd code
 * in the engine, whose store-drift throws were previously exercised only
 * by example. For ANY random (tables, m, k) LUT stack and ANY mismatched
 * code word, every mismatch class (probe index out of range, code-word
 * width drift, code value out of range) must throw the guided
 * IllegalArgumentException and NEVER return a value; well-formed inputs
 * must never throw and must agree with the naive reference sum; a null
 * code slot must yield SQL null, not an exception. Driver-side
 * arithmetic — no Spark job per case.
 */
class PqAdcDriftPropSpec extends SparkTestBase {

  /** Random LUT stack: `tables` query tables of m subspaces × k centroids
    * of finite partial distances. */
  private val genLuts = for {
    tables <- Gen.choose(1, 6)
    m <- Gen.choose(1, 8)
    k <- Gen.choose(1, 16)
    flat <- Gen.listOfN(tables * m * k, Gen.choose(-10.0, 10.0))
  } yield flat.toArray.grouped(k).toArray.grouped(m).toArray

  private def codesOf(xs: Seq[Any]): GenericArrayData =
    new GenericArrayData(xs.toArray)

  private def validCodes(m: Int, k: Int, seed: Long): Seq[Int] = {
    val r = new scala.util.Random(seed)
    Seq.fill(m)(r.nextInt(k))
  }

  test("well-formed inputs never throw and agree with the naive sum; a " +
    "null code slot yields null") {
    val prop = Prop.forAll(genLuts, Gen.choose(0L, Long.MaxValue)) { (luts, seed) =>
      val m = luts(0).length
      val k = luts(0)(0).length
      val cs = validCodes(m, k, seed)
      val arr = codesOf(cs)
      val expectAt = -cs.zipWithIndex.map { case (c, j) => luts(0)(j)(c) }.sum
      val at = PqAdcAt.compute(arr, 0, luts)
      val neg = PqAdcNeg.compute(arr, luts)
      val atOk = math.abs(at.doubleValue() - expectAt) < 1e-9
      val negOk = (0 until luts.length).forall { qi =>
        val want = -cs.zipWithIndex.map { case (c, j) => luts(qi)(j)(c) }.sum
        math.abs(neg.getDouble(qi) - want) < 1e-9
      }
      // poison one slot with null: SQL null out, never a throw
      val withNull = codesOf(cs.updated(seed.toInt.abs % m, null))
      val nullOk = PqAdcAt.compute(withNull, 0, luts) == null &&
        PqAdcNeg.compute(withNull, luts) == null
      atOk && negOk && nullOk
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, res.status.toString)
  }

  test("probe-index drift: ANY index outside the shipped tables throws the " +
    "guided error, never returns") {
    val genBadProbe = for {
      luts <- genLuts
      pi <- Gen.oneOf(Gen.choose(Int.MinValue, -1),
        Gen.choose(luts.length, Int.MaxValue)).flatMap(identity(_))
    } yield (luts, pi)
    val prop = Prop.forAll(genBadProbe, Gen.choose(0L, Long.MaxValue)) {
      case ((luts, pi), seed) =>
        val m = luts(0).length
        val k = luts(0)(0).length
        val arr = codesOf(validCodes(m, k, seed))
        val e = intercept[IllegalArgumentException](PqAdcAt.compute(arr, pi, luts))
        e.getMessage.contains("probe index") &&
          e.getMessage.contains("different query sets")
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, res.status.toString)
  }

  test("width drift: a code word whose length is not m throws the guided " +
    "re-encode error in BOTH kernels, never returns") {
    val genBadWidth = for {
      luts <- genLuts
      w <- Gen.choose(0, 12).suchThat(_ != luts(0).length)
    } yield (luts, w)
    val prop = Prop.forAll(genBadWidth, Gen.choose(0L, Long.MaxValue)) {
      case ((luts, w), seed) =>
        val k = luts(0)(0).length
        val arr = codesOf(validCodes(w max 0, k max 1, seed).take(w))
        val eAt = intercept[IllegalArgumentException](
          PqAdcAt.compute(arr, 0, luts))
        val eNeg = intercept[IllegalArgumentException](
          PqAdcNeg.compute(arr, luts))
        Seq(eAt, eNeg).forall { e =>
          e.getMessage.contains(s"expect m=${luts(0).length}") &&
            e.getMessage.contains("re-encode")
        }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, res.status.toString)
  }

  test("code-value drift: ANY code outside [0, k) throws the guided " +
    "re-encode error in BOTH kernels, never returns") {
    val genBadCode = for {
      luts <- genLuts
      slot <- Gen.choose(0, luts(0).length - 1)
      bad <- Gen.oneOf(Gen.choose(Int.MinValue, -1),
        Gen.choose(luts(0)(0).length, Int.MaxValue)).flatMap(identity(_))
    } yield (luts, slot, bad)
    val prop = Prop.forAll(genBadCode, Gen.choose(0L, Long.MaxValue)) {
      case ((luts, slot, bad), seed) =>
        val m = luts(0).length
        val k = luts(0)(0).length
        val arr = codesOf(validCodes(m, k, seed).updated(slot, bad))
        val eAt = intercept[IllegalArgumentException](
          PqAdcAt.compute(arr, 0, luts))
        val eNeg = intercept[IllegalArgumentException](
          PqAdcNeg.compute(arr, luts))
        Seq(eAt, eNeg).forall { e =>
          e.getMessage.contains(s"code $bad at subspace $slot") &&
            e.getMessage.contains("re-encode")
        }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, res.status.toString)
  }
}
