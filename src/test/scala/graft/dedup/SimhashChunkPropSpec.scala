package graft.dedup

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/**
 * Pure-math property pin for the adaptive SimHash pigeonhole blocking
 * ([[Dedup.simhashChunkBounds]]): for ANY maxHamming in [0, 15] the
 * maxHamming+1 chunks tile the 64 signature bits exactly, and ANY pair
 * of signatures within the hamming budget shares at least one intact
 * chunk — the recall guarantee the candidate generation rests on. (A
 * fixed 4-chunk layout silently broke this for hamming 4+.) No Spark
 * session needed: the bounds are driver-side plan constants.
 */
class SimhashChunkPropSpec extends AnyFunSuite with Matchers {

  private def chunkValues(sig: Long, bounds: Seq[(Int, Int)]): Seq[Long] =
    bounds.map { case (offset, width) =>
      val shifted = sig >>> offset
      if (width >= 64) shifted else shifted & ((1L << width) - 1L)
    }

  test("chunks tile the 64 bits disjointly for every maxHamming in [0, 15]") {
    for (mh <- 0 to 15) {
      val bounds = Dedup.simhashChunkBounds(mh)
      bounds should have length (mh + 1)
      bounds.map(_._2).sum shouldBe 64
      // consecutive, non-overlapping: each chunk starts where the last ended
      bounds.foldLeft(0) { case (expectedOffset, (offset, width)) =>
        offset shouldBe expectedOffset
        offset + width
      } shouldBe 64
      all(bounds.map(_._2)) should be >= 1
    }
  }

  test("any pair within the hamming budget shares >= 1 intact chunk " +
    "(pigeonhole recall guarantee), including adversarial spread flips") {
    val genCase = for {
      mh <- Gen.choose(0, 15)
      sig <- Gen.long
      nFlips <- Gen.choose(0, mh)
      flips <- Gen.pick(nFlips, 0 until 64)
    } yield (mh, sig, flips.toSeq)
    val prop = Prop.forAll(genCase) { case (mh, sig, flips) =>
      val other = flips.foldLeft(sig)((s, b) => s ^ (1L << b))
      val bounds = Dedup.simhashChunkBounds(mh)
      chunkValues(sig, bounds).zip(chunkValues(other, bounds))
        .exists { case (a, b) => a == b }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(500), prop)
    assert(res.passed, res.status.toString)
    // adversarial corner: exactly maxHamming flips, one per chunk boundary
    for (mh <- 1 to 15) {
      val bounds = Dedup.simhashChunkBounds(mh)
      // flip the FIRST bit of the first mh chunks: chunk mh stays intact
      val adversarial = bounds.take(mh).foldLeft(0L)((s, ow) => s ^ (1L << ow._1))
      chunkValues(0L, bounds).zip(chunkValues(adversarial, bounds))
        .count { case (a, b) => a == b } should be >= 1
    }
  }
}
