package graft.operators

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkTestBase

/**
 * Randomized algebra for the pure half of mix's temperature mode
 * ([[MixTransform.temperatureWeights]]): for ANY group-count profile,
 * alpha in the practical range, and budget, the derived per-group rates
 * must satisfy the mixture identities — no Spark job per case, the
 * derivation is driver-side arithmetic.
 */
class MixTemperaturePropSpec extends SparkTestBase {

  private val genCase = for {
    nGroups <- Gen.choose(1, 40)
    counts <- Gen.listOfN(nGroups, Gen.choose(1L, 2000000L))
    alpha <- Gen.choose(0.0, 2.0)
    budgetScale <- Gen.choose(0.1, 10.0)
  } yield (counts.zipWithIndex.map { case (n, i) => (s"g$i", n.toDouble) },
    alpha, budgetScale)

  test("derived weights hit the budget, stay non-negative and finite, and " +
    "order inversely to group size below alpha = 1") {
    val prop = Prop.forAll(genCase) { case (counts, alpha, budgetScale) =>
      val total = counts.map(_._2).sum
      val budget = total * budgetScale
      val w = MixTransform.temperatureWeights(counts, alpha, budget).toMap
      val n = counts.toMap
      // every group gets a finite non-negative rate
      val wellFormed = w.values.forall(v => v >= 0 && java.lang.Double.isFinite(v))
      // expected realized size Σ w_d·n_d equals the budget, up to the
      // documented 4-decimal weight rounding (± 5e-5 per group member)
      val realized = w.map { case (g, v) => v * n(g) }.sum
      val budgetHit = math.abs(realized - budget) <= total * 5e-5 + 1e-6
      // temperature < 1 damps dominance: a strictly larger group never
      // gets a strictly larger rate (ties allowed after rounding)
      val ordered = alpha >= 1 || counts.combinations(2).forall {
        case Seq((ga, na), (gb, nb)) =>
          if (na == nb) true
          else if (na > nb) w(ga) <= w(gb) + 1e-12
          else w(gb) <= w(ga) + 1e-12
      }
      wellFormed && budgetHit && ordered
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, res.status.toString)
  }

  test("alpha = 1 at the natural budget is the identity mixture; alpha = 0 " +
    "equalizes expected group sizes") {
    val prop = Prop.forAll(genCase) { case (counts, _, _) =>
      val total = counts.map(_._2).sum
      val natural = MixTransform.temperatureWeights(counts, 1.0, total)
      val identity = natural.forall { case (_, v) => v == 1.0 }
      val uniform = MixTransform.temperatureWeights(counts, 0.0, total).toMap
      val n = counts.toMap
      val sizes = uniform.map { case (g, v) => v * n(g) }
      // each expected size is budget/|groups| up to per-group rounding
      // (± n_d·5e-5 — counts are bounded so the tolerance stays tight)
      val equalized = uniform.forall { case (g, v) =>
        math.abs(v * n(g) - total / counts.size) <= n(g) * 5e-5 + 1e-6 }
      identity && equalized && sizes.forall(_ > 0)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, res.status.toString)
  }
}
