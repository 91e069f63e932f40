package graft.ann

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkTestBase

/**
 * Randomized invariants for the incremental embedding-dedup engines
 * ([[Ann.cosineNearDupsAgainst]] / [[Ann.semanticNearDupsAgainst]]) —
 * the two properties a blocked near-dup join must never lose, checked
 * against a pure-JVM exhaustive oracle on random corpora:
 *
 *  1. SOUNDNESS: every reported (id, ref_id, sim) hit really has exact
 *     cosine ≥ threshold (blocking may lower recall; it must never
 *     fabricate a pair or mis-verify one).
 *  2. STRUCTURAL TWIN RECALL: every increment row that is an IDENTICAL
 *     copy of some reference row is hit — identical vectors share every
 *     hyperplane bucket and every codebook cell, so blocking can never
 *     separate them (caps are kept above the corpus size here; the cap
 *     path has its own dedicated specs).
 *
 * The oracle is all-pairs cosine in plain Scala — independent of the
 * Spark expression pipeline AND of the planted-one-hot q176/q177 DuckDB
 * statements, the WeightedSamplePropSpec third-engine discipline.
 */
class IncrementalDedupPropSpec extends SparkTestBase {
  import spark.implicits._

  private def cosine(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
      nb += b(i).toDouble * b(i); i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / math.sqrt(na * nb)
  }

  // random unit-ish vectors in 6 dims plus planted identical twins: each
  // case is (reference rows, increment rows, twin pair ids)
  private val genCase = for {
    nRef <- Gen.choose(3, 25)
    nInc <- Gen.choose(1, 12)
    seed <- Gen.choose(0L, 100000L)
  } yield {
    val rnd = new scala.util.Random(seed)
    def vec() = Array.fill(6)((rnd.nextDouble() * 2 - 1).toFloat)
    val ref = (0L until nRef).map(i => (i, vec()))
    val fresh = (0L until nInc).map(i => (1000L + i, vec()))
    // every third increment slot is replaced by a twin of a reference row
    val inc = fresh.zipWithIndex.map { case ((id, v), k) =>
      if (k % 3 == 0) (id, ref((k / 3) % ref.size)._2.clone()) else (id, v)
    }
    val twins = inc.zipWithIndex.collect { case ((id, _), k) if k % 3 == 0 =>
      (id, ((k / 3) % ref.size).toLong) }
    (ref, inc, twins)
  }

  test("cosineNearDupsAgainst: sound vs exhaustive cosine; identical twins always hit") {
    val prop = Prop.forAll(genCase) { case (ref, inc, twins) =>
      val refDf = ref.toDF("ref_id", "vec")
      val incDf = inc.toDF("id", "vec")
      val hits = Ann.cosineNearDupsAgainst(incDf, refDf, "id", "vec",
        "ref_id", "vec", threshold = 0.9, bits = 5, tables = 6,
        maxBucketSize = 100000)
        .select("id", "ref_id").as[(Long, Long)].collect().toSet
      val refMap = ref.toMap
      val incMap = inc.toMap
      val sound = hits.forall { case (i, r) =>
        cosine(incMap(i), refMap(r)) >= 0.9 - 1e-9 }
      val twinRecall = twins.forall(hits.contains)
      sound && twinRecall
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }

  test("semanticNearDupsAgainst: sound vs exhaustive cosine; identical twins always hit") {
    val prop = Prop.forAll(genCase) { case (ref, inc, twins) =>
      val refDf = ref.toDF("ref_id", "vec")
      val incDf = inc.toDF("id", "vec")
      val hits = Ann.semanticNearDupsAgainst(incDf, refDf, "id", "vec",
        "ref_id", "vec", threshold = 0.9, nClusters = 4, kmeansIters = 1,
        maxClusterSize = 100000)
        .select("id", "ref_id").as[(Long, Long)].collect().toSet
      val refMap = ref.toMap
      val incMap = inc.toMap
      val sound = hits.forall { case (i, r) =>
        cosine(incMap(i), refMap(r)) >= 0.9 - 1e-9 }
      val twinRecall = twins.forall(hits.contains)
      sound && twinRecall
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(res.passed, res.status.toString)
  }
}
