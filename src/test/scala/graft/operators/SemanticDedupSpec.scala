package graft.operators

import graft.SparkTestBase
import graft.api.RunContext
import graft.config.TransformConfig

class SemanticDedupSpec extends SparkTestBase {
  import spark.implicits._

  private def ctx = RunContext(spark, "t", "r")
  private def run(df: org.apache.spark.sql.DataFrame, opts: (String, String)*) =
    SemanticDedupTransform(df,
      TransformConfig("sd", "dedup_semantic", opts.toMap), ctx)

  private def vec(xs: Double*): Array[Float] = {
    val n = math.sqrt(xs.map(x => x * x).sum)
    xs.map(x => (x / n).toFloat).toArray
  }
  // two well-separated families (e1-ish and e2-ish, cross-family cos ≈ 0);
  // within a family, distinct members sit at cos ≈ 0.894 (< 0.95)
  private def corpus = Seq(
    1L -> vec(1, 0, 0, 0), 2L -> vec(1, 0, 0.5, 0), 3L -> vec(1, 0, -0.5, 0),
    11L -> vec(0, 1, 0, 0), 12L -> vec(0, 1, 0, 0.5), 13L -> vec(0, 1, 0, -0.5),
    // planted EXACT duplicates of 1 and 11 — identical vectors get identical
    // cluster assignments under ANY codebook, so these pairs must always
    // be found regardless of how k-means happened to split the space
    1001L -> vec(1, 0, 0, 0), 1011L -> vec(0, 1, 0, 0)
  ).toDF("vec_id", "embedding")

  test("planted exact duplicates are dropped; non-dup family members survive") {
    val out = run(corpus, "idColumn" -> "vec_id", "vecColumn" -> "embedding",
      "threshold" -> "0.95", "nClusters" -> "2", "kmeansIters" -> "2")
      .select("vec_id").as[Long].collect().sorted
    out shouldBe Array(1L, 2L, 3L, 11L, 12L, 13L)
  }

  test("codebookView: dedup against a persisted codebook matches in-process " +
    "training with the same parameters; stamp mismatch fails fast") {
    graft.ann.Ann.codebookFrame(corpus, "vec_id", "embedding",
      nLists = 2, kmeansIters = 2).createOrReplaceTempView("sd_cb")
    val viaStore = run(corpus, "idColumn" -> "vec_id", "vecColumn" -> "embedding",
      "threshold" -> "0.95", "nClusters" -> "2", "kmeansIters" -> "2",
      "codebookView" -> "sd_cb").select("vec_id").as[Long].collect().sorted
    viaStore shouldBe Array(1L, 2L, 3L, 11L, 12L, 13L)
    val e = intercept[graft.api.ConfigException] {
      run(corpus, "idColumn" -> "vec_id", "vecColumn" -> "embedding",
        "threshold" -> "0.95", "nClusters" -> "4",
        "codebookView" -> "sd_cb").collect()
    }
    e.getMessage should include("stamp")
  }

  test("nClusters=1 degenerates to exact in-cell matching: paraphrase pair caught") {
    // cos(1, 21) = 1/sqrt(1.01) ≈ 0.995 — a "same content, different
    // wording" neighbor; one cell makes the pairing deterministic
    val d = (corpus.as[(Long, Array[Float])].collect().toSeq :+
      (21L -> vec(1, 0, 0.1, 0))).toDF("vec_id", "embedding")
    val pairs = graft.ann.Ann.semanticNearDups(d, "vec_id", "embedding",
      threshold = 0.95, nClusters = 1, kmeansIters = 0)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    pairs should contain(1L -> 21L)
    pairs should contain(1L -> 1001L)
    pairs should not contain (1L -> 2L)   // 0.894 below threshold
    pairs should not contain (1L -> 11L)  // cross-family, cos ≈ 0
  }

  test("mega-cluster cap: maxClusterSize=1 suppresses all pairing") {
    val out = run(corpus, "idColumn" -> "vec_id", "vecColumn" -> "embedding",
      "threshold" -> "0.95", "nClusters" -> "2", "maxClusterSize" -> "1")
    out.count() shouldBe 8 // nothing dropped — no cell may go quadratic
  }

  test("referenceView: incremental semantic dedup drops rows duplicate to the " +
    "reference, keeps the rest; survivor options rejected; codebookView composes") {
    corpus.createOrReplaceTempView("sd_ref")
    // 2001 duplicates reference row 1 exactly (must drop — identical
    // vectors share a cell under any codebook); 2002 is orthogonal to
    // every reference vector (must survive)
    val inc = Seq(
      2001L -> vec(1, 0, 0, 0), 2002L -> vec(0, 0, 0, 1)
    ).toDF("vec_id", "embedding")
    val out = run(inc, "idColumn" -> "vec_id", "vecColumn" -> "embedding",
      "threshold" -> "0.95", "nClusters" -> "2", "kmeansIters" -> "2",
      "referenceView" -> "sd_ref").select("vec_id").as[Long].collect()
    out shouldBe Array(2002L)
    // the persisted-codebook production shape: same outcome, cells from
    // the store (sampling scan gone), stamps asserted
    graft.ann.Ann.codebookFrame(corpus, "vec_id", "embedding",
      nLists = 2, kmeansIters = 2).createOrReplaceTempView("sd_ref_cb")
    run(inc, "idColumn" -> "vec_id", "vecColumn" -> "embedding",
      "threshold" -> "0.95", "nClusters" -> "2", "kmeansIters" -> "2",
      "referenceView" -> "sd_ref", "codebookView" -> "sd_ref_cb")
      .select("vec_id").as[Long].collect() shouldBe Array(2002L)
    val e = intercept[graft.api.ConfigException] {
      run(inc, "idColumn" -> "vec_id", "vecColumn" -> "embedding",
        "referenceView" -> "sd_ref", "survivor" -> "cluster").collect()
    }
    e.getMessage should include("referenceView")
  }

  test("referenceView on dedup_embedding: hyperplane route drops twins, keeps " +
    "orthogonals, honors reference column aliases") {
    corpus.select($"vec_id".as("rid"), $"embedding".as("rvec"))
      .createOrReplaceTempView("ed_ref")
    val inc = Seq(
      3001L -> vec(0, 1, 0, 0), 3002L -> vec(0, 0, 0, 1)
    ).toDF("vec_id", "embedding")
    val out = EmbeddingDedupTransform(inc,
      TransformConfig("ed", "dedup_embedding", Map(
        "idColumn" -> "vec_id", "vecColumn" -> "embedding",
        "threshold" -> "0.95", "bits" -> "6", "tables" -> "6",
        "referenceView" -> "ed_ref", "referenceIdColumn" -> "rid",
        "referenceVecColumn" -> "rvec")), ctx)
      .select("vec_id").as[Long].collect()
    out shouldBe Array(3002L)
    val e = intercept[graft.api.ConfigException] {
      EmbeddingDedupTransform(inc,
        TransformConfig("ed", "dedup_embedding", Map(
          "idColumn" -> "vec_id", "vecColumn" -> "embedding",
          "referenceView" -> "ed_ref", "survivorColumn" -> "vec_id")), ctx)
        .collect()
    }
    e.getMessage should include("referenceView")
  }

  test("survivor=cluster routes through transitive components") {
    // chain: 1 ≈ 1001 (exact) and 1 ≈ 21 (0.995), 21-vs-1001 also 0.995 —
    // component {1, 21, 1001} keeps only min id 1
    val d = (corpus.as[(Long, Array[Float])].collect().toSeq :+
      (21L -> vec(1, 0, 0.1, 0))).toDF("vec_id", "embedding")
    val out = run(d, "idColumn" -> "vec_id", "vecColumn" -> "embedding",
      "threshold" -> "0.95", "nClusters" -> "1", "survivor" -> "cluster")
      .select("vec_id").as[Long].collect().sorted
    // {1, 21, 1001} → keep 1; {11, 1011} → keep 11
    out shouldBe Array(1L, 2L, 3L, 11L, 12L, 13L)
  }
}
