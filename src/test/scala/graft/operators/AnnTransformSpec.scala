package graft.operators

import graft.SparkTestBase
import graft.api.{ConfigException, RunContext}
import graft.config.TransformConfig

class AnnTransformSpec extends SparkTestBase {
  import spark.implicits._

  private val ctx = RunContext(spark, "t", "r")
  // three direction families (same construction as ClusterEmbeddingsSpec)
  private val vecs: Seq[(Long, Array[Float])] =
    (0 until 6).map(i => (i.toLong, Array(1f, 0.01f * i, 0f))) ++
    (10 until 16).map(i => (i.toLong, Array(0f, 1f, 0.01f * (i - 10)))) ++
    (20 until 26).map(i => (i.toLong, Array(0.01f * (i - 20), 0f, 1f)))
  private lazy val corpus = vecs.toDF("vec_id", "embedding")

  private def ann(opts: (String, String)*) =
    AnnTopKTransform(corpus, TransformConfig("a", "ann_topk",
      (Map("idColumn" -> "vec_id", "vecColumn" -> "embedding",
        "queriesView" -> "ann_q") ++ opts.toMap)), ctx)

  test("brute method through the transform equals the direct API; output " +
    "shape (query_id, vec_id, rank)") {
    corpus.where("vec_id IN (0, 10, 20)")
      .selectExpr("vec_id AS query_id", "embedding")
      .createOrReplaceTempView("ann_q")
    val out = ann("queryIdColumn" -> "query_id", "k" -> "3")
    out.columns.toSeq shouldBe Seq("query_id", "vec_id", "rank")
    val viaApi = graft.ann.Ann.bruteForceTopK(corpus,
      spark.table("ann_q"), "vec_id", "embedding", "query_id", 3)
      .as[(Long, Long, Int)].collect().sorted
    out.as[(Long, Long, Int)].collect().sorted shouldBe viaApi
    // rank 1 is always the query itself (it is in the corpus)
    out.where("rank = 1").as[(Long, Long, Int)].collect()
      .foreach { case (q, v, _) => v shouldBe q }
  }

  test("lsh and ivf methods route; ivf accepts a persisted codebookView " +
    "and matches in-process ivf") {
    corpus.where("vec_id IN (0, 10, 20)")
      .selectExpr("vec_id AS query_id", "embedding")
      .createOrReplaceTempView("ann_q")
    ann("method" -> "lsh", "queryIdColumn" -> "query_id", "k" -> "2",
      "bits" -> "6", "tables" -> "4").count() should be > 0L
    graft.ann.Ann.codebookFrame(corpus, "vec_id", "embedding",
      nLists = 3, kmeansIters = 2).createOrReplaceTempView("ann_cb")
    val viaStore = ann("method" -> "ivf", "queryIdColumn" -> "query_id",
      "k" -> "2", "nProbe" -> "1", "codebookView" -> "ann_cb",
      "nLists" -> "3", "kmeansIters" -> "2")
      .as[(Long, Long, Int)].collect().sorted
    val inProc = graft.ann.Ann.ivfTopK(corpus, spark.table("ann_q"),
      "vec_id", "embedding", "query_id", 2, nLists = 3, nProbe = 1,
      kmeansIters = 2).as[(Long, Long, Int)].collect().sorted
    viaStore shouldBe inProc
    viaStore should not be empty
  }

  test("misconfig fails fast: bad method, bad k, missing query columns, " +
    "stamp mismatch through the transform") {
    corpus.selectExpr("vec_id AS query_id", "embedding")
      .createOrReplaceTempView("ann_q")
    an[ConfigException] should be thrownBy
      ann("method" -> "nope", "queryIdColumn" -> "query_id")
    an[ConfigException] should be thrownBy
      ann("queryIdColumn" -> "query_id", "k" -> "0")
    an[ConfigException] should be thrownBy ann() // view lacks vec_id
    graft.ann.Ann.codebookFrame(corpus, "vec_id", "embedding",
      nLists = 3, kmeansIters = 2).createOrReplaceTempView("ann_cb2")
    val e = intercept[ConfigException] {
      ann("method" -> "ivf", "queryIdColumn" -> "query_id",
        "codebookView" -> "ann_cb2", "nLists" -> "5").collect()
    }
    e.getMessage should include("stamp")
    // non-numeric options get a guided error, not a bare NFE
    an[ConfigException] should be thrownBy
      ann("queryIdColumn" -> "query_id", "k" -> "ten")
    // codebookView without method: ivf is a misconfig, not silently ignored
    an[ConfigException] should be thrownBy
      ann("queryIdColumn" -> "query_id", "codebookView" -> "ann_cb2")
  }
}
