package graft.runtime

import graft.SparkTestBase
import graft.config._

/** End-to-end pipelines through the executor: YAML → execute → file sink,
  * mirroring the reference's integration scenarios (QuickstartScenario1Spec
  * shape) on the driver-provided testdata. */
class PipelineExecutorSpec extends SparkTestBase {
  import spark.implicits._
  private val executor = new PipelineExecutor()
  private val sf = "/root/testdata/sf0.001"

  test("a transform chain that REPLACES the source frame completes instead " +
    "of deadlocking on the orphaned input observation, and loaded falls " +
    "back to the write count") {
    // bpe_vocab with mergesView drops the observed source frame entirely:
    // its metrics never arrive, so a blocking Observation.get would hang
    // the pipeline forever AFTER its write succeeded (caught live by
    // quickstart-24's first draft)
    val storeDir = tmpDir("exec-orphan-store")
    graft.text.Bpe.mergesFrame(
        Seq("low low low low", "lowest lowest").toDF("text"), "text",
        numMerges = 3, maxWords = 100)
      .write.mode("overwrite").parquet(storeDir)
    spark.read.parquet(storeDir).createOrReplaceTempView("v_exec_orphan")
    val out = tmpDir("exec-orphan-out")
    val yaml =
      s"""pipelineId: it-orphaned-observation
         |source:
         |  type: file
         |  options: {path: $sf/region.parquet, format: parquet}
         |transformations:
         |  - name: vocab
         |    type: bpe_vocab
         |    options: {mergesView: v_exec_orphan}
         |sink:
         |  type: file
         |  writeMode: overwrite
         |  options: {path: $out}
         |""".stripMargin
    val t0 = System.nanoTime()
    val m = executor.execute(new YamlConfigParser().parse(yaml))
    withClue(m.error.getOrElse("")) { m.status shouldBe "SUCCESS" }
    // bounded wait, not a hang: well under the old infinite block (the
    // poll gives up after ~2 s)
    (System.nanoTime() - t0) / 1e9 should be < 30.0
    m.recordsExtracted shouldBe -1L // honestly unobserved, never a guess
    val vocabRows = spark.read.parquet(out).count()
    vocabRows should be > 0L
    m.recordsLoaded shouldBe vocabRows // the write-count fallback
  }

  test("observation deadline knob: a listener slower than the window reports " +
    "-1 (the old fixed-2s failure mode), the configurable deadline saves it, " +
    "and a malformed knob fails BEFORE the write") {
    val in = tmpDir("obs-in");
    Seq((1, "a"), (2, "b"), (3, "c")).toDF("v", "s")
      .write.mode("overwrite").parquet(in)
    def cfg(out: String) = PipelineConfig(
      pipelineId = "obs-knob",
      source = SourceConfig("file", Map("path" -> in)),
      sink = SinkConfig("file", Map("path" -> out), WriteMode.Overwrite))
    // deadline 0 ms stands in for ANY listener lag beyond the window —
    // exactly what a fixed 2 s poll did to a lagging driver: the pipeline
    // SUCCEEDS (metrics must never fail a committed write) but extracted
    // degrades to the honest -1 sentinel
    spark.conf.set("spark.graft.observationTimeoutMs", "0")
    try {
      val starved = executor.execute(cfg(tmpDir("obs-out-starved")))
      starved.status shouldBe "SUCCESS"
      starved.recordsExtracted shouldBe -1L
      starved.recordsLoaded shouldBe 3L // write-count fallback, not -1
    } finally spark.conf.unset("spark.graft.observationTimeoutMs")
    // the default window is enough for a local listener: true count
    val healthy = executor.execute(cfg(tmpDir("obs-out-healthy")))
    healthy.status shouldBe "SUCCESS"
    healthy.recordsExtracted shouldBe 3L
    // a malformed knob fails while the run is still side-effect-free —
    // failing after sink.write() would report FAILURE for a committed
    // write and an orchestrated retry would then double-write appends
    val neverWritten = tmpDir("obs-out-never") + "-sub"
    spark.conf.set("spark.graft.observationTimeoutMs", "soon")
    try {
      val bad = executor.execute(cfg(neverWritten))
      bad.status shouldBe "FAILED"
      bad.error.getOrElse("") should include ("observationTimeoutMs")
      new java.io.File(neverWritten).exists() shouldBe false
    } finally spark.conf.unset("spark.graft.observationTimeoutMs")
  }

  test("scenario-1 shape: parquet → filter → aggregation → parquet, metrics from one action") {
    val out = tmpDir("exec-out")
    val yaml =
      s"""pipelineId: it-scenario1
         |source:
         |  type: file
         |  options: {path: $sf/lineitem.parquet, format: parquet}
         |transformations:
         |  - name: keep-big
         |    type: filter
         |    options: {condition: "l_quantity > 10"}
         |  - name: agg
         |    type: aggregation
         |    options:
         |      groupBy: l_returnflag
         |      aggregations: "total_qty:sum(l_quantity),n:count(*)"
         |sink:
         |  type: file
         |  writeMode: overwrite
         |  options: {path: $out, lineage: "true"}
         |""".stripMargin
    val cfg = new YamlConfigParser().parse(yaml)
    val m = executor.execute(cfg)
    withClue(m.error.getOrElse("")) { m.status shouldBe "SUCCESS" }
    m.recordsExtracted should be > 1000L
    m.recordsLoaded shouldBe 3L
    val back = spark.read.parquet(out)
    back.count() shouldBe 3
    back.columns should contain("_lineage")
    val lineage = back.select("_lineage").as[String].head()
    lineage should include("\"pipelineId\":\"it-scenario1\"")
    lineage should include("filter(l_quantity > 10)")
    lineage should include("aggregation(groupBy=l_returnflag)")
  }

  test("quality gate: quarantine honors configured path; valid rows flow on") {
    val in = tmpDir("q-in"); val out = tmpDir("q-out"); val quar = tmpDir("q-quar")
    Seq((Some("a"), 1), (None, 2), (Some("c"), 3), (None, 4))
      .toDF("name", "v").write.mode("overwrite").parquet(in)
    val cfg = PipelineConfig(
      pipelineId = "q-pipe",
      source = SourceConfig("file", Map("path" -> in)),
      sink = SinkConfig("file", Map("path" -> out), WriteMode.Overwrite),
      quality = Some(QualityConfig(
        nullChecks = List(NullCheck("name", NullAction.Quarantine)),
        quarantinePath = Some(quar))))
    val m = executor.execute(cfg)
    m.status shouldBe "SUCCESS"
    m.recordsFailed shouldBe 2
    spark.read.parquet(out).count() shouldBe 2
    val q = spark.read.parquet(quar)
    q.count() shouldBe 2
    q.columns should contain("validation_errors")
  }

  test("quality gate: duplicateCheck quarantines extra copies, keeps one row per key") {
    val in = tmpDir("dc-in"); val out = tmpDir("dc-out"); val quar = tmpDir("dc-quar")
    Seq((1, "a"), (1, "a"), (1, "a"), (2, "b"), (3, "c"))
      .toDF("k", "v").write.mode("overwrite").parquet(in)
    val cfg = PipelineConfig(
      pipelineId = "dc-pipe",
      source = SourceConfig("file", Map("path" -> in)),
      sink = SinkConfig("file", Map("path" -> out), WriteMode.Overwrite),
      quality = Some(QualityConfig(
        duplicateCheck = Some(DuplicateCheck(List("k"), NullAction.Quarantine)),
        quarantinePath = Some(quar))))
    val m = executor.execute(cfg)
    withClue(m.error.getOrElse("")) { m.status shouldBe "SUCCESS" }
    m.recordsFailed shouldBe 2
    spark.read.parquet(out).count() shouldBe 3
    val q = spark.read.parquet(quar)
    q.count() shouldBe 2
    q.select("validation_errors").as[String].head() should include("duplicate row on (k)")
  }

  test("duplicateCheck on a key subset keeps a DETERMINISTIC survivor (tie-break on other columns)") {
    val in = tmpDir("dcd-in"); val out = tmpDir("dcd-out"); val quar = tmpDir("dcd-quar")
    Seq((1, "zz"), (1, "aa"), (2, "bb")).toDF("k", "v")
      .repartition(4).write.mode("overwrite").parquet(in)
    val cfg = PipelineConfig(
      pipelineId = "dcd-pipe",
      source = SourceConfig("file", Map("path" -> in)),
      sink = SinkConfig("file", Map("path" -> out), WriteMode.Overwrite),
      quality = Some(QualityConfig(
        duplicateCheck = Some(DuplicateCheck(List("k"), NullAction.Quarantine)),
        quarantinePath = Some(quar))))
    executor.execute(cfg).status shouldBe "SUCCESS"
    // survivor for k=1 must always be the lexically-first v ("aa")
    spark.read.parquet(out).orderBy("k").select("v").as[String].collect() shouldBe Array("aa", "bb")
    spark.read.parquet(quar).select("v").as[String].collect() shouldBe Array("zz")
  }

  test("quality gate: duplicateCheck fail action aborts on duplicates") {
    val in = tmpDir("dcf-in")
    Seq((1, "a"), (1, "b")).toDF("k", "v").write.mode("overwrite").parquet(in)
    val cfg = PipelineConfig(
      pipelineId = "dcf-pipe",
      source = SourceConfig("file", Map("path" -> in)),
      sink = SinkConfig("file", Map("path" -> tmpDir("dcf-out")), WriteMode.Overwrite),
      quality = Some(QualityConfig(
        duplicateCheck = Some(DuplicateCheck(List("k"), NullAction.Fail)))))
    val m = executor.execute(cfg)
    m.status shouldBe "FAILED"
    m.error.get should include("duplicate rows on (k)")
  }

  test("lineage JSON escapes control characters — a multi-line condition " +
    "in the chain still parses") {
    val json = graft.lineage.LineageMetadata(
      "file", 0L, Seq("filter(a > 1\nAND b < 2)", "tab\there"),
      "p", "r").toJson
    json should not include "\n"
    json should include ("""\nAND""")
    json should include ("""\t""")
    // parses as real JSON on the Spark side
    val parsed = spark.range(1).select(
      org.apache.spark.sql.functions.from_json(
        org.apache.spark.sql.functions.lit(json),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("transformationChain",
            org.apache.spark.sql.types.ArrayType(
              org.apache.spark.sql.types.StringType))))).as("j"))
      .selectExpr("j.transformationChain[0] AS c0").head().getString(0)
    parsed shouldBe "filter(a > 1\nAND b < 2)"
  }

  test("compose runs NO quality actions: quarantine dir stays empty while " +
    "the composed frame still has the gated shape") {
    val in = tmpDir("compose-in")
    val qp = tmpDir("compose-quar") + "/never-created"
    Seq((1, "a"), (1, "b"), (2, null.asInstanceOf[String]), (3, "c"))
      .toDF("k", "v").write.mode("overwrite").parquet(in)
    val cfg = PipelineConfig(
      pipelineId = "compose-pipe",
      source = SourceConfig("file", Map("path" -> in)),
      sink = SinkConfig("file", Map("path" -> tmpDir("compose-out")), WriteMode.Overwrite),
      quality = Some(QualityConfig(
        nullChecks = List(NullCheck("v", NullAction.Quarantine)),
        duplicateCheck = Some(DuplicateCheck(List("k"), NullAction.Quarantine)),
        quarantinePath = Some(qp))))
    val composed = executor.compose(cfg)(spark)
    // the gate's frame SHAPE applies: (2, null) quarantine-filtered, one
    // row per k among (1,a)/(1,b)/(3,c) → 2 survivors...
    composed.count() shouldBe 2
    // ...but composing — and even acting on the composed frame — writes
    // nothing to the quarantine path ("--dry-run: nothing written")
    new java.io.File(qp).exists() shouldBe false
  }

  test("duplicateCheck survives MapType columns: whole-row check and " +
    "tie-break key them by JSON instead of crashing") {
    import org.apache.spark.sql.functions.{map, lit, col}
    val in = tmpDir("mapdup-in")
    Seq((1, "x"), (1, "x"), (2, "y")).toDF("k", "v")
      .withColumn("meta", map(lit("a"), col("v")))
      .write.mode("overwrite").parquet(in)
    val out = tmpDir("mapdup-out")
    def run(cols: List[String]) = executor.execute(PipelineConfig(
      pipelineId = "mapdup-pipe",
      source = SourceConfig("file", Map("path" -> in)),
      sink = SinkConfig("file", Map("path" -> out), WriteMode.Overwrite),
      quality = Some(QualityConfig(
        duplicateCheck = Some(DuplicateCheck(cols, NullAction.Quarantine)),
        quarantinePath = Some(tmpDir("mapdup-quar"))))))
    // whole-row check (empty columns → every column incl. the map)
    val whole = run(Nil)
    withClue(whole.error.getOrElse("")) { whole.status shouldBe "SUCCESS" }
    spark.read.parquet(out).count() shouldBe 2 // identical (1,x,{a:x}) collapsed
    // key-subset check: the map participates in the tie-break
    val subset = run(List("k"))
    withClue(subset.error.getOrElse("")) { subset.status shouldBe "SUCCESS" }
    spark.read.parquet(out).count() shouldBe 2
  }

  test("per-stage metrics: extract/quality/fused transform+load records without extra actions") {
    val in = tmpDir("st-in"); val out = tmpDir("st-out"); val quar = tmpDir("st-quar")
    Seq((Some("a"), 1), (None, 2), (Some("c"), 3), (Some("d"), 4))
      .toDF("name", "v").write.mode("overwrite").parquet(in)
    val cfg = PipelineConfig(
      pipelineId = "st-pipe",
      source = SourceConfig("file", Map("path" -> in)),
      transformations = List(TransformConfig("f", "filter", Map("condition" -> "v <= 3"))),
      sink = SinkConfig("file", Map("path" -> out), WriteMode.Overwrite),
      quality = Some(QualityConfig(
        nullChecks = List(NullCheck("name", NullAction.Quarantine)),
        quarantinePath = Some(quar))))
    val m = executor.execute(cfg)
    withClue(m.error.getOrElse("")) { m.status shouldBe "SUCCESS" }
    // raw extracted = 4 (3 valid + 1 quarantined); loaded = 2 (v<=3 of valid)
    m.recordsExtracted shouldBe 4
    m.recordsFailed shouldBe 1
    m.recordsLoaded shouldBe 2
    val st = m.stages.map(s => s.stage -> s.records).toMap
    st("extract") shouldBe 4
    st("quality") shouldBe 1
    // transforms + write execute as ONE fused Spark job (single-action
    // execution), so they report as one stage — summing stage durations
    // must not double-count the write wall-clock.
    st("transform+load") shouldBe 2
    m.stages.map(_.stage) should not contain "load"
    m.stages.map(_.durationMs).sum should be <= m.durationMs
  }

  test("quality gate: fail action aborts the pipeline") {
    val in = tmpDir("f-in")
    Seq((None: Option[String], 1)).toDF("name", "v").write.mode("overwrite").parquet(in)
    val cfg = PipelineConfig(
      pipelineId = "f-pipe",
      source = SourceConfig("file", Map("path" -> in)),
      sink = SinkConfig("file", Map("path" -> tmpDir("f-out")), WriteMode.Overwrite),
      quality = Some(QualityConfig(nullChecks = List(NullCheck("name", NullAction.Fail)))))
    val m = executor.execute(cfg)
    m.status shouldBe "FAILED"
    m.error.get should include("fail-action")
  }

  test("scenario-3 shape: multi-source join fully declarative via register transform") {
    // orders (parquet, standing in for JDBC) ⋈ product details (kafka-file
    // JSON-lines double), like the reference's QuickstartScenario3 — but the
    // right side comes from YAML, not programmatic view registration
    val kafkaDir = tmpDir("kafka-topic")
    (1 to 20).map(i => s"""{"p_key":$i,"p_name":"Product $i"}""")
      .toDF("value").coalesce(1).write.mode("overwrite").text(kafkaDir)
    val out = tmpDir("s3-out")
    val yaml =
      s"""pipelineId: it-scenario3
         |source:
         |  type: file
         |  options: {path: $sf/orders.parquet}
         |transformations:
         |  - name: products
         |    type: register
         |    options:
         |      viewName: v_products
         |      sourceType: kafka-file
         |      path: $kafkaDir
         |      project: "true"
         |      expressions: "p_key:cast(get_json_object(value, '$$.p_key') as int),p_name:get_json_object(value, '$$.p_name')"
         |  - name: key
         |    type: map
         |    options: {expressions: "p_key:cast(o_orderkey % 20 + 1 as int)"}
         |  - name: join-products
         |    type: join
         |    options:
         |      rightDataset: v_products
         |      joinType: inner
         |      joinKeys: p_key
         |sink:
         |  type: file
         |  writeMode: overwrite
         |  options: {path: $out, lineage: "true"}
         |""".stripMargin
    val cfg = new YamlConfigParser().parse(yaml)
    val m = executor.execute(cfg)
    withClue(m.error.getOrElse("")) { m.status shouldBe "SUCCESS" }
    val back = spark.read.parquet(out)
    back.count() shouldBe spark.read.parquet(s"$sf/orders.parquet").count()
    back.columns should contain("p_name")
    // lineage merge: the chain must carry the RIGHT side's source system and
    // the join against it (reference LineageTracker.scala:91-122 semantics)
    val lineage = back.select("_lineage").as[String].head()
    lineage should include(s"register(source=kafka-file:$kafkaDir, view=v_products)")
    lineage should include("join(type=inner, right=v_products)")
  }

  test("schemaValidation: declared-vs-actual diff fails fast with the issue list") {
    val in = tmpDir("sv-in")
    Seq(("x", 1L)).toDF("name", "v").write.mode("overwrite").parquet(in)
    def cfg(ddl: String) = PipelineConfig(
      pipelineId = "sv",
      source = SourceConfig("file", Map("path" -> in, "schema" -> ddl)),
      sink = SinkConfig("file", Map("path" -> tmpDir("sv-out")), WriteMode.Overwrite),
      quality = Some(QualityConfig(schemaValidation = true)))
    val bad = executor.execute(cfg("name STRING, v INT, missing_col DOUBLE"))
    bad.status shouldBe "FAILED"
    bad.error.get should (include("schema validation failed") and
      include("missing_col: missing column") and include("v: type mismatch"))
    executor.execute(cfg("name STRING, v BIGINT")).status shouldBe "SUCCESS"
  }

  test("failures surface as FAILED metrics, not exceptions (reference contract)") {
    val cfg = PipelineConfig(
      pipelineId = "bad",
      source = SourceConfig("file", Map("path" -> "/no/such/path.parquet")),
      sink = SinkConfig("file", Map("path" -> tmpDir("bad-out"))))
    val m = executor.execute(cfg)
    m.status shouldBe "FAILED"
    m.error shouldBe defined
  }

  test("unknown component types are rejected with known-type listing") {
    val cfg = PipelineConfig(
      pipelineId = "u",
      source = SourceConfig("teleport", Map.empty),
      sink = SinkConfig("file", Map("path" -> "/tmp/x")))
    val m = executor.execute(cfg)
    m.status shouldBe "FAILED"
    m.error.get should include("unknown source type 'teleport'")
  }

  test("performance knobs: shufflePartitions + repartition are applied for " +
    "the run and RESTORED after it (no leak into the next pipeline)") {
    val out = tmpDir("perf-out")
    val cfg = PipelineConfig(
      pipelineId = "perf",
      source = SourceConfig("file", Map("path" -> s"$sf/orders.parquet")),
      transformations = List(TransformConfig("s", "sort", Map("orderBy" -> "o_orderkey", "global" -> "false"))),
      sink = SinkConfig("file", Map("path" -> out), WriteMode.Overwrite),
      performance = Some(PerformanceConfig(repartition = Some(7), shufflePartitions = Some(13))))
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    executor.execute(cfg).status shouldBe "SUCCESS"
    // per-pipeline setting: restored like planLint/checkpoint — pipeline B
    // must not silently shuffle at A's width in a shared session
    spark.conf.get("spark.sql.shuffle.partitions") shouldBe before
    // repartition(7) → 7 output files (sortWithinPartitions preserves them)
    new java.io.File(out).listFiles().count(_.getName.endsWith(".parquet")) shouldBe 7
  }

  test("an invalid sink config fails BEFORE the quality gate runs its " +
    "scans and quarantine appends (no side effects for a doomed run)") {
    val qdir = tmpDir("early-quar")
    val cfg = PipelineConfig(
      pipelineId = "early-sink-check",
      source = SourceConfig("file", Map("path" -> s"$sf/documents.parquet")),
      sink = SinkConfig("postgres", Map.empty), // missing url/dbtable
      quality = Some(QualityConfig(
        nullChecks = List(NullCheck("text", NullAction.Quarantine)),
        quarantinePath = Some(qdir))))
    val m = executor.execute(cfg)
    m.status shouldBe "FAILED"
    m.error.get should include ("url")
    // the quarantine dir must not have been appended to (tmpDir
    // pre-creates the empty directory itself)
    Option(new java.io.File(qdir).listFiles()).map(_.length).getOrElse(0) shouldBe 0
  }

  test("a non-boolean lineage sink option gets the guided config error; a " +
    "user column named __graft_rn collides loudly in the duplicate gate") {
    val out = tmpDir("lineage-bad")
    val m = executor.execute(PipelineConfig(
      pipelineId = "lineage-bad",
      source = SourceConfig("file", Map("path" -> s"$sf/region.parquet")),
      sink = SinkConfig("file", Map("path" -> out, "lineage" -> "enabled"),
        WriteMode.Overwrite)))
    m.status shouldBe "FAILED"
    m.error.get should include ("lineage")
    val clashSrc = tmpDir("rn-clash")
    spark.range(3).selectExpr("id", "id AS __graft_rn")
      .write.mode("overwrite").parquet(clashSrc)
    val m2 = executor.execute(PipelineConfig(
      pipelineId = "rn-clash",
      source = SourceConfig("file", Map("path" -> clashSrc)),
      sink = SinkConfig("file", Map("path" -> tmpDir("rn-out")), WriteMode.Overwrite),
      quality = Some(QualityConfig(duplicateCheck =
        Some(DuplicateCheck(columns = List("id"), action = NullAction.Quarantine))))))
    m2.status shouldBe "FAILED"
    m2.error.get should include ("__graft_rn")
  }
}
