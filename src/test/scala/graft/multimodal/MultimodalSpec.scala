package graft.multimodal

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val media = Multimodal.asMediaFrame(
    Seq((1L, "payload-one", "s3://bucket/a.jpg"),
        (2L, "payload-two", "s3://bucket/b.jpg"),
        (3L, "payload-one", "s3://bucket/c.jpg"))
      .toDF("id", "body", "uri")
      .select(col("id"), encode(col("body"), "UTF-8").as("bytes"), col("uri")),
    "id", "bytes", "image", "uri")

  test("media frame carries binary payload + typed metadata") {
    media.schema.simpleString shouldBe Multimodal.mediaSchema.simpleString
    val m = media.where("media_id = 1").select("meta.n_bytes", "meta.content_type")
      .as[(Long, String)].head()
    m shouldBe ((11L, "application/x-image"))
  }

  test("partition-wise feature extraction: schema, determinism, payload-dependence") {
    val feats = Multimodal.extractFeatures(media)
    feats.schema shouldBe Multimodal.featureSchema
    val rows = feats.orderBy("media_id").collect()
    rows should have size 3
    // same payload → same fake decode; different payload → different
    rows(0).getAs[Seq[Float]]("feature") shouldBe rows(2).getAs[Seq[Float]]("feature")
    rows(0).getAs[Seq[Float]]("feature") should not be rows(1).getAs[Seq[Float]]("feature")
    all(rows.map(_.getAs[Int]("width"))) should be >= 64
    all(rows.map(_.getAs[Long]("duration_ms"))) shouldBe 0L // images
  }

  test("resize keeps the media schema, re-encodes payload, updates metadata") {
    val resized = Multimodal.resize(media, 128, 96)
    resized.schema.simpleString shouldBe Multimodal.mediaSchema.simpleString
    val r = resized.where("media_id = 1")
      .select("meta.content_type", "meta.n_bytes").as[(String, Long)].head()
    r._1 should endWith(";resized=128x96")
    r._2 shouldBe (128L * 96 / 64)
    // determinism: equal payloads resize to equal bytes
    val bytes = resized.orderBy("media_id").select("content").as[Array[Byte]].collect()
    bytes(0) shouldBe bytes(2)
    bytes(0) should not equal bytes(1)
  }

  test("frame sampling: images yield one frame, audio/video one per interval, bounded") {
    val video = Multimodal.asMediaFrame(
      Seq((9L, "some-video-payload", "s3://bucket/v.mp4")).toDF("id", "body", "uri")
        .select(col("id"), encode(col("body"), "UTF-8").as("bytes"), col("uri")),
      "id", "bytes", "video", "uri")
    val frames = Multimodal.sampleFrames(video, everyMs = 1000, maxFrames = 16)
    frames.schema shouldBe Multimodal.frameSchema
    val n = frames.count()
    n should be >= 2L   // stub durations are >= 1000 ms for video
    n should be <= 16L  // maxFrames cap
    frames.select("ts_ms").as[Long].collect().sorted shouldBe
      (0L until n).map(_ * 1000L).toArray
    // images: single frame at ts 0
    Multimodal.sampleFrames(media, everyMs = 1000)
      .groupBy("media_id").count().select("count").as[Long].collect()
      .foreach(_ shouldBe 1L)
  }

  test("null payloads decode as empty bytes instead of crashing") {
    val withNull = media.withColumn("content",
      when(col("media_id") === 2, lit(null).cast("binary")).otherwise(col("content")))
    Multimodal.extractFeatures(withNull).count() shouldBe 3
  }

  test("declarative multimodal transform: features, frames, validation") {
    import graft.config.TransformConfig
    import graft.api.RunContext
    val ctx = RunContext(spark, "mm", "t")
    val raw = Seq((1L, "payload-one"), (2L, "payload-two")).toDF("id", "body")
      .select(col("id"), encode(col("body"), "UTF-8").as("bytes"))
    def t(opts: (String, String)*) = TransformConfig("mm", "multimodal", opts.toMap)
    val feats = graft.operators.MultimodalTransform(raw,
      t("operation" -> "features", "idColumn" -> "id", "bytesColumn" -> "bytes"), ctx)
    feats.schema shouldBe Multimodal.featureSchema
    feats.count() shouldBe 2
    val frames = graft.operators.MultimodalTransform(raw,
      t("operation" -> "frames", "idColumn" -> "id", "bytesColumn" -> "bytes",
        "modality" -> "video", "everyMs" -> "10000", "maxFrames" -> "3"), ctx)
    frames.schema shouldBe Multimodal.frameSchema
    frames.groupBy("media_id").count().select("count").as[Long].collect()
      .foreach(_ should be <= 3L)
    an[IllegalArgumentException] should be thrownBy graft.operators.MultimodalTransform(
      raw, t("operation" -> "nope", "idColumn" -> "id", "bytesColumn" -> "bytes"), ctx)
    an[graft.api.ConfigException] should be thrownBy graft.operators.MultimodalTransform(
      raw, t("operation" -> "features"), ctx)
  }
}
