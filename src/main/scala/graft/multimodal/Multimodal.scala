package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal-column plumbing: media (image/audio/video) travels as an
 * opaque BinaryType payload + typed metadata struct; decode/feature
 * extraction runs as a partition-wise batch operator (`mapPartitions`, the
 * Scala analog of mapInPandas) so a real decoder would amortize model/
 * codec init per partition, not per row.
 *
 * The actual byte→pixels decode is STUBBED (this container ships no
 * image/audio codecs): [[StubDecoder]] derives deterministic fake
 * dimensions/features from a hash of the payload. The Spark-side contract
 * — schema, batch iteration shape, partition sizing, null handling — is
 * real and tested; swapping in a JNI/ONNX decoder changes only the
 * function body marked STUB.
 */
object Multimodal {

  /** media payload schema: binary blob + source metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType),   // image | audio | video
    StructField("content", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("source_uri", StringType),
      StructField("content_type", StringType),
      StructField("n_bytes", LongType))))))

  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType),
    StructField("feature", ArrayType(FloatType))))

  /** Wrap raw bytes + ids into the canonical media frame. The id must
    * cast to a non-null long (string/UUID ids: run `assign_ids` first) —
    * enforced with a descriptive row-level error rather than the
    * downstream mapPartitions NPE a null media_id used to cause. */
  def asMediaFrame(df: DataFrame, idCol: String, bytesCol: String,
                   modality: String, sourceUriCol: String): DataFrame =
    df.select(
      when(assert_true(col(idCol).cast("long").isNotNull,
        lit(s"multimodal: idColumn '$idCol' must cast to a non-null long " +
          "(string/UUID ids need assign_ids first)")).isNull,
        col(idCol).cast("long")).as("media_id"),
      lit(modality).as("modality"),
      col(bytesCol).cast("binary").as("content"),
      struct(
        col(sourceUriCol).cast("string").as("source_uri"),
        lit(s"application/x-$modality").as("content_type"),
        length(col(bytesCol).cast("binary")).cast("long").as("n_bytes")).as("meta"))

  trait MediaDecoder extends Serializable {
    /** Decode one payload → (width, height, durationMs, feature vector). */
    def decode(modality: String, content: Array[Byte]): (Int, Int, Long, Array[Float])
  }

  /** Shared deterministic byte fold for the stub codecs (FNV-ish). */
  private def byteFold(seed: Long, content: Array[Byte]): Long = {
    var h = seed
    var i = 0
    while (i < content.length) { h = 31 * h + content(i); i += 1 }
    h
  }

  /** STUB: deterministic fake decode — dimensions and an 8-dim "feature"
    * derived from a rolling hash of the payload bytes. Replace with a real
    * codec (??? boundary) without touching the plumbing. */
  object StubDecoder extends MediaDecoder {
    def decode(modality: String, content: Array[Byte]): (Int, Int, Long, Array[Float]) = {
      val h = byteFold(1125899906842597L, content) // not a real decode
      val w = 64 + math.floorMod(h, 512).toInt
      val ht = 64 + math.floorMod(h >> 9, 512).toInt
      val dur = if (modality == "image") 0L else 1000L + math.floorMod(h >> 18, 60000L)
      val feat = Array.tabulate(8)(j => math.floorMod(h >> (j * 7), 1000L).toFloat / 1000f)
      (w, ht, dur, feat)
    }
  }

  /**
   * Partition-wise decode/feature-extract. Iterator-to-iterator transform:
   * nothing is materialized per partition beyond the row in flight, so
   * partition size is bounded by `spark.sql.files.maxPartitionBytes`, not
   * by media payload count.
   */
  def extractFeatures(media: DataFrame, decoder: MediaDecoder = StubDecoder): DataFrame = {
    val spark = media.sparkSession
    val enc = org.apache.spark.sql.Encoders.row(featureSchema)
    media.select("media_id", "modality", "content").mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0); val modality = r.getString(1)
        val bytes = if (r.isNullAt(2)) Array.empty[Byte] else r.getAs[Array[Byte]](2)
        val (w, h, dur, feat) = decoder.decode(modality, bytes)
        Row(id, modality, w, h, dur, feat)
      }
    }(enc)
  }

  trait MediaResizer extends Serializable {
    /** Re-encode one payload at (targetW, targetH) → new payload bytes. */
    def resize(modality: String, content: Array[Byte], targetW: Int, targetH: Int): Array[Byte]
  }

  /** STUB resizer: deterministic re-encode stand-in — emits a payload whose
    * length scales with the target area and whose bytes derive from a hash
    * of the input (so equal inputs resize equally and tests can assert
    * determinism). Replace with a real codec without touching plumbing. */
  object StubResizer extends MediaResizer {
    def resize(modality: String, content: Array[Byte], targetW: Int, targetH: Int): Array[Byte] = {
      val h = byteFold(1125899906842597L, content)
      val n = math.max(16, (targetW.toLong * targetH / 64).toInt)
      Array.tabulate(n)(j => ((h >> (j % 56)) & 0xFF).toByte)
    }
  }

  /**
   * Partition-wise resize: same media schema out, payload re-encoded at the
   * target dimensions, metadata updated (content_type gains `;resized=WxH`,
   * n_bytes recomputed). Iterator-to-iterator, codec init amortizable per
   * partition — the batch shape a real image pipeline needs.
   */
  def resize(media: DataFrame, targetW: Int, targetH: Int,
             resizer: MediaResizer = StubResizer): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(mediaSchema)
    media.select("media_id", "modality", "content", "meta").mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0); val modality = r.getString(1)
        val bytes = if (r.isNullAt(2)) Array.empty[Byte] else r.getAs[Array[Byte]](2)
        // user-supplied media frames may carry null meta / meta fields —
        // degrade to defaults rather than an executor NPE
        val meta = if (r.isNullAt(3)) null else r.getStruct(3)
        val srcUri =
          if (meta == null || meta.isNullAt(0)) null else meta.getString(0)
        val ctype =
          if (meta == null || meta.isNullAt(1)) "application/octet-stream"
          else meta.getString(1)
        val out = resizer.resize(modality, bytes, targetW, targetH)
        Row(id, modality, out, Row(
          srcUri,
          s"$ctype;resized=${targetW}x$targetH",
          out.length.toLong))
      }
    }(enc)
  }

  /** One sampled frame: (media_id, frame_idx, ts_ms, frame bytes). */
  val frameSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("frame_idx", IntegerType, nullable = false),
    StructField("ts_ms", LongType, nullable = false),
    StructField("frame", BinaryType)))

  trait FrameSampler extends Serializable {
    /** Extract the frame nearest `tsMs` from a video/audio payload. */
    def frameAt(modality: String, content: Array[Byte], tsMs: Long): Array[Byte]
  }

  /** STUB sampler: hash-derived deterministic fake frame bytes. */
  object StubFrameSampler extends FrameSampler {
    def frameAt(modality: String, content: Array[Byte], tsMs: Long): Array[Byte] = {
      val h = byteFold(tsMs * 1125899906842597L, content)
      Array.tabulate(32)(j => ((h >> (j % 56)) & 0xFF).toByte)
    }
  }

  /**
   * Frame sampling for video/audio payloads: one output row per
   * `everyMs`-spaced timestamp within the decoded duration (images yield
   * one frame at ts 0). flatMap-shaped iterator-to-iterator — the 1→N
   * explode happens streamwise, so a long video never materializes all its
   * frames at once in memory.
   */
  def sampleFrames(media: DataFrame, everyMs: Long, maxFrames: Int = 64,
                   decoder: MediaDecoder = StubDecoder,
                   sampler: FrameSampler = StubFrameSampler): DataFrame = {
    require(everyMs > 0, "everyMs must be positive")
    val enc = org.apache.spark.sql.Encoders.row(frameSchema)
    media.select("media_id", "modality", "content").mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(0); val modality = r.getString(1)
        val bytes = if (r.isNullAt(2)) Array.empty[Byte] else r.getAs[Array[Byte]](2)
        val (_, _, durMs, _) = decoder.decode(modality, bytes)
        val n = math.min(maxFrames.toLong, durMs / everyMs + 1).toInt
        (0 until n).iterator.map { idx =>
          val ts = idx * everyMs
          Row(id, idx, ts, sampler.frameAt(modality, bytes, ts))
        }
      }
    }(enc)
  }
}
