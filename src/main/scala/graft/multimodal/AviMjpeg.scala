package graft.multimodal

/**
 * REAL video decode for MJPEG-in-AVI payloads — the JDK ships no video
 * codec SPI, but MJPEG frames are plain JPEGs (which `javax.imageio`
 * decodes), so parsing the RIFF/AVI container directly closes the last
 * multimodal stub seam with zero external jars:
 *
 *  - [[read]] walks the RIFF chunk tree: `hdrl` → the first `vids`
 *    stream's `strh` (dwScale/dwRate = the frame clock, so fps can be
 *    rational, e.g. NTSC 30000/1001), then the `movi` LIST, indexing
 *    every `##dc`/`##db` chunk of that stream as an (offset, length)
 *    pair. NO pixel data is decoded at parse time — the index is
 *    O(frames) longs, capped at [[MaxIndexFrames]] against hostile
 *    chunk floods (the [[Multimodal.GifMedia.MaxFrames]] discipline).
 *  - [[Video.frame]] decodes exactly one frame's JPEG bytes on demand
 *    via ImageIO — memory per sample is one decoded frame, never the
 *    clip.
 *  - duration = frames · 1000 · scale / rate, from the ACTUAL indexed
 *    frame count (a truncated file reports its real playable length,
 *    not the header's claim).
 *
 * Anything that is not a parseable AVI with at least one video chunk —
 * or whose frame bytes ImageIO cannot decode — yields None and the
 * caller's explicit (-1, -1) sentinel, never fake dimensions (the
 * WavPcmDecoder contract). Layout per the public AVI RIFF form
 * (msdn AVIMAINHEADER/AVISTREAMHEADER; reference engines ship the same
 * parse, e.g. ffmpeg's avidec).
 */
private[multimodal] object AviMjpeg {

  /** Hard ceiling on indexed video chunks per payload: bounds the frame
    * index (16 B/entry → ≤ 4 MB) against a crafted chunk flood while
    * staying far above any real clip this path samples (64-frame
    * sampling grid × any everyMs). */
  val MaxIndexFrames: Int = 1 << 18

  /** Per-thread cached JPEG codec instances. The naive per-frame path
    * (`ImageIO.read` / `getImageWritersByFormatName(...).next()`) pays,
    * for EVERY frame: an SPI registry scan, a fresh reader/writer
    * instantiation + dispose, and — because `ImageIO.getUseCache`
    * defaults to true — a disk-backed temp-file cache stream per call.
    * A video signature pass decodes O(min(frames, 256)) JPEGs per
    * payload, so that per-call overhead dominates the actual DCT work on
    * the small frames MJPEG carries. Same codec classes, same arithmetic,
    * bit-identical pixels — this is purely call-overhead removal
    * (optimization-guide §1.2 step 2: per-task work). */
  private[multimodal] object JpegCodec {
    // every engine codec call site constructs an EXPLICIT in-memory
    // ImageIO stream (MemoryCacheImage{Input,Output}Stream) — the former
    // `ImageIO.setUseCache(false)` here mutated JVM-global state as a
    // class-load side effect, silently switching unrelated ImageIO users
    // in the same JVM (user UDFs decoding very large images) from
    // disk-backed to heap-backed caching

    private val readerTl = new ThreadLocal[javax.imageio.ImageReader] {
      override def initialValue(): javax.imageio.ImageReader = {
        val it = javax.imageio.ImageIO.getImageReadersByFormatName("jpeg")
        if (it.hasNext) it.next() else null
      }
    }
    private val writerTl = new ThreadLocal[javax.imageio.ImageWriter] {
      override def initialValue(): javax.imageio.ImageWriter = {
        val it = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg")
        if (it.hasNext) it.next() else null
      }
    }

    /** Decode one frame's bytes. JPEG bytes go through the cached
      * per-thread reader; anything the JPEG reader rejects (including
      * non-JPEG image bytes in a hostile container) falls back to the
      * generic `ImageIO.read` path, so every input decodes to exactly
      * what the old per-call path produced. */
    def decode(bytes: Array[Byte], off: Int,
               len: Int): Option[java.awt.image.BufferedImage] = {
      val r = readerTl.get()
      if (r != null) {
        try {
          val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
            new java.io.ByteArrayInputStream(bytes, off, len))
          try {
            r.setInput(iis, true, true)
            val img = r.read(0)
            if (img != null) return Some(img)
          } finally { r.setInput(null); iis.close() }
        } catch { case scala.util.control.NonFatal(_) => () }
      }
      // explicit in-memory stream: ImageIO.read(InputStream) would build
      // a disk-backed temp-file cache stream per call under the default
      // global useCache flag (which the engine no longer flips)
      try Option(javax.imageio.ImageIO.read(
        new javax.imageio.stream.MemoryCacheImageInputStream(
          new java.io.ByteArrayInputStream(bytes, off, len))))
      catch { case scala.util.control.NonFatal(_) => None }
    }

    /** JPEG-encode via the cached per-thread writer (memory-cached
      * output stream, no temp file, no SPI scan). Same JDK encoder,
      * same parameters → bit-identical bytes. */
    def encode(img: java.awt.image.BufferedImage,
               quality: Float): Array[Byte] = {
      val wr = writerTl.get()
      require(wr != null, "no JPEG ImageWriter SPI available")
      val p = wr.getDefaultWriteParam
      p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
      p.setCompressionQuality(quality)
      val bos = new java.io.ByteArrayOutputStream()
      val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
      try {
        wr.setOutput(ios)
        wr.write(null, new javax.imageio.IIOImage(img, null, null), p)
      } finally { wr.setOutput(null); ios.close() }
      bos.toByteArray
    }
  }

  final case class Video(rate: Long, scale: Long,
                         frames: IndexedSeq[(Int, Int)],
                         bytes: Array[Byte]) {
    def frameCount: Int = frames.length
    /** Playable duration from the indexed frames and the strh clock. */
    def durationMs: Long = frameCount.toLong * 1000L * scale / rate
    /** The frame on screen at `tsMs`: floor(ts · rate / (1000 · scale)),
      * clamped to the last frame (the GIF sampler's convention). */
    def frameIndexAt(tsMs: Long): Int =
      math.min(frameCount - 1L,
        math.max(0L, tsMs) * rate / (1000L * scale)).toInt
    /** Decode ONE frame's JPEG bytes; None when out of range or the
      * bytes are not a decodable image. */
    def frame(i: Int): Option[java.awt.image.BufferedImage] = {
      if (i < 0 || i >= frames.length) return None
      val (off, len) = frames(i)
      JpegCodec.decode(bytes, off, len)
    }
  }

  private def fourcc(b: Array[Byte], off: Int): String =
    new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)

  private def u32(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xFFL)) | ((b(off + 1) & 0xFFL) << 8) |
      ((b(off + 2) & 0xFFL) << 16) | ((b(off + 3) & 0xFFL) << 24)

  /** Parse an AVI payload into a lazily-decodable [[Video]]. None for
    * anything that is not a RIFF/AVI with a vids stream clock and at
    * least one indexed video chunk. */
  def read(content: Array[Byte]): Option[Video] = {
    try {
      if (content.length < 12 || fourcc(content, 0) != "RIFF" ||
          fourcc(content, 8) != "AVI ") return None
      val end = math.min(content.length.toLong, 8L + u32(content, 4)).toInt

      // pass 1 (headers): find the FIRST vids stream — its order among
      // strl lists is its chunk-id prefix ("00db"/"00dc" for stream 0)
      var rate = 0L; var scale = 0L
      var vidsIndex = -1; var strlSeen = 0
      def walkHeaders(from: Int, to: Int): Unit = {
        var p = from
        while (p + 8 <= to) {
          val id = fourcc(content, p)
          val sz = u32(content, p + 4)
          if (sz < 0 || p + 8 + sz > to) return // truncated/hostile: stop
          if (id == "LIST" && sz >= 4) {
            val listType = fourcc(content, p + 8)
            if (listType == "strl") {
              val mine = strlSeen; strlSeen += 1
              // scan this strl for its strh
              var q = p + 12
              val qEnd = (p + 8 + sz).toInt
              while (q + 8 <= qEnd) {
                val cid = fourcc(content, q)
                val csz = u32(content, q + 4)
                if (csz < 0 || q + 8 + csz > qEnd) return
                if (cid == "strh" && csz >= 32 && vidsIndex < 0 &&
                    fourcc(content, q + 8) == "vids") {
                  vidsIndex = mine
                  scale = u32(content, q + 8 + 20)
                  rate = u32(content, q + 8 + 24)
                }
                q = q + 8 + csz.toInt + (csz.toInt & 1)
              }
            } else if (listType == "hdrl") {
              walkHeaders(p + 12, (p + 8 + sz).toInt)
            }
          }
          p = p + 8 + sz.toInt + (sz.toInt & 1)
        }
      }
      walkHeaders(12, end)
      if (vidsIndex < 0 || rate <= 0L || scale <= 0L) return None
      val wantDc = f"${vidsIndex}%02ddc"
      val wantDb = f"${vidsIndex}%02ddb"

      // pass 2 (movi): index that stream's frame chunks, decode nothing
      val frames = Vector.newBuilder[(Int, Int)]
      var nFrames = 0
      def walkMovi(from: Int, to: Int): Unit = {
        var p = from
        while (p + 8 <= to && nFrames < MaxIndexFrames) {
          val id = fourcc(content, p)
          val sz = u32(content, p + 4)
          if (sz < 0 || p + 8 + sz > to) return
          if (id == "LIST" && sz >= 4) {
            val listType = fourcc(content, p + 8)
            // frames may sit directly in movi or nested in rec  lists
            if (listType == "movi" || listType == "rec ")
              walkMovi(p + 12, (p + 8 + sz).toInt)
          } else if ((id == wantDc || id == wantDb) && sz > 0) {
            frames += ((p + 8, sz.toInt)); nFrames += 1
          }
          p = p + 8 + sz.toInt + (sz.toInt & 1)
        }
      }
      walkMovi(12, end)
      val idx = frames.result()
      if (idx.isEmpty) None else Some(Video(rate, scale, idx, content))
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  // ------------------------------------------------------------- resize

  /** REAL video resize: decode each indexed MJPEG frame, bilinear-rescale
    * to (targetW, targetH) via Graphics2D, re-encode at JPEG quality 1.0,
    * and reassemble the RIFF/AVI container with the SAME frame clock —
    * duration and frame count are preserved, a re-decode reports exactly
    * the target dimensions. One frame resident at a time (the
    * [[Video.frame]] on-demand shape). None when the payload is not a
    * parseable MJPEG-AVI or any frame fails to decode — the caller
    * degrades to its stub path rather than emitting a half-real clip. */
  def resizeClip(content: Array[Byte], targetW: Int,
                 targetH: Int): Option[Array[Byte]] = {
    if (targetW <= 0 || targetH <= 0) return None
    read(content).flatMap { v =>
      try {
        val jpegs = new Array[Array[Byte]](v.frameCount)
        var i = 0
        while (i < v.frameCount) {
          v.frame(i) match {
            case None => return None
            case Some(img) =>
              val out = new java.awt.image.BufferedImage(
                targetW, targetH, java.awt.image.BufferedImage.TYPE_INT_RGB)
              val g = out.createGraphics()
              try {
                g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
                  java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
                g.drawImage(img, 0, 0, targetW, targetH, null)
              } finally g.dispose()
              jpegs(i) = encodeJpeg(out)
          }
          i += 1
        }
        Some(assemble(jpegs.toIndexedSeq, targetW, targetH,
          v.rate.toInt, v.scale.toInt))
      } catch { case scala.util.control.NonFatal(_) => None }
    }
  }

  /** JPEG-encode at quality 1.0 (all-ones quant tables — flat 8×8 blocks
    * roundtrip bit-exactly; see [[synthetic]]'s exactness argument). */
  private def encodeJpeg(img: java.awt.image.BufferedImage): Array[Byte] =
    JpegCodec.encode(img, 1.0f)

  /** Hand-assemble the RIFF/AVI container around per-frame JPEG payloads
    * (MJPG vids stream, stream 0, `00dc` chunks padded to even). Shared
    * by [[synthetic]] and [[resizeClip]]. */
  private def assemble(jpegs: IndexedSeq[Array[Byte]], w: Int, h: Int,
                       rate: Int, scale: Int): Array[Byte] = {
    val nFrames = jpegs.length
    def pad(n: Int) = n + (n & 1)
    val moviBody = 4 + jpegs.map(j => 8 + pad(j.length)).sum
    val strlBody = 4 + (8 + 56) + (8 + 40)               // strh + strf
    val hdrlBody = 4 + (8 + 56) + (8 + strlBody)         // avih + LIST strl
    val riffBody = 4 + (8 + hdrlBody) + (8 + moviBody)
    val buf = java.nio.ByteBuffer.allocate(8 + riffBody)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def cc(s: String) = buf.put(s.getBytes("US-ASCII"))
    cc("RIFF"); buf.putInt(riffBody); cc("AVI ")
    cc("LIST"); buf.putInt(hdrlBody); cc("hdrl")
    cc("avih"); buf.putInt(56)
    buf.putInt((1000000L * scale / rate).toInt)          // dwMicroSecPerFrame
      .putInt(0).putInt(0).putInt(0)                     // maxBytesPerSec, padding, flags
      .putInt(nFrames).putInt(0).putInt(1).putInt(0)     // totalFrames, initial, streams, sugBuf
      .putInt(w).putInt(h)
      .putInt(0).putInt(0).putInt(0).putInt(0)           // dwReserved[4]
    cc("LIST"); buf.putInt(strlBody); cc("strl")
    cc("strh"); buf.putInt(56)
    cc("vids"); cc("MJPG")
    buf.putInt(0).putShort(0).putShort(0).putInt(0)      // flags, priority, language, initialFrames
      .putInt(scale).putInt(rate)                        // dwScale, dwRate
      .putInt(0).putInt(nFrames).putInt(0)               // start, length, sugBuf
      .putInt(-1).putInt(0)                              // quality, sampleSize
      .putShort(0).putShort(0)                           // rcFrame left, top
      .putShort(w.toShort).putShort(h.toShort)           // rcFrame right, bottom
    cc("strf"); buf.putInt(40)
    buf.putInt(40).putInt(w).putInt(h)                   // biSize, biWidth, biHeight
      .putShort(1).putShort(24)                          // biPlanes, biBitCount
    cc("MJPG")                                           // biCompression
    buf.putInt(w * h * 3).putInt(0).putInt(0).putInt(0).putInt(0)
    cc("LIST"); buf.putInt(moviBody); cc("movi")
    jpegs.foreach { j =>
      cc("00dc"); buf.putInt(j.length); buf.put(j)
      if ((j.length & 1) == 1) buf.put(0.toByte)
    }
    buf.array()
  }

  // ------------------------------------------------------------ synthetic

  /**
   * Deterministic synthetic MJPEG-in-AVI clip — the video counterpart of
   * [[Multimodal.syntheticWavPcm16]], and like it the scaffolding BOTH
   * the verify query and its INDEPENDENT golden generator derive from:
   * frame f is a grid of 16×16 constant-gray tiles, tile (qx, qy) =
   * `(seed·31 + qx·7 + qy·13 + f·17) mod 256`. The container is
   * hand-assembled RIFF/AVI/hdrl/strh/movi (this method must not go
   * through any AVI library — the decode test would then only prove a
   * writer/reader roundtrip); the frames are real JPEGs via the JDK
   * encoder at quality 1.0, where 16-aligned constant tiles roundtrip
   * BIT-EXACTLY (flat 8×8 DCT blocks have only a DC coefficient, the
   * q=1.0 tables quantize it losslessly, and gray pixels survive the
   * YCbCr trip exactly — verified empirically, 0 mismatches including
   * non-multiple-of-16 edge blocks). The fixture side
   * (tools/gen_golden_q157.py) recomputes duration and every luma value
   * straight from the tile formula with NO video/image library, so the
   * match only holds if [[read]] genuinely parses the container and
   * [[Video.frame]] genuinely decodes JPEG pixels.
   *
   * Dims must be positive multiples of 16 (the tile/JPEG-block alignment
   * the exactness argument needs).
   */
  def synthetic(seed: Long, w: Int, h: Int, nFrames: Int,
                rate: Int, scale: Int = 1): Array[Byte] = {
    require(w > 0 && h > 0 && w % 16 == 0 && h % 16 == 0,
      s"syntheticMjpegAvi: dims must be positive multiples of 16, got ${w}x$h")
    require(nFrames > 0 && rate > 0 && scale > 0,
      s"syntheticMjpegAvi: positive frames/rate/scale required, got " +
        s"$nFrames/$rate/$scale")
    // one bulk setRGB per frame: per-pixel setRGB pays a ColorModel
    // dispatch per call; the bulk form writes the same sRGB values
    val px = new Array[Int](w * h)
    val jpegs = (0 until nFrames).map { f =>
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val v = java.lang.Math.floorMod(
            seed * 31 + (x / 16) * 7 + (y / 16) * 13 + f * 17, 256L).toInt
          px(y * w + x) = (v << 16) | (v << 8) | v
          x += 1
        }
        y += 1
      }
      img.setRGB(0, 0, w, h, px, 0, w)
      encodeJpeg(img)
    }
    assemble(jpegs, w, h, rate, scale)
  }
}
