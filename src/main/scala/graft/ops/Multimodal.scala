package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed in partition-local batches.
  *
  * Image decode and resize are REAL — the JDK's headless-safe
  * `javax.imageio` (PNG/JPEG/GIF/BMP) parses the codec header for
  * metadata and re-rasters for resize. Audio decode and RMS energy are
  * REAL — `javax.sound.sampled` (WAV/AIFF/AU) parses the header and the
  * PCM stream. Byte streams no installed reader recognizes (exotic
  * codecs, video) fall back to the deterministic stubs, which is the
  * production swap-in point for additional codec libraries. Learned
  * feature extraction is a pluggable seam ([[Multimodal.MediaEncoder]],
  * mirroring [[graft.semantic.Embedder]]): the default
  * [[Multimodal.HistogramEncoder]] is a deterministic stub, because a
  * real encoder is a model forward pass this container cannot run — the
  * batch contract handed to the seam is exactly what a GPU encoder
  * wants.
  */
object Multimodal {

  // ImageIO must never touch a display; executors set this once per JVM
  System.setProperty("java.awt.headless", "true")
  // ImageIO's default stream cache is DISK-backed: every
  // createImageInputStream/read over an in-memory byte array spills
  // through a temp file, so a corpus decode pays one file create+write+
  // delete per image and its latency rides disk state (the observed
  // 0.2 s ↔ 1.0 s swings on identical inputs). All media arrive as
  // byte-array columns here — cache in memory.
  javax.imageio.ImageIO.setUseCache(false)

  final case class MediaMeta(format: String, width: Int, height: Int, sizeBytes: Long)
  final case class MediaRow(id: Long, bytes: Array[Byte])
  final case class FeatureRow(id: Long, meta: MediaMeta, features: Array[Float])

  /** Pluggable learned-feature encoder — the [[graft.semantic.Embedder]]
    * counterpart for binary media (the reference splits its embedding
    * provider behind the same kind of seam, semantic.py:15-38). A real
    * deployment plugs a vision/audio model here — a GPU forward pass or
    * a network service; [[batchFeaturize]] hands it partition-local
    * batches of at most [[batchSize]] rows, exactly one forward pass per
    * call. The default [[HistogramEncoder]] is the deterministic offline
    * stand-in, so the Spark-side plumbing (schema, partitioning, batch
    * shape) is real and tested even where the model cannot run. */
  trait MediaEncoder extends Serializable {
    def dim: Int
    /** Max rows per [[encode]] call (one model forward pass). */
    def batchSize: Int = 32
    /** Encode one batch of media byte streams — must return exactly one
      * `dim`-length vector per input, in input order. */
    def encode(batch: Seq[Array[Byte]]): Seq[Array[Float]]
  }

  /** Deterministic offline [[MediaEncoder]]: L2-normalized byte-bucket
    * histogram ([[featuresStub]]) — no model, reproducible anywhere. */
  final case class HistogramEncoder(override val dim: Int = 64,
      override val batchSize: Int = 32) extends MediaEncoder {
    def encode(batch: Seq[Array[Byte]]): Seq[Array[Float]] =
      batch.map(featuresStub(_, dim))
  }

  /** Real decode via ImageIO: header-only read (no full raster) for
    * format + dimensions. Falls back to [[decodeImageStub]] when no
    * installed reader recognizes the bytes. */
  def decodeImage(bytes: Array[Byte]): MediaMeta = {
    if (bytes == null || bytes.isEmpty) return decodeImageStub(bytes)
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) decodeImageStub(bytes)
      else {
        val r = readers.next()
        try {
          r.setInput(iis)
          MediaMeta(r.getFormatName.toLowerCase, r.getWidth(0), r.getHeight(0),
            bytes.length.toLong)
        } finally r.dispose()
      }
    } catch { case _: Exception => decodeImageStub(bytes) }
    finally if (iis != null) iis.close()
  }

  /** Real resize: full decode, bilinear re-raster to (targetW, targetH),
    * PNG re-encode. Non-image bytes fall back to [[resizeStub]]. */
  def resizeImage(bytes: Array[Byte], targetW: Int, targetH: Int): Array[Byte] = {
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case _: Exception => null }
    if (img == null) resizeStub(bytes, targetW, targetH)
    else {
      val out = new java.awt.image.BufferedImage(targetW, targetH,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = out.createGraphics()
      try {
        g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(img, 0, 0, targetW, targetH, null)
      } finally g.dispose()
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(out, "png", bos)
      bos.toByteArray
    }
  }

  /** STUB decode fallback: deterministic fake metadata derived from the
    * byte content, for byte streams no installed codec recognizes. */
  def decodeImageStub(bytes: Array[Byte]): MediaMeta = {
    val h = if (bytes == null || bytes.isEmpty) 0L
      else graft.functions.Hash64.hashString(java.util.Base64.getEncoder.encodeToString(bytes))
    val fmts = Array("png", "jpeg", "webp")
    MediaMeta(
      format = fmts(java.lang.Math.floorMod(h, 3L).toInt),
      width = 64 + java.lang.Math.floorMod(h >>> 8, 1024L).toInt,
      height = 64 + java.lang.Math.floorMod(h >>> 24, 1024L).toInt,
      sizeBytes = if (bytes == null) 0L else bytes.length.toLong)
  }

  /** STUB feature extractor: hash bytes into a dim-bucket histogram,
    * L2-normalized (a real impl runs a vision/audio encoder — this is
    * the one genuinely un-runnable step in this container). Reached as
    * the default [[MediaEncoder]] ([[HistogramEncoder]]); plug a real
    * encoder into [[batchFeaturize]] to replace it. */
  def featuresStub(bytes: Array[Byte], dim: Int = 64): Array[Float] = {
    val v = new Array[Float](dim)
    if (bytes == null) return v // null media column: zero vector, no NPE
    var i = 0
    while (i < bytes.length) {
      v(java.lang.Math.floorMod(bytes(i).toInt, dim)) += 1.0f
      i += 1
    }
    var norm = 0.0
    i = 0
    while (i < dim) { norm += v(i).toDouble * v(i); i += 1 }
    if (norm > 0) { val inv = (1.0 / math.sqrt(norm)).toFloat
      i = 0; while (i < dim) { v(i) *= inv; i += 1 } }
    v
  }

  // ------------------------------------------------------------- audio

  final case class AudioMeta(format: String, sampleRate: Int, channels: Int,
      frames: Long, durationMs: Long, sizeBytes: Long)
  final case class AudioFeatureRow(id: Long, meta: AudioMeta, rms: Array[Float])

  /** Real audio decode via `javax.sound.sampled` (WAV/AIFF/AU readers
    * ship with the JDK): container + PCM format from the header, no
    * sample data read. Unrecognized byte streams fall back to
    * [[decodeAudioStub]] — the swap-in point for mp3/ogg codec libs. */
  def decodeAudio(bytes: Array[Byte]): AudioMeta = {
    if (bytes == null || bytes.isEmpty) return decodeAudioStub(bytes)
    // canonical PCM16 WAV: all the metadata is in the header the fast
    // path already walks — same values the JDK's WaveFileReader derives
    // (frames = data bytes / frame size; frameRate = sampleRate for PCM)
    parseWavPcm16(bytes) match {
      case Some(w) =>
        val frames = (w.dataLen / (2 * w.channels)).toLong
        return AudioMeta("wav", w.sampleRate, w.channels, frames,
          (frames * 1000.0 / w.sampleRate).toLong, bytes.length.toLong)
      case None => ()
    }
    try {
      val aff = javax.sound.sampled.AudioSystem.getAudioFileFormat(
        new java.io.ByteArrayInputStream(bytes))
      val fmt = aff.getFormat
      val frames = aff.getFrameLength.toLong
      val durMs =
        if (fmt.getFrameRate > 0 && frames >= 0)
          (frames * 1000.0 / fmt.getFrameRate).toLong
        else 0L
      AudioMeta(aff.getType.getExtension.toLowerCase, fmt.getSampleRate.toInt,
        fmt.getChannels, frames, durMs, bytes.length.toLong)
    } catch { case _: Exception => decodeAudioStub(bytes) }
  }

  /** STUB audio decode fallback: deterministic fake metadata for byte
    * streams no installed reader recognizes. */
  def decodeAudioStub(bytes: Array[Byte]): AudioMeta = {
    val h = if (bytes == null || bytes.isEmpty) 0L
      else graft.functions.Hash64.hashString(java.util.Base64.getEncoder.encodeToString(bytes))
    val fmts = Array("mp3", "ogg", "flac")
    val rates = Array(8000, 16000, 44100)
    AudioMeta(
      format = fmts(java.lang.Math.floorMod(h, 3L).toInt),
      sampleRate = rates(java.lang.Math.floorMod(h >>> 8, 3L).toInt),
      channels = 1 + java.lang.Math.floorMod(h >>> 16, 2L).toInt,
      frames = 1000 + java.lang.Math.floorMod(h >>> 24, 100000L),
      durationMs = 0L,
      sizeBytes = if (bytes == null) 0L else bytes.length.toLong)
  }

  /** Canonical-WAV header facts the fast path needs: absolute data-chunk
    * offset/length plus the PCM16 layout. None for anything that is not
    * a well-formed little-endian PCM16 RIFF/WAVE — those take the JDK
    * SPI path instead. */
  private final case class WavPcm16(dataOff: Int, dataLen: Int,
      channels: Int, sampleRate: Int)

  @inline private def le16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8)
  @inline private def le32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8) |
    ((b(o + 2) & 0xFF) << 16) | ((b(o + 3) & 0xFF) << 24)

  /** Minimal RIFF/WAVE chunk walk for the decode fast path. The JDK's
    * `AudioSystem` reaches the same facts through an SPI provider scan
    * and a stream parse per call — measured as the dominant cost of the
    * audio pipeline at 5 000 rows, twice per row (header for meta, full
    * stream for RMS). Canonical PCM16 WAV (the overwhelmingly common
    * case for a pretraining audio corpus, and everything
    * [[syntheticWav]] emits) is a few dozen byte reads; anything else —
    * other containers, compressed layouts, malformed chunks — returns
    * None and falls back to the JDK path, so coverage is unchanged.
    * Byte-exact parity with the JDK path is pinned in OpsSpec. */
  private def parseWavPcm16(b: Array[Byte]): Option[WavPcm16] = {
    if (b == null || b.length < 44) return None
    if (b(0) != 'R' || b(1) != 'I' || b(2) != 'F' || b(3) != 'F' ||
        b(8) != 'W' || b(9) != 'A' || b(10) != 'V' || b(11) != 'E') return None
    // the walk offset is a Long: a malformed chunk declaring a size near
    // Int.MaxValue must advance past the buffer and end the loop, not
    // wrap `off` negative and index out of bounds — this path runs
    // OUTSIDE the JDK fallback's try/catch, so an escape here would
    // kill the task on one corrupt corpus file
    var off = 12L
    var ch = -1; var rate = -1; var fmtOk = false
    var dataOff = -1; var dataLen = -1
    while (off + 8 <= b.length && (dataOff < 0 || !fmtOk)) {
      val oi = off.toInt // in-bounds by the loop guard
      val sz = le32(b, oi + 4)
      if (sz < 0) return None
      val isFmt = b(oi) == 'f' && b(oi + 1) == 'm' && b(oi + 2) == 't' && b(oi + 3) == ' '
      val isData = b(oi) == 'd' && b(oi + 1) == 'a' && b(oi + 2) == 't' && b(oi + 3) == 'a'
      if (isFmt && sz >= 16 && off + 24 <= b.length) {
        val audioFormat = le16(b, oi + 8)
        val bits = le16(b, oi + 22)
        ch = le16(b, oi + 10); rate = le32(b, oi + 12)
        fmtOk = audioFormat == 1 && bits == 16 && ch > 0 && rate > 0
      } else if (isData) {
        dataOff = oi + 8
        dataLen = math.min(sz.toLong, (b.length - dataOff).toLong).toInt
      }
      // RIFF chunks are word-aligned
      off += 8L + sz + (sz & 1)
    }
    if (fmtOk && dataOff > 0 && dataLen >= 2 * ch) Some(WavPcm16(dataOff, dataLen, ch, rate))
    else None
  }

  /** One-pass windowed RMS straight off the WAV data chunk — no
    * AudioInputStream, no intermediate sample array. Arithmetic order
    * matches the JDK path exactly (per-sample channel mean, then
    * squared-sum per window) so the two paths are bit-identical. */
  private def rmsFromPcm16Le(b: Array[Byte], w: WavPcm16, windows: Int): Array[Float] = {
    val ch = w.channels
    val n = w.dataLen / 2 / ch
    val v = new Array[Float](windows)
    val per = math.max(1, (n + windows - 1) / windows)
    var win = 0
    while (win < windows) {
      val from = win * per
      val to = math.min(n, from + per)
      if (from < to) {
        var acc = 0.0
        var i = from
        if (ch == 1) {
          var o = w.dataOff + from * 2
          while (i < to) {
            val s = (((b(o + 1) << 8) | (b(o) & 0xFF)).toShort) / 32768.0
            acc += s * s
            i += 1; o += 2
          }
        } else {
          while (i < to) {
            var sacc = 0.0
            var c = 0
            while (c < ch) {
              val o = w.dataOff + (i * ch + c) * 2
              sacc += (((b(o + 1) << 8) | (b(o) & 0xFF)).toShort) / 32768.0
              c += 1
            }
            val m = sacc / ch
            acc += m * m
            i += 1
          }
        }
        v(win) = math.sqrt(acc / (to - from)).toFloat
      }
      win += 1
    }
    v
  }

  /** REAL audio feature: per-window root-mean-square energy over the
    * decoded PCM stream (signed 16-bit; other sample layouts fall back
    * to a byte-histogram via [[featuresStub]]). Channels are averaged to
    * mono before windowing. A pure sine of amplitude A yields ≈ A/√2
    * per covered window — pinned in OpsSpec. Canonical PCM16 WAVs take
    * [[rmsFromPcm16Le]] (bit-identical, ~an order of magnitude cheaper);
    * everything else decodes through the JDK SPI below. */
  def audioRms(bytes: Array[Byte], windows: Int = 16): Array[Float] = {
    if (bytes != null) parseWavPcm16(bytes) match {
      case Some(w) => return rmsFromPcm16Le(bytes, w, windows)
      case None => ()
    }
    audioRmsJdk(bytes, windows)
  }

  /** The JDK-SPI RMS path: handles every container/layout an installed
    * `javax.sound.sampled` reader recognizes. Kept as the fallback and
    * as the parity reference for the fast path. */
  private[graft] def audioRmsJdk(bytes: Array[Byte], windows: Int = 16): Array[Float] = {
    val samples = try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val fmt = in.getFormat
        if (fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED ||
            fmt.getSampleSizeInBits != 16) null
        else {
          val raw = in.readAllBytes()
          val ch = fmt.getChannels
          val be = fmt.isBigEndian
          val n = raw.length / 2 / ch
          val out = new Array[Double](n)
          var i = 0
          while (i < n) {
            var acc = 0.0
            var c = 0
            while (c < ch) {
              val o = (i * ch + c) * 2
              val s = if (be) ((raw(o) << 8) | (raw(o + 1) & 0xFF)).toShort
                      else ((raw(o + 1) << 8) | (raw(o) & 0xFF)).toShort
              acc += s / 32768.0
              c += 1
            }
            out(i) = acc / ch
            i += 1
          }
          out
        }
      } finally in.close()
    } catch { case _: Exception => null }
    if (samples == null || samples.length == 0)
      return featuresStub(if (bytes == null) Array.emptyByteArray else bytes, windows)
    val v = new Array[Float](windows)
    val per = math.max(1, (samples.length + windows - 1) / windows)
    var w = 0
    while (w < windows) {
      val from = w * per
      val to = math.min(samples.length, from + per)
      if (from < to) {
        var acc = 0.0
        var i = from
        while (i < to) { acc += samples(i) * samples(i); i += 1 }
        v(w) = math.sqrt(acc / (to - from)).toFloat
      }
      w += 1
    }
    v
  }

  /** Batch audio pipeline: binary rows → (typed meta, per-window RMS),
    * partition-local batches, no shuffle — the same batch contract as
    * [[batchFeaturize]] so a learned audio encoder slots in unchanged. */
  def batchAudioFeaturize(media: Dataset[MediaRow], batchSize: Int = 32,
      windows: Int = 16): Dataset[AudioFeatureRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.map(r => AudioFeatureRow(r.id, decodeAudio(r.bytes), audioRms(r.bytes, windows)))
      }
    }
  }

  /** Deterministic tiny WAV derived from a text: 16-bit PCM mono sine
    * whose frequency, amplitude, and length come from the text's hash
    * (same text ⇒ byte-identical file) — the demo source feeds the
    * pipeline REAL decodable audio, like [[syntheticPng]] for images. */
  def syntheticWav(text: String): Array[Byte] = {
    val h0 = graft.functions.Hash64.hashString(if (text == null) "" else text)
    val rate = 8000f
    val n = 400 + java.lang.Math.floorMod(h0, 800L).toInt
    val freq = 200.0 + java.lang.Math.floorMod(h0 >>> 8, 1800L)
    val amp = 0.2 + java.lang.Math.floorMod(h0 >>> 16, 60L) / 100.0
    val raw = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val s = (math.sin(2 * math.Pi * freq * i / rate) * amp * 32767.0).toInt
      raw(i * 2) = (s & 0xFF).toByte
      raw(i * 2 + 1) = ((s >> 8) & 0xFF).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(rate, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(raw), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Demo source: a deterministic REAL WAV per row, derived from a
    * string column. */
  def syntheticAudio(df: DataFrame, idCol: String, textCol: String): Dataset[MediaRow] = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long").as("id"), col(textCol).as("text"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, text) => MediaRow(id, syntheticWav(text)) })
  }

  /** STUB frame sampler: every-nth 16-byte slice stands in for video
    * frame extraction. */
  def frameSampleStub(bytes: Array[Byte], everyN: Int): Seq[Array[Byte]] =
    bytes.grouped(16).zipWithIndex.collect {
      case (frame, i) if i % everyN == 0 => frame
    }.toSeq

  /** STUB resize fallback for non-image bytes: deterministic byte
    * downsampling to a target "pixel" budget. Output size is
    * min(input, targetW*targetH) — monotone like a real downscale. */
  def resizeStub(bytes: Array[Byte], targetW: Int, targetH: Int): Array[Byte] = {
    if (bytes == null) return Array.emptyByteArray // null media column
    val budget = targetW * targetH
    if (bytes.length <= budget) bytes
    else {
      val out = new Array[Byte](budget)
      var i = 0
      while (i < budget) {
        out(i) = bytes((i.toLong * bytes.length / budget).toInt)
        i += 1
      }
      out
    }
  }

  final case class ResizedRow(id: Long, bytes: Array[Byte], meta: MediaMeta)

  /** Batch resize pipeline: binary rows → resized binary + target-dim
    * metadata, partition-local, no shuffle — same batch contract as
    * [[batchFeaturize]] so a GPU image pipeline slots in unchanged. */
  def batchResize(media: Dataset[MediaRow], targetW: Int = 224, targetH: Int = 224,
      batchSize: Int = 32): Dataset[ResizedRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val rb = resizeImage(r.bytes, targetW, targetH)
          ResizedRow(r.id, rb,
            decodeImage(r.bytes).copy(width = targetW, height = targetH,
              sizeBytes = rb.length.toLong))
        }
      }
    }
  }

  /** The batch featurize pipeline: binary rows → (meta, features) in
    * partition-local batches of `encoder.batchSize` — the exact batch
    * shape a GPU-backed encoder wants. No shuffle: one pass over the
    * data; the encoder is serialized once per task. */
  def batchFeaturize(media: Dataset[MediaRow], encoder: MediaEncoder): Dataset[FeatureRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.grouped(encoder.batchSize).flatMap { batch =>
        // batch boundary = one encoder forward pass
        val feats = encoder.encode(batch.map(_.bytes))
        require(feats.length == batch.length,
          s"MediaEncoder returned ${feats.length} vectors for ${batch.length} inputs")
        batch.lazyZip(feats).map((r, f) => FeatureRow(r.id, decodeImage(r.bytes), f))
      }
    }
  }

  /** [[batchFeaturize]] with the deterministic default encoder. */
  def batchFeaturize(media: Dataset[MediaRow], batchSize: Int = 32,
      dim: Int = 64): Dataset[FeatureRow] =
    batchFeaturize(media, HistogramEncoder(dim, batchSize))

  /** Deterministic tiny PNG derived from a text: dimensions and pixels
    * both come from the text's hash (same text ⇒ byte-identical image),
    * so the demo source feeds the pipeline REAL decodable images. */
  def syntheticPng(text: String): Array[Byte] = {
    val h0 = graft.functions.Hash64.hashString(if (text == null) "" else text)
    val w = 8 + java.lang.Math.floorMod(h0, 24L).toInt
    val ht = 8 + java.lang.Math.floorMod(h0 >>> 8, 24L).toInt
    val img = new java.awt.image.BufferedImage(w, ht,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var seed = h0
    var y = 0
    while (y < ht) {
      var x = 0
      while (x < w) {
        seed = seed * 6364136223846793005L + 1442695040888963407L
        img.setRGB(x, y, ((seed >>> 40) & 0xFFFFFFL).toInt)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Demo source: a deterministic REAL PNG per row, derived from a string
    * column (stands in for reading real media files — and exercises the
    * true ImageIO decode path end to end). */
  def syntheticMedia(df: DataFrame, idCol: String, textCol: String): Dataset[MediaRow] = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long").as("id"), col(textCol).as("text"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, text) => MediaRow(id, syntheticPng(text)) })
  }
}
