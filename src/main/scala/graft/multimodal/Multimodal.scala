package graft.multimodal

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns (north star): image/audio/video as opaque
  * `binary` payloads with typed metadata, processed by batch-shaped
  * per-partition pipelines.
  *
  * The reference stores `uint8[]` blobs as opaque LargeBinary
  * [upstream: ros_sql/ros2sql.py — uint8[] mapping]; we keep the same
  * contract (BinaryType, never shredded) and add the processing harness a
  * training-data pipeline needs: decode → feature-extract → downsample,
  * run as `mapPartitions` so each task amortizes decoder setup over a
  * whole partition — the JVM analog of `mapInPandas`' batch contract.
  *
  * THE IMAGE CODEC IS REAL: `MediaCodec.decodeImage` /
  * `MediaCodec.resizeImage` run the JDK's `javax.imageio` PNG/JPEG/GIF/BMP
  * readers (zero new dependencies), so planted PNGs decode to their true
  * dimensions and pixels, and resize produces a genuinely rescaled,
  * re-encoded PNG. Frame sampling decodes REAL frames for multi-image
  * containers the JDK reads (animated GIF), and `probeAudio` parses
  * REAL WAV/AIFF/AU headers via `javax.sound.sampled` (true sample
  * rate / channels / duration). Payloads with no installed reader
  * (raw bytes, mp3/ogg, true video — this container ships no AV
  * demuxers) fall back to the deterministic byte-domain stubs,
  * clearly named `*Stub`, so the pipeline contract (fixed-dim
  * features, shrinking resize, bounded frames) holds for every
  * payload.
  *
  * Scale notes (100 TB of media):
  *  - payloads dominate size → repartition by id range so tasks get
  *    even byte volume, not even row counts (media sizes are skewed).
  *  - features (small, fixed-dim) are written to a SEPARATE table from
  *    payloads so downstream analytics never re-reads the blobs; parquet
  *    column pruning already avoids materializing `payload` for
  *    metadata-only queries.
  *  - decode cost is per-blob CPU with no shuffle: the codec runs inside
  *    the scan stage's `mapPartitions`, and only the small decoded
  *    features/metadata ever reach an exchange.
  */
final case class MediaMeta(
    format: String, width: Int, height: Int, durationMs: Long)

final case class MediaDoc(mediaId: Long, meta: MediaMeta, payload: Array[Byte])

final case class MediaFeatures(
    mediaId: Long, nBytes: Int, digest: String, embedding: Seq[Float])

/** A really-decoded image: format sniffed by the reader that accepted
  * the bytes, true raster dimensions, and the exact gray-channel pixel
  * sum (luminance for color images) — the lossless-decode witness the
  * oracle-gated `q_multimodal_decode` hashes against. */
final case class DecodedImage(
    format: String, width: Int, height: Int, graySum: Long)

/** Image codec on JDK `javax.imageio` (PNG/JPEG/GIF/BMP — the readers
  * every JRE ships); deterministic byte-domain stubs remain as the
  * documented fallback for payloads with no installed codec. */
object MediaCodec {
  val Dim = 16

  // in-memory image streams: the default FileCacheImageInputStream
  // would spill every blob to a temp file — per-row disk I/O inside
  // the scan stage. One-time JVM-global switch, executor-side safe.
  ImageIO.setUseCache(false)

  /** Decode + identify in one pass: the reader that accepts the byte
    * stream names the format; the raster gives true dims; graySum is
    * the exact sum of 8-bit gray samples (TYPE_BYTE_GRAY rasters read
    * sample-exact — PNG grayscale is lossless) or of luminance for
    * color models. None = no installed reader recognizes the bytes. */
  def decodeImage(payload: Array[Byte]): Option[DecodedImage] = {
    if (payload == null || payload.length < 8) return None
    val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(payload))
    try {
      val readers = ImageIO.getImageReaders(iis)
      if (!readers.hasNext) return None
      val reader = readers.next()
      try {
        reader.setInput(iis, true, true)
        val img = reader.read(0)
        val fmt = reader.getFormatName.toLowerCase(java.util.Locale.ROOT)
        Some(DecodedImage(fmt, img.getWidth, img.getHeight, graySum(img)))
      } finally reader.dispose()
    } catch { case scala.util.control.NonFatal(_) => None }
    finally iis.close()
  }

  private def graySum(img: BufferedImage): Long = {
    var s = 0L
    if (img.getType == BufferedImage.TYPE_BYTE_GRAY) {
      // sample-exact path: no color-space conversion
      val r = img.getRaster
      var y = 0
      while (y < img.getHeight) {
        var x = 0
        while (x < img.getWidth) { s += r.getSample(x, y, 0); x += 1 }
        y += 1
      }
    } else {
      // integer ITU-R 601 luminance — deterministic across JVMs
      var y = 0
      while (y < img.getHeight) {
        var x = 0
        while (x < img.getWidth) {
          val rgb = img.getRGB(x, y)
          s += (299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff) +
            114 * (rgb & 0xff)) / 1000
          x += 1
        }
        y += 1
      }
    }
    s
  }

  /** Deterministic grayscale PNG test card: pixel(x,y) =
    * (seed*31 + x*7 + y*13) mod 256, written through the real ImageIO
    * PNG encoder. The generating formula is closed-form SQL, so a
    * DuckDB oracle can recompute the decoded graySum independently —
    * the encode→decode loop is what the hash gate then proves. */
  def encodeTestCardPng(seed: Long, w: Int, h: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    val r = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        r.setSample(x, y, 0,
          (((seed * 31 + x * 7 + y * 13) % 256) + 256) % 256)
        x += 1
      }
      y += 1
    }
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Real image resize: decode, area-scale through Graphics2D, re-encode
    * as PNG (lossless, format-normalizing — the shape a training
    * pipeline's image-normalization stage has). Falls back to the
    * byte-domain stub when no reader recognizes the payload. */
  def resizeImage(payload: Array[Byte], newW: Int, newH: Int)
      : Option[Array[Byte]] = {
    if (payload == null || payload.length < 8 || newW < 1 || newH < 1)
      return None
    try {
      val src = ImageIO.read(new ByteArrayInputStream(payload))
      if (src == null) None
      else {
        val dstType =
          if (src.getType == BufferedImage.TYPE_BYTE_GRAY)
            BufferedImage.TYPE_BYTE_GRAY
          else BufferedImage.TYPE_INT_RGB
        val dst = new BufferedImage(newW, newH, dstType)
        val g = dst.createGraphics()
        try {
          g.setRenderingHint(
            java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_NEAREST_NEIGHBOR)
          g.drawImage(src, 0, 0, newW, newH, null): Unit
        } finally g.dispose()
        val out = new ByteArrayOutputStream()
        ImageIO.write(dst, "png", out)
        Some(out.toByteArray)
      }
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Feature vector: for decodable images, the Dim-bin gray/luminance
    * histogram as pixel fractions — a real, codec-derived embedding;
    * for everything else, the deterministic byte-stat fallback. Both
    * paths are pure in the payload (safe under task retries). */
  def embed(payload: Array[Byte]): Array[Float] =
    embedImage(payload).getOrElse(embedStub(payload))

  def embedImage(payload: Array[Byte]): Option[Array[Float]] = {
    if (payload == null || payload.length < 8) return None
    try {
      val img = ImageIO.read(new ByteArrayInputStream(payload))
      if (img == null) None
      else {
        val counts = new Array[Long](Dim)
        val gray = img.getType == BufferedImage.TYPE_BYTE_GRAY
        val raster = img.getRaster
        var y = 0
        while (y < img.getHeight) {
          var x = 0
          while (x < img.getWidth) {
            val v =
              if (gray) raster.getSample(x, y, 0)
              else {
                val rgb = img.getRGB(x, y)
                (299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff) +
                  114 * (rgb & 0xff)) / 1000
              }
            counts(v * Dim / 256) += 1
            x += 1
          }
          y += 1
        }
        val n = img.getWidth.toLong * img.getHeight
        Some(counts.map(c => c.toFloat / n))
      }
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** FALLBACK "embed" for undecodable payloads: fake feature vector
    * from byte statistics. Deterministic in the payload alone. */
  def embedStub(payload: Array[Byte]): Array[Float] = {
    val out = new Array[Float](Dim)
    var i = 0
    while (i < payload.length) {
      out(i % Dim) += (payload(i) & 0xff) / 255.0f
      i += 1
    }
    out
  }

  /** REAL frame sampling for multi-image containers the JDK can read
    * (animated GIF — the one multi-frame format javax.imageio ships a
    * reader for): sample `frames` evenly spaced frames from the
    * sequence and re-encode each as PNG. None when the payload is not
    * a multi-frame image (true video needs a demuxer this classpath
    * does not have — those fall back to [[frameSampleStub]]). */
  def frameSampleImage(payload: Array[Byte], frames: Int)
      : Option[Seq[Array[Byte]]] = {
    if (payload == null || payload.length < 8 || frames < 1) return None
    val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(payload))
    try {
      val readers = ImageIO.getImageReaders(iis)
      if (!readers.hasNext) return None
      val reader = readers.next()
      try {
        reader.setInput(iis, false, true)
        val n = reader.getNumImages(true)
        if (n < 2) None // single image: not a frame sequence
        else {
          val take = math.min(frames, n)
          val idxs = (0 until take).map(f => f * n / take)
          Some(idxs.map { i =>
            val out = new ByteArrayOutputStream()
            ImageIO.write(reader.read(i), "png", out)
            out.toByteArray
          })
        }
      } finally reader.dispose()
    } catch { case scala.util.control.NonFatal(_) => None }
    finally iis.close()
  }

  /** Audio metadata probe on JDK `javax.sound.sampled` (WAV/AIFF/AU —
    * the parsers every JRE ships): true sample rate, channel count,
    * frame count → duration. None for formats with no installed
    * provider (mp3/ogg — those keep their caller-supplied metadata). */
  def probeAudio(payload: Array[Byte]): Option[MediaMeta] = {
    if (payload == null || payload.length < 12) return None
    try {
      val aff = javax.sound.sampled.AudioSystem.getAudioFileFormat(
        new ByteArrayInputStream(payload))
      val fmt = aff.getFormat
      val frames = aff.getFrameLength
      val durMs =
        if (frames > 0 && fmt.getFrameRate > 0)
          (frames * 1000L / fmt.getFrameRate.toLong)
        else 0L
      Some(MediaMeta(
        aff.getType.getExtension.toLowerCase(java.util.Locale.ROOT),
        // width/height carry sampleRate/channels for audio rows — the
        // schema stays one struct across modalities (documented shape)
        fmt.getSampleRate.toInt, fmt.getChannels, durMs))
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** FALLBACK "frame-sample": every stride-th byte window stands in
    * for a frame — for payloads with no multi-frame reader (true
    * video). */
  def frameSampleStub(payload: Array[Byte], frames: Int): Seq[Array[Byte]] = {
    if (payload.isEmpty || frames < 1) Seq.empty
    else {
      val stride = math.max(1, payload.length / frames)
      (0 until math.min(frames, payload.length))
        .map(f => payload.slice(f * stride,
          math.min(f * stride + stride, payload.length)))
    }
  }

  /** FALLBACK "resize" for undecodable payloads: deterministic
    * byte-domain downsample — keeps every k-th byte so output size
    * tracks the target dimensions. */
  def resizeStub(payload: Array[Byte], w: Int, h: Int,
                 newW: Int, newH: Int): Array[Byte] = {
    // pixel counts in Long: 65536x65536 overflows Int multiply to 0
    if (payload.isEmpty || w.toLong * h == 0L || newW.toLong * newH == 0L)
      Array.emptyByteArray
    else {
      val ratio = math.max(1L,
        (w.toLong * h) / math.max(1L, newW.toLong * newH)).toInt
      payload.indices.collect { case i if i % ratio == 0 => payload(i) }
        .toArray
    }
  }
}

object Multimodal {

  /** Batch feature extraction: one decoder "session" per partition,
    * whole-partition iteration (the mapInPandas batch contract).
    * Decodable images get real histogram features (`MediaCodec.embed`);
    * other payloads get the byte-stat fallback — the schema is one
    * fixed-dim embedding either way. */
  def extractFeatures(docs: Dataset[MediaDoc]): Dataset[MediaFeatures] = {
    import docs.sparkSession.implicits._
    docs.mapPartitions { batch =>
      // per-task setup cost paid once per partition, not per row —
      // a heavier impl would open an ONNX session here; ImageIO readers
      // are instantiated per image but cached at the registry level
      val md = java.security.MessageDigest.getInstance("MD5")
      batch.map { doc =>
        md.reset()
        val digest = md.digest(doc.payload).map("%02x".format(_)).mkString
        MediaFeatures(doc.mediaId, doc.payload.length, digest,
          MediaCodec.embed(doc.payload).toSeq)
      }
    }
  }

  /** Frame sampling as a Dataset operator: one (mediaId, frameIdx,
    * frame) row per sampled frame, one decoder session per partition.
    * Downstream per-frame work (captioning, embedding) then hangs off
    * a normal exploded table instead of re-decoding the video. */
  def sampleFrames(docs: Dataset[MediaDoc],
                   frames: Int): Dataset[(Long, Int, Array[Byte])] = {
    import docs.sparkSession.implicits._
    docs.mapPartitions { batch =>
      // multi-frame images (GIF) decode for real; anything without a
      // frame-sequence reader takes the byte-window fallback
      batch.flatMap { doc =>
        MediaCodec.frameSampleImage(doc.payload, frames)
          .getOrElse(MediaCodec.frameSampleStub(doc.payload, frames))
          .zipWithIndex
          .map { case (frame, idx) => (doc.mediaId, idx, frame) }
      }
    }
  }

  /** Resize as a Dataset operator: decodable images go through the real
    * ImageIO rescale + PNG re-encode (format normalizes to png, the
    * decoded output really is newW×newH — MultimodalPipelineSpec
    * asserts it); undecodable payloads take the byte-domain fallback
    * with metadata rewritten to match. */
  def resize(docs: Dataset[MediaDoc], newW: Int, newH: Int): Dataset[MediaDoc] = {
    import docs.sparkSession.implicits._
    docs.mapPartitions { batch =>
      batch.map { doc =>
        MediaCodec.resizeImage(doc.payload, newW, newH) match {
          case Some(png) => doc.copy(
            meta = doc.meta.copy(format = "png", width = newW, height = newH),
            payload = png)
          case None => doc.copy(
            meta = doc.meta.copy(width = newW, height = newH),
            payload = MediaCodec.resizeStub(
              doc.payload, doc.meta.width, doc.meta.height, newW, newH))
        }
      }
    }
  }

  /** Metadata-only projection — must never touch `payload` (parquet
    * column pruning; asserted in MultimodalPipelineSpec). */
  def metaStats(spark: SparkSession, path: String) =
    spark.read.parquet(path)
      .select(col("mediaId"), col("meta.format").as("format"),
              // long multiply: gigapixel dims overflow Int
              (col("meta.width").cast("long") * col("meta.height"))
                .as("pixels"))
      .groupBy(col("format"))
      .agg(count(lit(1)).as("n"), max(col("pixels")).as("max_pixels"))
}
