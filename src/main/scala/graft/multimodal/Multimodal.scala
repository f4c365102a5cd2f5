package graft.multimodal

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
  * THE DECODE STEP IS A STUB: this container has no image/audio codecs,
  * so `MediaCodec` produces deterministic fake outputs from the raw
  * bytes. Everything AROUND the stub — schemas, typed metadata, batch
  * iteration, partitioning, parquet round-trips — is real and tested
  * (MultimodalSpec). Swapping in javacv/ffmpeg touches only MediaCodec.
  *
  * Scale notes (100 TB of media):
  *  - payloads dominate size → repartition by id range so tasks get
  *    even byte volume, not even row counts (media sizes are skewed).
  *  - features (small, fixed-dim) are written to a SEPARATE table from
  *    payloads so downstream analytics never re-reads the blobs; parquet
  *    column pruning already avoids materializing `payload` for
  *    metadata-only queries.
  */
final case class MediaMeta(
    format: String, width: Int, height: Int, durationMs: Long)

final case class MediaDoc(mediaId: Long, meta: MediaMeta, payload: Array[Byte])

final case class MediaFeatures(
    mediaId: Long, nBytes: Int, digest: String, embedding: Seq[Float])

/** STUB decoder — deterministic stand-in for a real codec. */
object MediaCodec {
  val Dim = 16

  /** "Decode" + "embed": fake feature vector from byte statistics.
    * Deterministic in the payload alone (safe under task retries). */
  def embedStub(payload: Array[Byte]): Array[Float] = {
    val out = new Array[Float](Dim)
    var i = 0
    while (i < payload.length) {
      out(i % Dim) += (payload(i) & 0xff) / 255.0f
      i += 1
    }
    out
  }

  /** "Frame-sample": every stride-th byte window stands in for a frame. */
  def frameSampleStub(payload: Array[Byte], frames: Int): Seq[Array[Byte]] = {
    if (payload.isEmpty || frames < 1) Seq.empty
    else {
      val stride = math.max(1, payload.length / frames)
      (0 until math.min(frames, payload.length))
        .map(f => payload.slice(f * stride,
          math.min(f * stride + stride, payload.length)))
    }
  }

  /** "Resize": deterministic byte-domain downsample standing in for an
    * image rescale — keeps every k-th byte so output size tracks the
    * target dimensions. A real impl swaps in the codec here; the
    * surrounding operator contract (new meta dims, smaller payload,
    * determinism) is what the pipeline relies on. */
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
    * whole-partition iteration (the mapInPandas batch contract). */
  def extractFeatures(docs: Dataset[MediaDoc]): Dataset[MediaFeatures] = {
    import docs.sparkSession.implicits._
    docs.mapPartitions { batch =>
      // per-task setup cost paid once per partition, not per row —
      // a real impl would open the codec/ONNX session here
      val md = java.security.MessageDigest.getInstance("MD5")
      batch.map { doc =>
        md.reset()
        val digest = md.digest(doc.payload).map("%02x".format(_)).mkString
        MediaFeatures(doc.mediaId, doc.payload.length, digest,
          MediaCodec.embedStub(doc.payload).toSeq)
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
      // real impl: open the demuxer once per partition here
      batch.flatMap { doc =>
        MediaCodec.frameSampleStub(doc.payload, frames).zipWithIndex
          .map { case (frame, idx) => (doc.mediaId, idx, frame) }
      }
    }
  }

  /** Resize as a Dataset operator: payload shrinks toward the target
    * dims, metadata is rewritten to match — the schema contract a real
    * codec swap must preserve. */
  def resize(docs: Dataset[MediaDoc], newW: Int, newH: Int): Dataset[MediaDoc] = {
    import docs.sparkSession.implicits._
    docs.mapPartitions { batch =>
      batch.map { doc =>
        doc.copy(
          meta = doc.meta.copy(width = newW, height = newH),
          payload = MediaCodec.resizeStub(
            doc.payload, doc.meta.width, doc.meta.height, newW, newH))
      }
    }
  }

  /** Metadata-only projection — must never touch `payload` (parquet
    * column pruning; asserted in MultimodalSpec). */
  def metaStats(spark: SparkSession, path: String) =
    spark.read.parquet(path)
      .select(col("mediaId"), col("meta.format").as("format"),
              // long multiply: gigapixel dims overflow Int
              (col("meta.width").cast("long") * col("meta.height"))
                .as("pixels"))
      .groupBy(col("format"))
      .agg(count(lit(1)).as("n"), max(col("pixels")).as("max_pixels"))
}
