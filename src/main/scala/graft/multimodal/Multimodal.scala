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

  /** Metadata-only projection — must never touch `payload` (parquet
    * column pruning; asserted in MultimodalSpec). */
  def metaStats(spark: SparkSession, path: String) =
    spark.read.parquet(path)
      .select(col("mediaId"), col("meta.format").as("format"),
              (col("meta.width") * col("meta.height")).as("pixels"))
      .groupBy(col("format"))
      .agg(count(lit(1)).as("n"), max(col("pixels")).as("max_pixels"))
}
