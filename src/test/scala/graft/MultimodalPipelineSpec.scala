package graft

import org.apache.spark.sql.functions._

import graft.multimodal.{MediaCodec, MediaDoc, MediaMeta, Multimodal}

/** Multimodal plumbing (north star ⊘): binary payload + typed metadata
  * schema, batch-shaped feature extraction, column pruning on
  * metadata-only reads, and partition-stable determinism. */
class MultimodalPipelineSpec extends SparkSpec {
  import spark.implicits._

  private def docs(n: Int) = (0L until n.toLong).map { i =>
    MediaDoc(i,
      MediaMeta(if (i % 2 == 0) "png" else "wav", 64, 48, i * 10),
      Array.tabulate[Byte](128 + (i % 5).toInt * 32)(j => ((i * 17 + j) % 251).toByte))
  }

  test("feature extraction: fixed-dim schema, deterministic, batch-shaped") {
    val ds = docs(40).toDS().repartition(4)
    val feats = Multimodal.extractFeatures(ds)
    // schema is the typed contract downstream ANN ops consume
    assert(feats.schema("embedding").dataType.simpleString == "array<float>")
    val rows = feats.collect()
    assert(rows.length == 40 && rows.forall(_.embedding.length == MediaCodec.Dim))
    // repartitioning must not change any feature (stub is payload-pure)
    val again = Multimodal.extractFeatures(ds.repartition(7)).collect()
    assert(rows.sortBy(_.mediaId).toSeq == again.sortBy(_.mediaId).toSeq)
  }

  test("payload+meta survive parquet; metadata query prunes the blob column") {
    val dir = tmpDir("mm") + "/media"
    docs(20).toDS().write.mode("overwrite").parquet(dir)
    val stats = Multimodal.metaStats(spark, dir)
    val readSchema = stats.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      .linesIterator.find(_.trim.startsWith("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("payload"),
      s"metadata scan must not read blobs: $readSchema")
    val byFormat = stats.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byFormat == Map("png" -> 10L, "wav" -> 10L))
    // blobs byte-exact after the round-trip
    val back = spark.read.parquet(dir).orderBy("mediaId")
      .as[MediaDoc].collect()
    assert(java.util.Arrays.equals(back(3).payload, docs(20)(3).payload))
  }

  test("frame sampling stub: bounded frames, full coverage at stride") {
    val payload = Array.tabulate[Byte](100)(_.toByte)
    val frames = MediaCodec.frameSampleStub(payload, 4)
    assert(frames.length == 4 && frames.forall(_.length == 25))
    assert(MediaCodec.frameSampleStub(Array.emptyByteArray, 4).isEmpty)
  }
}
