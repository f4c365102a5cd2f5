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

  test("sampleFrames explodes to (mediaId, frameIdx, frame) rows") {
    val out = Multimodal.sampleFrames(docs(6).toDS().repartition(3), 4)
      .collect()
    assert(out.length == 24)                    // 6 docs × 4 frames
    assert(out.map(_._1).distinct.sorted.toSeq == (0L until 6L))
    assert(out.filter(_._1 == 2L).map(_._2).sorted.toSeq == Seq(0, 1, 2, 3))
    // deterministic under repartitioning
    val again = Multimodal.sampleFrames(docs(6).toDS().repartition(5), 4)
      .collect()
    assert(out.map(t => (t._1, t._2, t._3.toSeq)).sortBy(x => (x._1, x._2)).toSeq ==
      again.map(t => (t._1, t._2, t._3.toSeq)).sortBy(x => (x._1, x._2)).toSeq)
  }

  test("real codec: planted PNG decodes to true dims and exact pixels") {
    val png = MediaCodec.encodeTestCardPng(7L, 64, 48)
    // a real PNG came out of the encoder (magic bytes), and the real
    // ImageIO reader identifies + decodes it losslessly
    assert((png(0) & 0xff) == 0x89 && png(1) == 'P' && png(2) == 'N')
    val dec = MediaCodec.decodeImage(png).get
    assert(dec.format == "png" && dec.width == 64 && dec.height == 48)
    var expect = 0L
    for (y <- 0 until 48; x <- 0 until 64)
      expect += (7L * 31 + x * 7 + y * 13) % 256
    assert(dec.graySum == expect)
    // undecodable bytes → None, so the pipeline takes the stub fallback
    assert(MediaCodec.decodeImage(Array.tabulate[Byte](64)(_.toByte)).isEmpty)
  }

  test("real resize: decoded output really is newW x newH") {
    val png = MediaCodec.encodeTestCardPng(3L, 64, 48)
    val ds = Seq(MediaDoc(0L, MediaMeta("png", 64, 48, 0L), png)).toDS()
    val out = Multimodal.resize(ds, 32, 24).collect().head
    assert(out.meta.width == 32 && out.meta.height == 24 &&
      out.meta.format == "png")
    val dec = MediaCodec.decodeImage(out.payload).get
    assert(dec.width == 32 && dec.height == 24 && dec.format == "png")
  }

  test("real embed: histogram features match the decoded pixel formula") {
    val png = MediaCodec.encodeTestCardPng(11L, 40, 30)
    val emb = MediaCodec.embed(png)
    assert(emb.length == MediaCodec.Dim)
    // exact expected histogram from the generator formula — identical
    // float arithmetic (count/n) so equality is exact, and any lossy
    // or fake decode would shift bins
    val counts = new Array[Long](MediaCodec.Dim)
    for (y <- 0 until 30; x <- 0 until 40)
      counts((((11L * 31 + 7 * x + 13 * y) % 256).toInt
        * MediaCodec.Dim / 256)) += 1
    assert(emb.toSeq == counts.map(_.toFloat / 1200).toSeq)
  }

  test("real frame sampling: animated GIF decodes to true frames") {
    import javax.imageio.{IIOImage, ImageIO}
    // build a 6-frame animated GIF through the JDK's own GIF writer;
    // frame f is a solid 10x8 gray level f*40
    val out = new java.io.ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(out)
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    for (f <- 0 until 6) {
      val img = new java.awt.image.BufferedImage(
        10, 8, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      val r = img.getRaster
      for (y <- 0 until 8; x <- 0 until 10) r.setSample(x, y, 0, f * 40)
      writer.writeToSequence(new IIOImage(img, null, null), null)
    }
    writer.endWriteSequence(); writer.dispose(); ios.close()
    val gif = out.toByteArray
    // 3 of 6 frames, evenly spaced (0, 2, 4), each a REAL decoded image
    val frames = MediaCodec.frameSampleImage(gif, 3).get
    assert(frames.length == 3)
    val decoded = frames.map(f => MediaCodec.decodeImage(f).get)
    assert(decoded.forall(d => d.width == 10 && d.height == 8))
    // GIF palettizes: levels survive approximately; frame order must be
    // strictly increasing brightness (0 < 80 < 160 picks, not byte soup)
    val sums = decoded.map(_.graySum)
    assert(sums == sums.sorted && sums.distinct.length == 3, sums.toString)
    // a single-frame PNG is NOT a frame sequence; raw bytes neither
    assert(MediaCodec.frameSampleImage(
      MediaCodec.encodeTestCardPng(1L, 8, 8), 3).isEmpty)
    assert(MediaCodec.frameSampleImage(
      Array.tabulate[Byte](64)(_.toByte), 3).isEmpty)
    // and the Dataset operator routes GIFs through the real path
    val ds = Seq(MediaDoc(7L, MediaMeta("gif", 10, 8, 0L), gif)).toDS()
    val sampled = Multimodal.sampleFrames(ds, 3).collect()
    assert(sampled.length == 3 &&
      sampled.forall(t => MediaCodec.decodeImage(t._3).isDefined))
  }

  test("real audio probe: planted WAV header yields true rate/channels") {
    import javax.sound.sampled._
    val fmt = new AudioFormat(8000f, 16, 1, true, false)
    val pcm = new Array[Byte](8000 * 2) // exactly 1 s of 16-bit mono
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, 8000)
    val out = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, out)
    val meta = MediaCodec.probeAudio(out.toByteArray).get
    // width/height carry sampleRate/channels for audio (documented)
    assert(meta.format == "wav" && meta.width == 8000 &&
      meta.height == 1 && meta.durationMs == 1000L, meta.toString)
    // non-audio payloads probe as None (callers keep their metadata)
    assert(MediaCodec.probeAudio(
      MediaCodec.encodeTestCardPng(1L, 8, 8)).isEmpty)
  }

  test("resize rewrites metadata and shrinks payloads proportionally") {
    val ds = docs(8).toDS()
    val resized = Multimodal.resize(ds, 32, 24).collect().sortBy(_.mediaId)
    val orig = docs(8)
    resized.zip(orig).foreach { case (r, o) =>
      assert(r.meta.width == 32 && r.meta.height == 24)
      assert(r.meta.format == o.meta.format)     // format untouched
      // 64×48 → 32×24 is a 4:1 pixel ratio → ~1/4 the bytes
      assert(r.payload.length == (o.payload.length + 3) / 4)
    }
    // schema contract preserved: resize(out) still feeds extractFeatures
    val feats = Multimodal.extractFeatures(Multimodal.resize(ds, 32, 24))
    assert(feats.count() == 8)
  }
}
