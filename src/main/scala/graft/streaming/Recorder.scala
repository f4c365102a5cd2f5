package graft.streaming

import java.util.Properties

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, SaveMode, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.model.{Catalog, SchemaMapper, TopicMeta}

/** The reference's core pipeline, Spark-first (SURVEY §3.1): subscribe to
  * a typed stream ("topic"), derive + register its relational schema, and
  * append every arriving message to a SQL table.
  *
  * Reference shape [upstream: scripts/record.py + factories.py::msg2sql]:
  * one INSERT transaction per message, schema shredded into child tables.
  * Spark shape: micro-batched `foreachBatch` — each batch is ONE bulk
  * append of a whole DataFrame (columnar until the sink boundary), nested
  * fields flattened only at the JDBC seam. Exactly-once-ish: Spark
  * retries a failed batch; sinks here are append-only, so dedup-on-read
  * (or `dropDuplicatesWithinWatermark` upstream, see StreamingSpec) papers
  * over replays — same delivery contract the reference has.
  *
  * Scale: the JDBC sink is the bottleneck by construction (same as the
  * reference); `numPartitions` controls sink-side write parallelism, and
  * the parquet path is the 100 TB-rated alternative.
  */
object Recorder {

  /** Ingest-time receipt metadata, the reference's wall-clock column
    * analog — added per batch, not per row-insert. */
  def withReceipt(df: DataFrame): DataFrame =
    df.withColumn("_recv_us",
      org.apache.spark.sql.functions.unix_micros(
        org.apache.spark.sql.functions.current_timestamp()))

  /** Record a typed stream into a JDBC table (+ catalog row). */
  def recordJdbc[T: Encoder](
      stream: Dataset[T],
      topic: String,
      msgType: String,
      catalog: Catalog,
      url: String,
      checkpointDir: String,
      props: Properties = new Properties()): (TopicMeta, StreamingQuery) = {
    val meta = catalog.register(topic, msgType, stream.schema)
    val q = stream.toDF().writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        SchemaMapper.flatten(withReceipt(batch))
          .write.mode(SaveMode.Append).jdbc(url, meta.table, props)
      }
      .start()
    (meta, q)
  }

  /** Record a typed stream into partitioned parquet — the scale path.
    * `trigger` defaults to AvailableNow (drain-and-stop, the batch
    * backfill shape); pass ProcessingTime for a LIVE sustained ingest
    * (the e2e throughput demo in StreamingSpec runs ~1M events/s
    * through this seam — see SCALE.md). */
  def recordParquet[T: Encoder](
      stream: Dataset[T],
      topic: String,
      msgType: String,
      catalog: Catalog,
      baseDir: String,
      checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow()): (TopicMeta, StreamingQuery) = {
    val meta = catalog.register(topic, msgType, stream.schema)
    // receipt metadata on BOTH sinks (it was JDBC-only, leaving the
    // documented 100 TB path with no ingest-time column); readback's
    // .as[T] binds by name, so the extra _recv_us column is transparent
    // to typed consumers and available to audits.
    //
    // VERSION-SCOPED sink dir (v1, v2, …): FileStreamSink keeps a
    // per-directory manifest keyed by batchId, so a NEW recording
    // session (fresh checkpoint) writing into the directory of an old
    // one would find its batch 0 "already committed" and SILENTLY skip
    // the write — data loss, not an error. Each schema version gets
    // its own sink dir + manifest; resuming the SAME version must
    // reuse the original checkpoint (the standard Structured Streaming
    // contract — checkpoint is the session identity).
    val q = withReceipt(stream.toDF()).writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .option("path", s"$baseDir/${meta.table}/v${meta.version}")
      .trigger(trigger)
      .format("parquet")
      .start()
    (meta, q)
  }

  /** Readback: table rows → typed objects (the reference's sql2msg,
    * without the N+1 child-table fetches — nesting is native). Fails on
    * schema drift via the catalog fingerprint.
    *
    * Reads with the VERIFIED version's DDL pinned as the scan schema —
    * not parquet footer sampling: after an additive v1→v2 evolution the
    * topic directory mixes v1/v2 files, and a sampled v1 footer would
    * nondeterministically drop (or fail analysis on) the v2 column.
    * With the catalog schema pinned, v1-era rows surface the added
    * nullable columns as NULL — the documented evolution contract. */
  def readback[T: Encoder](
      spark: SparkSession,
      topic: String,
      catalog: Catalog,
      baseDir: String): Dataset[T] = {
    val enc = implicitly[Encoder[T]]
    val meta = catalog.verified(topic, enc.schema)
    spark.read
      .schema(org.apache.spark.sql.types.StructType.fromDDL(meta.schemaDdl))
      .parquet(s"$baseDir/${meta.table}/v*").as[T](enc)
  }

  /** Typed readback from a FLAT JDBC table (the true sql2msg analog:
    * the reference reconstructs messages from its shredded SQL layout).
    * Unflattens reference-style `parent_child` columns back into the
    * message's nested shape in one projection. */
  def readbackJdbc[T: Encoder](
      spark: SparkSession,
      topic: String,
      catalog: Catalog,
      url: String,
      props: Properties = new Properties()): Dataset[T] = {
    val enc = implicitly[Encoder[T]]
    val meta = catalog.verified(topic, enc.schema)
    SchemaMapper
      .unflatten(spark.read.jdbc(url, meta.table, props), enc.schema)
      .as[T](enc)
  }
}
