package graft.model

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Self-describing topic↔table catalog (SURVEY §1.1/§2.9): the analog of
  * the reference's `ros_sql_metadata` tables
  * [upstream: ros_sql/models.py], persisted as a small parquet table next
  * to the data. One row per recorded topic: topic name, mangled table
  * name, message type name, schema fingerprint, schema DDL. Readback
  * verifies the fingerprint before reconstructing typed objects — the
  * md5-check the reference performs in sql2msg.
  *
  * At cluster scale this is driver-side-tiny (one row per topic); a real
  * deployment would keep it in the metastore or a Delta table — the API
  * here is the seam.
  */
final case class TopicMeta(
    topic: String,
    table: String,
    msgType: String,
    fingerprint: String,
    schemaDdl: String)

final class Catalog(spark: SparkSession, path: String) {
  import spark.implicits._

  def register(topic: String, msgType: String, schema: StructType): TopicMeta = {
    val meta = TopicMeta(
      topic = topic,
      table = SchemaMapper.namify(topic),
      msgType = msgType,
      fingerprint = SchemaMapper.fingerprint(schema),
      schemaDdl = schema.toDDL)
    val others = all().filter(_.topic != topic)
    // namify is lossy ("/a/b" and "/a-b" both mangle to "a_b") — a
    // silent collision would interleave two topics' data in one path
    others.find(_.table == meta.table).foreach { clash =>
      throw new IllegalArgumentException(
        s"table name collision: topic '$topic' and '${clash.topic}' both " +
        s"mangle to '${meta.table}' — rename one topic")
    }
    (others :+ meta).toDS().repartition(1)
      .write.mode(SaveMode.Overwrite).parquet(path)
    meta
  }

  /** Empty ONLY when the catalog doesn't exist yet (first registration).
    * Any other read failure propagates: swallowing it here would let
    * register() overwrite the catalog with a single topic, silently
    * dropping every other topic's metadata. register() is read-then-
    * overwrite and therefore not safe under concurrent registrations —
    * callers must serialize (the recorder registers topics one at a
    * time from the driver). */
  def all(): Seq[TopicMeta] =
    try spark.read.parquet(path).as[TopicMeta].collect().toSeq
    catch {
      case e: org.apache.spark.sql.AnalysisException
          if e.getCondition == "PATH_NOT_FOUND" => Seq.empty
    }

  def lookup(topic: String): Option[TopicMeta] =
    all().find(_.topic == topic)

  /** Readback guard: fail fast when the stored schema no longer matches
    * the requested type — the reference's md5 mismatch error. */
  def verified(topic: String, expected: StructType): TopicMeta = {
    val meta = lookup(topic).getOrElse(
      throw new IllegalArgumentException(s"topic not recorded: $topic"))
    val fp = SchemaMapper.fingerprint(expected)
    require(meta.fingerprint == fp,
      s"schema drift for $topic: recorded ${meta.fingerprint}, requested $fp")
    meta
  }

  /** DataFrame view with the same missing-path contract as [[all]]
    * (empty result before the first registration, not an exception). */
  def asDF: DataFrame = all().toDS().toDF()
}
