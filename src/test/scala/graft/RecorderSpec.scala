package graft

import java.sql.Timestamp
import java.util.Properties

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.model.{Catalog, SchemaMapper}
import graft.streaming.Recorder

/** Top-level message fixtures (encoder derivation). */
case class Stamp(secs: Long, nanos: Long)
case class Pose(x: Double, y: Double, z: Double, stamp: Stamp)
case class PoseV2(x: Double, y: Double)

/** End-to-end ros_sql-equivalent pipeline (SURVEY §2.9/§3.1 ⊘): typed
  * stream → schema registration → micro-batched sink → catalog-verified
  * typed readback. JDBC leg runs against embedded Derby (in Spark's
  * classpath), standing in for the reference's SQLite/Postgres. */
class RecorderSpec extends SparkSpec {
  import spark.implicits._

  test("record to parquet + catalog, then typed readback (sql2msg analog)") {
    implicit val ctx = spark.sqlContext
    val base = tmpDir("rec")
    val cat = new Catalog(spark, s"$base/_metadata")
    val in = MemoryStream[Pose]
    val msgs = Seq(
      Pose(1.0, 2.0, 3.0, Stamp(1700000000L, 123456789L)),
      Pose(4.0, 5.0, 6.0, Stamp(1700000001L, 999999999L)))
    in.addData(msgs)
    val (meta, q) = Recorder.recordParquet(
      in.toDS(), "/robot1/pose", "geometry_msgs/Pose", cat,
      base, s"$base/_ckpt")
    q.awaitTermination()
    assert(meta.table == "robot1_pose")
    assert(cat.lookup("/robot1/pose").get.fingerprint ==
      SchemaMapper.fingerprint(in.toDS().schema))
    val back = Recorder.readback[Pose](spark, "/robot1/pose", cat, base)
      .collect().toSet
    assert(back == msgs.toSet) // lossless roundtrip incl. ns stamp
  }

  test("readback fails fast on schema drift (md5-check analog)") {
    val base = tmpDir("drift")
    val cat = new Catalog(spark, s"$base/_metadata")
    cat.register("/robot1/pose", "geometry_msgs/Pose",
      implicitly[org.apache.spark.sql.Encoder[Pose]].schema)
    val err = intercept[IllegalArgumentException] {
      Recorder.readback[PoseV2](spark, "/robot1/pose", cat, base)
    }
    assert(err.getMessage.contains("schema drift"))
  }

  test("record stream to JDBC (Derby) with flattened nested columns") {
    implicit val ctx = spark.sqlContext
    val base = tmpDir("jdbc")
    val cat = new Catalog(spark, s"$base/_metadata")
    val url = s"jdbc:derby:$base/db;create=true"
    val in = MemoryStream[Pose]
    in.addData(Pose(1.5, 2.5, 3.5, Stamp(1700000099L, 42L)))
    val (meta, q) = Recorder.recordJdbc(
      in.toDS(), "/cam/pose", "geometry_msgs/Pose", cat,
      url, s"$base/_ckpt", new Properties())
    q.awaitTermination()
    val back = spark.read.jdbc(url, meta.table, new Properties())
    // nested struct arrived as reference-style flat columns
    assert(back.columns.toSet ==
      Set("x", "y", "z", "stamp_secs", "stamp_nanos", "_recv_us"))
    val r = back.collect().head
    assert(r.getAs[Double]("x") == 1.5 &&
      r.getAs[Long]("stamp_nanos") == 42L)
    // full sql2msg analog: typed reconstruction from the FLAT SQL table
    val typed = Recorder.readbackJdbc[Pose](spark, "/cam/pose", cat, url)
      .collect().toSeq
    assert(typed == Seq(Pose(1.5, 2.5, 3.5, Stamp(1700000099L, 42L))))
  }

  test("ingest receipt time is attached (reference wall-clock analog)") {
    val df = Recorder.withReceipt(Seq((1, "a")).toDF("id", "v"))
    val recv = df.collect().head.getAs[Long]("_recv_us")
    assert(recv > 1600000000000000L) // sane epoch-µs
  }

  test("end-to-end: two topics, one catalog, analytics over the log") {
    implicit val ctx = spark.sqlContext
    val base = tmpDir("e2e")
    val cat = new Catalog(spark, s"$base/_metadata")
    // topic 1: poses
    val poses = MemoryStream[Pose]
    poses.addData(Pose(1, 1, 1, Stamp(1700000000L, 0)))
    val (m1, q1) = Recorder.recordParquet(poses.toDS(), "/r1/pose",
      "geometry_msgs/Pose", cat, base, s"$base/ck1")
    q1.awaitTermination()
    // topic 2: sensor events (ts carries event time)
    val evs = MemoryStream[Ev]
    evs.addData(
      Ev(java.sql.Timestamp.valueOf("2024-01-01 10:01:00"), "a", 1.0),
      Ev(java.sql.Timestamp.valueOf("2024-01-01 10:04:00"), "a", 2.0),
      Ev(java.sql.Timestamp.valueOf("2024-01-01 10:11:00"), "b", 4.0))
    val (m2, q2) = Recorder.recordParquet(evs.toDS(), "/r1/sensor",
      "graft/Ev", cat, base, s"$base/ck2")
    q2.awaitTermination()
    // catalog holds both topics, distinct tables
    assert(cat.all().map(_.topic).toSet == Set("/r1/pose", "/r1/sensor"))
    assert(Set(m1.table, m2.table).size == 2)
    // windowed analytics straight over the recorded log (the "query the
    // logged tables with standard tools" half of the reference contract)
    val agg = graft.streaming.Windowed.tumble(
        spark.read.parquet(s"$base/${m2.table}"),
        org.apache.spark.sql.functions.col("ts"), "10 minutes")
      .orderBy("win_us")
      .collect().map(_.getAs[Long]("n")).toSeq
    assert(agg == Seq(2L, 1L))
  }
}
