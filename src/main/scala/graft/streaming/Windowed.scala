package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-time windowed analytics builders (SURVEY §2.7) — the same
  * expressions work on batch AND streaming frames; under a stream with
  * `withWatermark`, Catalyst incrementalizes them and the watermark
  * drives state eviction (semantics pinned in StreamingSpec). Window
  * starts are emitted as epoch-µs (R4, cross-engine canonical form).
  *
  * Scale: all three are hash-aggregates keyed by (window, keys) with
  * map-side partials — the shuffle carries one row per (partition,
  * window, key), not per event; sessionize's streaming form uses
  * session_window state merged per key.
  */
object Windowed {

  private def winAgg(df: DataFrame, w: Column, keys: Seq[Column],
                     aggs: Seq[Column]): DataFrame =
    df.groupBy((w.as("w") +: keys): _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("win_us", unix_micros(col("w.start")))
      .drop("w")

  /** Fixed (tumbling) windows, e.g. tumble(df, col("ts"), "1 hour"). */
  def tumble(df: DataFrame, ts: Column, width: String,
             keys: Seq[Column] = Nil,
             aggs: Seq[Column] = Seq(count(lit(1)).as("n"))): DataFrame =
    winAgg(df, window(ts, width), keys, aggs)

  /** Overlapping (sliding) windows. */
  def slide(df: DataFrame, ts: Column, width: String, step: String,
            keys: Seq[Column] = Nil,
            aggs: Seq[Column] = Seq(count(lit(1)).as("n"))): DataFrame =
    winAgg(df, window(ts, width, step), keys, aggs)

  /** Gap-based sessions (streaming form; batch twin: the
    * gaps-and-islands plan in ops.Streaming.q_stream_session). */
  def sessionize(df: DataFrame, ts: Column, gap: String,
                 keys: Seq[Column],
                 aggs: Seq[Column] = Seq(count(lit(1)).as("n"))): DataFrame =
    df.groupBy((session_window(ts, gap).as("w") +: keys): _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("start_us", unix_micros(col("w.start")))
      .withColumn("end_us", unix_micros(col("w.end")))
      .drop("w")
}
