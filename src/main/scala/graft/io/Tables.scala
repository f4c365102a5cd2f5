package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** THE shared reader (SURVEY.md §7.1). Every declared query goes through
  * here so the ns-timestamp workaround (FIXTURES.md gotcha 1) is applied
  * uniformly: `events.ts` is parquet TIMESTAMP(NANOS) which Spark 4.1.2
  * rejects unless `spark.sql.legacy.parquet.nanosAsLong=true`, in which
  * case it arrives as LongType epoch-nanos.
  *
  * Scale note (100 TB): this helper is the single seam where a real
  * deployment would swap one-file-per-table parquet for a partitioned
  * table (`spark.read.table` / catalog lookup). Query code never hardcodes
  * paths.
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // Idempotent; must be set at runtime because Verify/Bench build their
    // sessions without extra configs (SURVEY §0.3).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/$name.parquet")
  }

  def region(s: SparkSession, d: String): DataFrame   = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** `events` with the canonical event-time columns derived:
    *  - `ts_us`: epoch-microseconds BIGINT — the cross-engine comparable
    *    form (DuckDB reads the same column as µs TIMESTAMP; `epoch_us(ts)`
    *    there == `ts div 1000` here, verified in FIXTURES.md gotcha 2).
    *    Integer division (`div`), NOT double division: epoch-nanos
    *    (~1.7e18) exceeds double's 53-bit integer range.
    *  - `ts_utc`: µs TimestampType for window()/date functions.
    */
  def events(s: SparkSession, d: String): DataFrame =
    table(s, d, "events")
      .withColumn("ts_us", expr("ts div 1000"))
      .withColumn("ts_utc", timestamp_micros(expr("ts div 1000")))
}
