package graft.ops

import org.apache.spark.sql.functions._
import graft.io.Tables

/** SURVEY §2.1 — scans (sources/sinks without an oracle are exercised by
  * the harness itself / ScalaTest).
  *
  * Scale notes: q_scan_prune / q_scan_pred_pushdown exist to prove the
  * plan properties that dominate 100 TB cost: `ReadSchema` carrying only
  * the projected columns and `PushedFilters` reaching the parquet reader
  * (row-group skipping). Verified via .explain in ScanSpec.
  */
object Scans extends OpGroup {

  def qs: Seq[Q] = Seq(
    Q(
      "q_scan_full",
      (s, d) => Tables.nation(s, d).orderBy(col("n_nationkey")),
      "SELECT * FROM nation ORDER BY n_nationkey"),

    Q(
      "q_scan_prune",
      (s, d) => Tables.part(s, d)
        .select(col("p_partkey"), col("p_size"))
        .orderBy(col("p_partkey")),
      "SELECT p_partkey, p_size FROM part ORDER BY p_partkey"),

    Q(
      "q_scan_pred_pushdown",
      (s, d) => Tables.lineitem(s, d)
        .filter(col("l_quantity") < 5)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
        // (l_orderkey, l_linenumber) is NOT unique in the fixture —
        // R1 requires ordering by the full output row
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_quantity")),
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        |WHERE l_quantity < 5
        |ORDER BY l_orderkey, l_linenumber, l_quantity""".stripMargin)
  )
}
