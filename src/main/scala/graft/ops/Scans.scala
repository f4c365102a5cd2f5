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
        |ORDER BY l_orderkey, l_linenumber, l_quantity""".stripMargin),

    Q(
      // Z-order (Morton) curve value (io.Writers.zvalue — the key
      // Writers.zordered clusters by so row-group stats prune on ANY
      // interleaved dimension): 8-bit customer bucket × 8-bit
      // order-value bucket. Pure integer shifts/masks, so the oracle
      // replays the interleave bit-exactly with `>>`/`&`/`<<`; the
      // LAYOUT effect (per-file locality on both dims vs a single-dim
      // sort) is measured in ScaleSpec.
      "q_layout_zvalue",
      (s, d) => Tables.orders(s, d)
        .select(col("o_orderkey"),
                graft.io.Writers.zvalue(Seq(
                  col("o_custkey") % 256,
                  least(floor(col("o_totalprice") / 2000.0).cast("long"),
                        lit(255L))), bits = 8).as("zv"))
        .orderBy(col("o_orderkey")), {
        val x = "(o_custkey % 256)"
        val y = "LEAST(CAST(floor(o_totalprice / 2000.0) AS BIGINT), 255)"
        val terms =
          (0 until 8).map(i => s"((($x >> $i) & 1) << ${2 * i})") ++
          (0 until 8).map(i => s"((($y >> $i) & 1) << ${2 * i + 1})")
        s"""SELECT o_orderkey, ${terms.mkString(" + ")} AS zv
          |FROM orders ORDER BY o_orderkey""".stripMargin
      })
  )
}
