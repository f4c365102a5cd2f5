package graft.ops

import org.apache.spark.sql.functions._
import graft.Determinism._
import graft.io.Tables

/** SURVEY §2.4 — aggregation.
  *
  * Scale notes (100 TB): all of these compile to partial+final
  * HashAggregate (map-side combine before the shuffle), so the shuffle
  * carries one row per (group × partition), not per input row. Group-by
  * keys here are tiny-cardinality (returnflag×linestatus = 6), so the
  * plan is scan-bound — exactly what we want at 1000 executors.
  */
object Aggs extends OpGroup {

  def qs: Seq[Q] = Seq(
    Q(
      "q_agg_group",
      (s, d) => {
        val l = Tables.lineitem(s, d)
        l.groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            asMoney(sum(money("l_quantity"))).as("sum_qty"),
            asMoney(sum(money("l_extendedprice"))).as("sum_base_price"),
            asMoney(sum(money("l_extendedprice") *
              (lit(1).cast(Money) - money("l_discount")))).as("sum_disc_price"),
            avg4(sum(money("l_quantity")), count(lit(1))).as("avg_qty"),
            count(lit(1)).as("count_order"))
          .orderBy(col("l_returnflag"), col("l_linestatus"))
      },
      """SELECT l_returnflag, l_linestatus,
        |  CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,2))), 2) AS DECIMAL(18,2)) AS sum_qty,
        |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))), 2) AS DECIMAL(18,2)) AS sum_base_price,
        |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))), 2) AS DECIMAL(18,2)) AS sum_disc_price,
        |  ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 4) AS avg_qty,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin)
  )
}
