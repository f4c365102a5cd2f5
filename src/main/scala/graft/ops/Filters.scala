package graft.ops

import org.apache.spark.sql.functions._
import graft.Determinism._
import graft.io.Tables

/** SURVEY §2.2 — projection / filter / predicates (three-valued logic). */
object Filters extends OpGroup {

  def qs: Seq[Q] = Seq(
    Q(
      "q_project_expr",
      (s, d) => Tables.lineitem(s, d)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          asMoney(money("l_extendedprice") *
            (lit(1).cast(Money) - money("l_discount"))).as("revenue"))
        // (l_orderkey, l_linenumber) not unique in fixture → full-row order
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("revenue")),
      """SELECT l_orderkey, l_linenumber,
        |  CAST(ROUND(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))), 2) AS DOUBLE) AS revenue
        |FROM lineitem ORDER BY l_orderkey, l_linenumber, revenue""".stripMargin),

    Q(
      // TPC-H Q6-flavored range+IN predicate stack; the filter composition
      // (between/isin/and) all folds into one pushed scan predicate.
      "q_filter_range_in",
      (s, d) => {
        val l = Tables.lineitem(s, d)
        val o = Tables.orders(s, d)
        l.filter(
            col("l_shipdate").between(lit("1996-01-01").cast("timestamp"),
                                      lit("1997-12-31").cast("timestamp")) &&
            col("l_discount").between(0.05, 0.07) &&
            col("l_quantity") < 24)
          .join(o.filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH")),
                col("l_orderkey") === col("o_orderkey"))
          .select(col("l_orderkey"), col("l_linenumber"),
                  col("o_orderpriority"),
                  asMoney(money("l_extendedprice") * money("l_discount"))
                    .as("disc_revenue"))
          .orderBy(col("l_orderkey"), col("l_linenumber"), col("disc_revenue"))
      },
      """SELECT l_orderkey, l_linenumber, o_orderpriority,
        |  CAST(ROUND(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2)), 2) AS DOUBLE) AS disc_revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
        |  AND l_discount BETWEEN 0.05 AND 0.07
        |  AND l_quantity < 24
        |  AND o_orderpriority IN ('1-URGENT', '2-HIGH')
        |ORDER BY l_orderkey, l_linenumber, disc_revenue""".stripMargin),

    Q(
      // NULLIF-produced NULLs through COUNT/CASE: three-valued logic.
      "q_filter_null_semantics",
      (s, d) => Tables.lineitem(s, d)
        .withColumn("flag_n", expr("nullif(l_returnflag, 'N')"))
        .groupBy(col("l_linestatus"))
        .agg(
          count(lit(1)).as("cnt_all"),
          count(col("flag_n")).as("cnt_nonnull"),
          sum(when(col("flag_n").isNull, 1).otherwise(0)).as("cnt_null"))
        .orderBy(col("l_linestatus")),
      """SELECT l_linestatus,
        |  COUNT(*) AS cnt_all,
        |  COUNT(NULLIF(l_returnflag, 'N')) AS cnt_nonnull,
        |  CAST(SUM(CASE WHEN NULLIF(l_returnflag, 'N') IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS cnt_null
        |FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin)
  )
}
