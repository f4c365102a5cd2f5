package graft.ops

import org.apache.spark.sql.functions._
import graft.Determinism._
import graft.io.Tables

/** SQL-first relational surface: subqueries (exercising Catalyst's
  * decorrelation — RewriteCorrelatedScalarSubquery /
  * RewritePredicateSubquery, SURVEY §4.2) and PIVOT.
  *
  * Determinism note on q_subquery_scalar_corr: the TPC-H Q17 pattern
  * compares against 0.5*AVG, but AVG of doubles is not bit-portable
  * across engines at a filter BOUNDARY — so the predicate is algebraically
  * rearranged to integer-valued double math (2·qty·count < sum), which
  * is exact: quantities are integral and sums stay far below 2^53.
  */
/** Typed row for the Dataset[T] API demo (top-level for the Encoder). */
final case class CustRow(
    c_custkey: Long, c_name: String, c_nationkey: Int,
    c_acctbal: Double, c_mktsegment: String)

object SqlOps extends OpGroup {

  def qs: Seq[Q] = Seq(
    Q(
      // typed Dataset[T] surface: case-class Encoder, typed filter/map
      // (the reference's typed-message readback style, §2.9). Note the
      // cost documented in SCALE.md: typed lambdas deserialize rows and
      // block codegen fusion — fine for typed pipelines, wrong for hot
      // relational paths. Output is integer cents (floor(x*100 + 0.5) —
      // identical IEEE ops in both engines, unlike round-half ties).
      "q_typed_dataset",
      (s, d) => {
        import s.implicits._
        Tables.customer(s, d).as[CustRow]
          .filter(c => c.c_acctbal > 1000.0 && c.c_mktsegment != "MACHINERY")
          .map(c => (c.c_custkey, c.c_mktsegment,
                     math.floor(c.c_acctbal * 100 + 0.5).toLong))
          .toDF("c_custkey", "seg", "bal_cents")
          .orderBy(col("c_custkey"))
      },
      """SELECT c_custkey, c_mktsegment AS seg,
        |  CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT) AS bal_cents
        |FROM customer
        |WHERE c_acctbal > 1000.0 AND c_mktsegment <> 'MACHINERY'
        |ORDER BY c_custkey""".stripMargin),

    Q(
      // exact interpolated percentiles (sort-based aggregate; the approx
      // sketch twin is ApproxSpec's HLL / approx_percentile territory)
      "q_agg_percentile",
      (s, d) => Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(r4(expr("percentile(l_quantity, 0.5)")).as("p50"),
             r4(expr("percentile(l_quantity, 0.9)")).as("p90"),
             count(lit(1)).as("n"))
        .orderBy(col("l_returnflag")),
      """SELECT l_returnflag,
        |  round(quantile_cont(l_quantity, 0.5), 4) + 0 AS p50,
        |  round(quantile_cont(l_quantity, 0.9), 4) + 0 AS p90,
        |  COUNT(*) AS n
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin),
    Q(
      // lineitems with quantity below half the part's average —
      // two correlated scalar subqueries, decorrelated by Catalyst into
      // an aggregate + join (no per-row re-execution)
      "q_subquery_scalar_corr",
      (s, d) => {
        Tables.lineitem(s, d).createOrReplaceTempView("li_sq")
        s.sql(
          """SELECT l_orderkey, l_linenumber,
            |  CAST(ROUND(CAST(l_quantity AS DECIMAL(18,2)), 2) AS DOUBLE) AS qty
            |FROM li_sq o
            |WHERE l_quantity * 2 *
            |    (SELECT COUNT(*) FROM li_sq i WHERE i.l_partkey = o.l_partkey)
            |  < (SELECT SUM(l_quantity) FROM li_sq i
            |     WHERE i.l_partkey = o.l_partkey)
            |ORDER BY l_orderkey, l_linenumber, qty""".stripMargin)
      },
      """SELECT l_orderkey, l_linenumber,
        |  CAST(ROUND(CAST(l_quantity AS DECIMAL(18,2)), 2) AS DOUBLE) AS qty
        |FROM lineitem o
        |WHERE l_quantity * 2 *
        |    (SELECT COUNT(*) FROM lineitem i WHERE i.l_partkey = o.l_partkey)
        |  < (SELECT SUM(l_quantity) FROM lineitem i
        |     WHERE i.l_partkey = o.l_partkey)
        |ORDER BY l_orderkey, l_linenumber, qty""".stripMargin),

    Q(
      // IN-subquery → RewritePredicateSubquery plans a left-semi join
      "q_subquery_in",
      (s, d) => {
        Tables.orders(s, d).createOrReplaceTempView("ord_sq")
        Tables.customer(s, d).createOrReplaceTempView("cust_sq")
        s.sql(
          """SELECT o_orderkey, o_orderstatus
            |FROM ord_sq
            |WHERE o_custkey IN (SELECT c_custkey FROM cust_sq
            |                    WHERE c_mktsegment = 'AUTOMOBILE')
            |ORDER BY o_orderkey""".stripMargin)
      },
      """SELECT o_orderkey, o_orderstatus
        |FROM orders
        |WHERE o_custkey IN (SELECT c_custkey FROM customer
        |                    WHERE c_mktsegment = 'AUTOMOBILE')
        |ORDER BY o_orderkey""".stripMargin),

    Q(
      // UNPIVOT (melt): wide per-flag measures back to long
      // (measure, value) rows — the inverse reshape of q_pivot
      "q_unpivot",
      (s, d) => {
        val wide = Tables.lineitem(s, d)
          .groupBy(col("l_returnflag"))
          .agg(asMoney(sum(money("l_quantity"))).as("qty"),
               asMoney(sum(money("l_extendedprice"))).as("price"),
               asMoney(sum(money("l_discount"))).as("disc"))
        wide.unpivot(
            Array(col("l_returnflag")),
            Array(col("qty"), col("price"), col("disc")),
            "measure", "value")
          .orderBy(col("l_returnflag"), col("measure"))
      },
      """WITH wide AS (
        |  SELECT l_returnflag,
        |    CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE) AS qty,
        |    CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS price,
        |    CAST(ROUND(SUM(CAST(l_discount AS DECIMAL(18,2))), 2) AS DOUBLE) AS disc
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, measure, value
        |FROM wide UNPIVOT (value FOR measure IN (qty, price, disc))
        |ORDER BY l_returnflag, measure""".stripMargin),

    Q(
      // PIVOT with explicit value list (deterministic column set);
      // oracle expresses the same reshape as conditional aggregation
      "q_pivot",
      (s, d) => Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(asMoney(sum(money("l_quantity"))))
        .withColumnRenamed("F", "qty_f")
        .withColumnRenamed("O", "qty_o")
        .orderBy(col("l_returnflag")),
      """SELECT l_returnflag,
        |  CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,2)))
        |       FILTER (WHERE l_linestatus = 'F'), 2) AS DOUBLE) AS qty_f,
        |  CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,2)))
        |       FILTER (WHERE l_linestatus = 'O'), 2) AS DOUBLE) AS qty_o
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin),

    Q(
      // LATERAL correlated derived table: top-2 orders per AUTOMOBILE
      // customer — the "top-N per outer row" SQL surface (Catalyst
      // decorrelates the DomainJoin; same result as the window-rank
      // idiom but expressed as the ANSI lateral join both engines
      // speak). Non-aggregated money passthrough = moneyOut twin
      // (decimal cast then DOUBLE; oracle ROUNDs first — DuckDB's
      // decimal downcast truncates, R9).
      "q_join_lateral",
      (s, d) => {
        Tables.customer(s, d).createOrReplaceTempView("cust_lat")
        Tables.orders(s, d).createOrReplaceTempView("ord_lat")
        s.sql("""
          SELECT c.c_custkey, o.o_orderkey,
            CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price
          FROM cust_lat c,
            LATERAL (SELECT o_orderkey, o_totalprice FROM ord_lat
                     WHERE o_custkey = c.c_custkey
                     ORDER BY o_totalprice DESC, o_orderkey ASC
                     LIMIT 2) o
          WHERE c.c_mktsegment = 'AUTOMOBILE'
          ORDER BY c.c_custkey, o.o_orderkey""")
      },
      """SELECT c.c_custkey, o.o_orderkey,
        |  CAST(ROUND(CAST(o.o_totalprice AS DECIMAL(18,2)), 2) AS DOUBLE)
        |    AS price
        |FROM customer c,
        |  LATERAL (SELECT o_orderkey, o_totalprice FROM orders
        |           WHERE o_custkey = c.c_custkey
        |           ORDER BY o_totalprice DESC, o_orderkey ASC
        |           LIMIT 2) o
        |WHERE c.c_mktsegment = 'AUTOMOBILE'
        |ORDER BY c.c_custkey, o.o_orderkey""".stripMargin),

    Q(
      // error-tolerant casts (the dirty-ingest staple): try_cast turns
      // malformed input into NULL instead of failing the job; counted
      // over always-bad, always-good, and mixed derived strings so the
      // NULL semantics are exercised in every direction.
      "q_fn_try_cast",
      (s, d) => {
        Tables.part(s, d).createOrReplaceTempView("part_tc")
        s.sql("""
          SELECT COUNT(*) AS n,
            COUNT(try_cast(p_name AS INT)) AS n_name_numeric,
            COUNT(try_cast(CAST(p_partkey AS STRING) AS INT))
              AS n_key_numeric,
            CAST(SUM(COALESCE(try_cast(SUBSTRING(
              CONCAT(CAST(p_partkey AS STRING), p_name), 1, 2) AS INT),
              -1)) AS BIGINT) AS mixed_sum
          FROM part_tc""")
      },
      """SELECT COUNT(*) AS n,
        |  COUNT(TRY_CAST(p_name AS INT)) AS n_name_numeric,
        |  COUNT(TRY_CAST(CAST(p_partkey AS VARCHAR) AS INT))
        |    AS n_key_numeric,
        |  CAST(SUM(COALESCE(TRY_CAST(SUBSTR(
        |    CAST(p_partkey AS VARCHAR) || p_name, 1, 2) AS INT),
        |    -1)) AS BIGINT) AS mixed_sum
        |FROM part""".stripMargin)
  )
}
