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
        |  CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_qty,
        |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_base_price,
        |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE) AS sum_disc_price,
        |  ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 4) + 0 AS avg_qty,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin),

    Q(
      // multi-distinct → Catalyst RewriteDistinctAggregates (Expand)
      "q_agg_distinct",
      (s, d) => Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey")).as("cd_part"),
             countDistinct(col("l_suppkey")).as("cd_supp"),
             count(lit(1)).as("cnt"))
        .orderBy(col("l_returnflag")),
      """SELECT l_returnflag,
        |  COUNT(DISTINCT l_partkey) AS cd_part,
        |  COUNT(DISTINCT l_suppkey) AS cd_supp,
        |  COUNT(*) AS cnt
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),

    Q(
      // EXACT distinct count via bitmap aggregation — the scale path
      // countDistinct lacks: bitmap_construct_agg partials are
      // fixed-size bitmaps that OR together map-side (one pass, no
      // Expand, no per-value shuffle rows — the distinct values
      // travel as BITS). Keys spread over 2³² buckets via
      // bitmap_bucket_number, counts sum per group. The oracle proves
      // the bitmap path equals plain COUNT(DISTINCT).
      "q_agg_bitmap_distinct",
      (s, d) => Tables.orders(s, d)
        .select(col("o_orderpriority"),
                expr("bitmap_bucket_number(o_custkey)").as("bkt"),
                expr("bitmap_bit_position(o_custkey)").as("pos"))
        .groupBy(col("o_orderpriority"), col("bkt"))
        .agg(expr("bitmap_count(bitmap_construct_agg(pos))").as("c"))
        .groupBy(col("o_orderpriority"))
        .agg(sum(col("c")).as("n_cust"))
        .orderBy(col("o_orderpriority")),
      """SELECT o_orderpriority,
        |  COUNT(DISTINCT o_custkey) AS n_cust
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin),

    Q(
      // bitwise AGGREGATES (bit_and/bit_or/bit_xor) — the bitmask
      // rollup surface (feature-flag intersections, permission-mask
      // unions, parity checksums). Associative+commutative → map-side
      // partials for free; exact integers, order-independent.
      "q_agg_bitwise",
      (s, d) => Tables.orders(s, d)
        .select(col("o_orderpriority"),
                expr("o_custkey & 65535").as("m"))
        .groupBy(col("o_orderpriority"))
        .agg(expr("bit_and(m)").as("mask_and"),
             expr("bit_or(m)").as("mask_or"),
             expr("bit_xor(m)").as("mask_xor"),
             count(lit(1)).as("n"))
        .orderBy(col("o_orderpriority")),
      """SELECT o_orderpriority,
        |  bit_and(o_custkey & 65535) AS mask_and,
        |  bit_or(o_custkey & 65535) AS mask_or,
        |  bit_xor(o_custkey & 65535) AS mask_xor,
        |  COUNT(*) AS n
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin),

    Q(
      "q_agg_rollup",
      (s, d) => Tables.lineitem(s, d)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(asMoney(sum(money("l_quantity"))).as("sum_qty"),
             count(lit(1)).as("cnt"),
             grouping(col("l_returnflag")).cast("int").as("g_flag"),
             grouping(col("l_linestatus")).cast("int").as("g_status"))
        .orderBy(col("g_flag"), col("g_status"),
                 asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus")),
      """SELECT l_returnflag, l_linestatus,
        |  CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_qty,
        |  COUNT(*) AS cnt,
        |  CAST(GROUPING(l_returnflag) AS INTEGER) AS g_flag,
        |  CAST(GROUPING(l_linestatus) AS INTEGER) AS g_status
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY g_flag, g_status,
        |  l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin),

    Q(
      "q_agg_cube",
      (s, d) => Tables.lineitem(s, d)
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(asMoney(sum(money("l_quantity"))).as("sum_qty"),
             count(lit(1)).as("cnt"),
             grouping(col("l_returnflag")).cast("int").as("g_flag"),
             grouping(col("l_linestatus")).cast("int").as("g_status"))
        .orderBy(col("g_flag"), col("g_status"),
                 asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus")),
      """SELECT l_returnflag, l_linestatus,
        |  CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_qty,
        |  COUNT(*) AS cnt,
        |  CAST(GROUPING(l_returnflag) AS INTEGER) AS g_flag,
        |  CAST(GROUPING(l_linestatus) AS INTEGER) AS g_status
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY g_flag, g_status,
        |  l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin),

    Q(
      // SQL-first surface: explicit GROUPING SETS via spark.sql
      "q_agg_grouping_sets",
      (s, d) => {
        Tables.lineitem(s, d).createOrReplaceTempView("gs_lineitem")
        s.sql(
          """SELECT l_returnflag, l_linestatus,
            |  CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_qty,
            |  COUNT(*) AS cnt
            |FROM gs_lineitem
            |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
            |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin)
      },
      """SELECT l_returnflag, l_linestatus,
        |  CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_qty,
        |  COUNT(*) AS cnt
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin),

    Q(
      // doubles are unavoidable for stddev/var → R3 round(x,4) both sides
      "q_agg_stats",
      (s, d) => Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(min(col("l_quantity")).as("min_qty"),
             max(col("l_quantity")).as("max_qty"),
             count(lit(1)).as("cnt"),
             r4(stddev_samp(col("l_quantity"))).as("sd_qty"),
             r4(var_samp(col("l_quantity"))).as("var_qty"))
        .orderBy(col("l_returnflag")),
      """SELECT l_returnflag,
        |  MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty,
        |  COUNT(*) AS cnt,
        |  ROUND(STDDEV_SAMP(l_quantity), 4) + 0 AS sd_qty,
        |  ROUND(VAR_SAMP(l_quantity), 4) + 0 AS var_qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),

    Q(
      // bivariate stats: sample correlation + covariance of quantity vs
      // price per flag — unavoidable doubles under R3/R10 (round + 0)
      "q_agg_corr",
      (s, d) => Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("cnt"),
             r4(corr(col("l_quantity"), col("l_extendedprice")))
               .as("corr_qp"),
             r4(covar_samp(col("l_quantity"), col("l_extendedprice")))
               .as("cov_qp"))
        .orderBy(col("l_returnflag")),
      """SELECT l_returnflag, COUNT(*) AS cnt,
        |  round(corr(l_quantity, l_extendedprice), 4) + 0 AS corr_qp,
        |  round(covar_samp(l_quantity, l_extendedprice), 4) + 0 AS cov_qp
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),

    Q(
      "q_agg_having",
      (s, d) => Tables.orders(s, d)
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"),
             asMoney(sum(money("o_totalprice"))).as("sum_total"))
        .filter(col("n_orders") >= 15)
        .orderBy(col("o_custkey")),
      """SELECT o_custkey, COUNT(*) AS n_orders,
        |  CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_total
        |FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 15
        |ORDER BY o_custkey""".stripMargin),

    Q(
      // ordered string aggregation (SQL:2016 LISTAGG … WITHIN GROUP):
      // deterministic because the WITHIN GROUP order is total per group.
      // Spark executes it as a sort-based aggregate; the string only
      // materializes per GROUP, so the shuffle carries nation-sized
      // rows, not the concatenation.
      "q_agg_listagg",
      (s, d) => Tables.nation(s, d)
        .join(Tables.region(s, d),
              col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(expr("listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name)")
               .as("nations"),
             count(lit(1)).as("n_nations"))
        .orderBy(col("r_name")),
      """SELECT r_name,
        |  string_agg(n_name, ',' ORDER BY n_name) AS nations,
        |  COUNT(*) AS n_nations
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin),

    Q(
      // DISCRETE percentiles (PERCENTILE_DISC / quantile_disc): pick an
      // ACTUAL input value (smallest with cume_dist ≥ p) — no
      // interpolation arithmetic at all, so raw parquet doubles cross
      // engines bit-exactly; the continuous twin (q_agg_percentile)
      // needs the integer-cents detour this one doesn't.
      "q_agg_percentile_disc",
      (s, d) => Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(expr("percentile_disc(0.25) WITHIN GROUP " +
                  "(ORDER BY l_extendedprice)").as("p25"),
             expr("percentile_disc(0.5) WITHIN GROUP " +
                  "(ORDER BY l_extendedprice)").as("p50"),
             expr("percentile_disc(0.9) WITHIN GROUP " +
                  "(ORDER BY l_extendedprice)").as("p90"))
        .orderBy(col("l_returnflag")),
      """SELECT l_returnflag,
        |  quantile_disc(l_extendedprice, 0.25) AS p25,
        |  quantile_disc(l_extendedprice, 0.5) AS p50,
        |  quantile_disc(l_extendedprice, 0.9) AS p90
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin),

    Q(
      // boolean aggregates: bool_and / bool_or / count_if per status —
      // the predicate-rollup surface (data-quality assertions compile
      // to exactly this). Plain hash-agg with map-side partials.
      "q_agg_boolean",
      (s, d) => Tables.orders(s, d)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"),
             bool_and(col("o_totalprice") > 1000.0).as("all_over_1k"),
             bool_or(col("o_totalprice") > 400000.0).as("any_over_400k"),
             count_if(col("o_totalprice") > 200000.0).as("n_over_200k"))
        .orderBy(col("o_orderstatus")),
      """SELECT o_orderstatus, COUNT(*) AS n,
        |  bool_and(o_totalprice > 1000.0) AS all_over_1k,
        |  bool_or(o_totalprice > 400000.0) AS any_over_400k,
        |  CAST(SUM(CASE WHEN o_totalprice > 200000.0 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_over_200k
        |FROM orders GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin),

    Q(
      // deterministic mode: most frequent quantity per flag, ties broken
      // by smallest value — native mode() has engine-specific tie picks,
      // so both sides use the same count+rank formulation
      "q_agg_mode",
      (s, d) => {
        val counts = Tables.lineitem(s, d)
          .groupBy(col("l_returnflag"), col("l_quantity"))
          .agg(count(lit(1)).as("n"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("l_returnflag"))
          .orderBy(col("n").desc, col("l_quantity").asc)
        counts.withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("l_returnflag"), col("l_quantity").as("mode_qty"),
                  col("n").as("mode_n"))
          .orderBy(col("l_returnflag"))
      },
      """WITH c AS (
        |  SELECT l_returnflag, l_quantity, COUNT(*) AS n
        |  FROM lineitem GROUP BY l_returnflag, l_quantity),
        |r AS (
        |  SELECT *, row_number() OVER (PARTITION BY l_returnflag
        |    ORDER BY n DESC, l_quantity ASC) AS rn
        |  FROM c)
        |SELECT l_returnflag, l_quantity AS mode_qty, n AS mode_n
        |FROM r WHERE rn = 1 ORDER BY l_returnflag""".stripMargin),

    Q(
      // array-building aggregation — collect_list is ingestion-order
      // nondeterministic, so the array is sorted, then serialized to a
      // CSV string (R5: scalar outputs only — array cells crash the
      // driver comparator's pandas sort, CORRECTNESS_r01 `err`)
      "q_agg_collect_sorted",
      (s, d) => Tables.orders(s, d)
        .filter(col("o_custkey") <= 20)
        .groupBy(col("o_custkey"))
        .agg(concat_ws(",", sort_array(collect_list(col("o_orderkey"))))
               .as("order_keys"),
             count(lit(1)).as("n"))
        .orderBy(col("o_custkey")),
      """SELECT o_custkey,
        |  array_to_string(list_sort(list(o_orderkey)), ',') AS order_keys,
        |  COUNT(*) AS n
        |FROM orders WHERE o_custkey <= 20
        |GROUP BY o_custkey ORDER BY o_custkey""".stripMargin)
  )
}
