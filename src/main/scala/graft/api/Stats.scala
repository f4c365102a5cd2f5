package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Public, parameterized statistics sketches — the reusable forms behind
  * the `q_stats_*` sketch operators (which delegate here, so the DuckDB
  * oracle gate verifies this code). Everything is exact integer math:
  * estimates are deterministic functions of the input SET, never of
  * partition or merge order.
  */
object Stats {

  /** Mergeable fixed-width histogram sketch of an integer-valued
    * column, per key: `bins` equal integer-width buckets spanning
    * [min, max] (width = range div bins + 1, so bucket indices stay in
    * [0, bins)). Returns one row per non-empty bucket:
    * (key, n, minv, maxv, width, bin, c, edge) where `edge` is the
    * bucket's inclusive upper value clipped to the observed max.
    *
    * The 100 TB contract: bucket counts are a pure function of the
    * input set — partials combine map-side and merge in ANY order on
    * any cluster size, and the shuffled state is ≤ `bins` integers per
    * key regardless of SF (the reason a quantile report over petabytes
    * ships bin counts instead of sorting values). Two passes by
    * construction (bounds, then counts) — the bounds frame is one tiny
    * broadcast. */
  def histBins(
      df: DataFrame, key: Column, value: Column, bins: Int): DataFrame = {
    require(bins >= 1, s"histBins: bins must be >= 1, got $bins")
    val e = df.select(key.as("_k"), value.cast("long").as("_v"))
      .filter(col("_v").isNotNull)
    val st = e.groupBy(col("_k"))
      .agg(count(lit(1)).as("n"), min(col("_v")).as("minv"),
           max(col("_v")).as("maxv"))
      .withColumn("width", expr(s"(maxv - minv) div $bins + 1"))
      .select(col("_k").as("_k2"), col("n"), col("minv"), col("maxv"),
              col("width"))
    e.join(broadcast(st), col("_k") === col("_k2"))
      .select(col("_k"), col("n"), col("minv"), col("maxv"), col("width"),
              expr("(_v - minv) div width").as("bin"))
      .groupBy(col("_k"), col("n"), col("minv"), col("maxv"),
               col("width"), col("bin"))
      .agg(count(lit(1)).as("c"))
      .withColumn("edge",
        least(col("minv") + (col("bin") + 1) * col("width") - 1,
              col("maxv")))
  }

  /** Quantile estimates from the [[histBins]] sketch: for each integer
    * percentile p in `ps`, the upper edge of the first bucket whose
    * cumulative count reaches ⌈p·n/100⌉ — one estimate column
    * `p<p>_est` per requested percentile, one row per key. The
    * cumulative window runs over the COLLAPSED ≤`bins`-row frame,
    * never the corpus. Estimate error is bounded by one bucket width
    * (range/bins); every step is integer, so the estimates hash-match
    * any engine. */
  def binnedQuantiles(
      df: DataFrame, key: Column, value: Column, bins: Int,
      ps: Seq[Int]): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 1 && p <= 100),
      s"binnedQuantiles: percentiles must be in [1,100], got $ps")
    val wb = Window.partitionBy(col("_k")).orderBy(col("bin").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = histBins(df, key, value, bins)
      .withColumn("cum", sum(col("c")).over(wb))
    val ests = ps.map { p =>
      min(when(col("cum") >= expr(s"($p * n + 99) div 100"), col("edge")))
        .as(s"p${p}_est")
    }
    cum.groupBy(col("_k").as("key"), col("n"))
      .agg(ests.head, ests.tail: _*)
  }

  /** Count-min sketch counters over a key column: `depth` independent
    * hash rows × `width` buckets, each counter the number of input ROWS
    * (multiset counts, not distinct) whose row-r hash lands in it.
    * Returns (r, b, c). The 100 TB contract shared with [[histBins]]:
    * counters are plain sums — partials combine map-side and merge in
    * ANY order, the shuffled state is ≤ depth·width integers total
    * regardless of corpus size, and the sketch is a pure function of
    * the input multiset (md5-derived bucket hashes, so an external
    * engine replays it exactly). */
  def countMinCounters(
      df: DataFrame, key: Column, depth: Int, width: Int): DataFrame = {
    require(depth >= 1 && width >= 1,
      s"countMinCounters: depth/width must be >= 1, got $depth/$width")
    df.select(key.cast("string").as("_k"))
      .select(col("_k"),
              explode(array((0 until depth).map(lit(_)): _*)).as("r"))
      .select(col("r"),
              pmod(Pipeline.hash16(
                concat(col("_k"), lit("#"), col("r").cast("string"))),
                lit(width)).as("b"))
      .groupBy(col("r"), col("b"))
      .agg(count(lit(1)).as("c"))
  }

  /** Point-frequency estimates for `probes` (one row per key) from a
    * [[countMinCounters]] frame: est(k) = min over rows r of
    * counter[r][b_r(k)]. Never undercounts; collisions only inflate,
    * and the min over `depth` independent rows is the classic CM bound
    * (over ≤ 2·N/width with prob ≥ 1 − 2^−depth). The probe side is
    * |probes|·depth rows joined against the ≤ depth·width counter
    * frame — broadcast-sized on both sides no matter the corpus. */
  def countMinEstimate(
      counters: DataFrame, probes: DataFrame, key: Column,
      depth: Int, width: Int): DataFrame =
    probes.select(key.cast("string").as("_k"))
      .select(col("_k"),
              explode(array((0 until depth).map(lit(_)): _*)).as("r"))
      .withColumn("b",
        pmod(Pipeline.hash16(
          concat(col("_k"), lit("#"), col("r").cast("string"))),
          lit(width)))
      .join(counters, Seq("r", "b"), "left")
      .groupBy(col("_k").as("key"))
      .agg(min(coalesce(col("c"), lit(0L))).as("cms_est"))
}
