package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Public, parameterized event-stream API — batch sessionization and
  * time-grid gap filling, the two reductions between raw event logs and
  * every downstream per-session / per-interval metric.
  *
  * Scale notes: both operators are ONE shuffle on the entity key. The
  * sessionize lag-window and running-sum window share a single
  * (key, time) sort, so Spark plans one Exchange + one Sort for both;
  * fillForward's spine is |keys| × |grid cells| — it joins, never
  * explodes the raw events.
  */
object Events {

  /** Gap-based sessionization: a new session starts when the time since
    * the entity's previous event exceeds `gapUs`. Adds column `sess`
    * (1-based, dense per key, deterministic given that
    * (time, tieBreak…) totally orders each key's events).
    *
    * Shape: lag + running sum over the SAME window ordering — one
    * shuffle on `key`, one sort, two Window operators pipelined on the
    * sorted partition. This is the scalable form: per-key state never
    * materializes on the driver, and a 100×-larger log only widens the
    * shuffle, not the algorithm.
    */
  def sessionize(
      df: DataFrame, key: Column, timeUs: Column,
      tieBreak: Seq[Column], gapUs: Long): DataFrame = {
    val order = timeUs.asc +: tieBreak.map(_.asc)
    val w = Window.partitionBy(key).orderBy(order: _*)
    val newSess = when(
      lag(timeUs, 1).over(w).isNull ||
        timeUs - lag(timeUs, 1).over(w) > gapUs, 1L).otherwise(0L)
    df.withColumn("sess",
      sum(newSess).over(w.rowsBetween(Window.unboundedPreceding,
                                      Window.currentRow)))
  }

  /** Fill the holes in an integer time grid and carry the last
    * observation forward. `df` must hold at most one row per
    * (keys…, gridCol) cell — typically the output of a bucketed
    * aggregate. Emits one row per key per grid cell in
    * [min(grid), max(grid)] (global bounds, so all keys share one
    * spine), with each `values` column last-value-filled within its
    * key and `observed` marking real cells.
    *
    * Cells before a key's first observation stay null — forward fill
    * has nothing to carry; callers choose the seed semantics.
    *
    * Shape: the bounds are a one-row aggregate (broadcast), the spine
    * is distinct-keys × sequence-explode, and the fill is one window
    * per key ordered by grid — so the only corpus-sized shuffles are
    * the spine⟕df join and the window, both on the key. The spine
    * never multiplies raw events, only grid cells.
    */
  def fillForward(
      df: DataFrame, keys: Seq[String], gridCol: String,
      values: Seq[String]): DataFrame = {
    val bounds = df.agg(min(col(gridCol)).as("g_lo"),
                        max(col(gridCol)).as("g_hi"))
    val spine = df.select(keys.map(col): _*).distinct()
      .crossJoin(broadcast(bounds))
      .select(keys.map(col) :+
        explode(sequence(col("g_lo"), col("g_hi"))).as(gridCol): _*)
    // exact presence marker — a value column may itself be null on an
    // observed cell (e.g. avg of all-null), so don't infer from values
    val joined = spine
      .join(df.withColumn("__obs", lit(true)), keys :+ gridCol, "left")
      .withColumn("observed", coalesce(col("__obs"), lit(false)))
      .drop("__obs")
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(gridCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    values.foldLeft(joined) { (acc, v) =>
      acc.withColumn(v, last(col(v), ignoreNulls = true).over(w))
    }
  }

  /** BANDED range join: all (a, b) pairs sharing a key with
    * 0 < tsB − tsA ≤ maxGapUs, WITHOUT the per-key quadratic blowup of
    * a plain equi-join + range residual. A residual-only range join
    * compares every pair within each key group (a heavy user's events
    * square); banding makes the TIME BUCKET part of the join key: with
    * width = maxGapUs, a match's b-bucket is a's bucket or the next
    * one, so the probe side explodes ×2 (buckets k, k+1) and the join
    * is a plain equi-join on (key, bucket) whose residual only ever
    * sees candidates ≤ 2·maxGapUs apart. Linear in true candidates —
    * the standard interval-banding trick (cf. Spark's own
    * spark.sql.join.preferSortMergeJoin range-join discussions and
    * DBR/Sedona range-join binning).
    *
    * Inputs must expose ts columns as epoch-µs longs; output keeps
    * every a and b column plus nothing else (callers project). */
  def bandedRangeJoin(
      a: DataFrame, b: DataFrame,
      keyA: Column, keyB: Column,
      tsA: Column, tsB: Column,
      maxGapUs: Long): DataFrame = {
    require(maxGapUs > 0, "maxGapUs must be positive")
    // withColumn REPLACES same-named columns (silent data loss), and
    // overlapping a/b names make the join condition ambiguous — fail
    // loudly instead; callers rename first (as the declared query does)
    val clash = (a.columns ++ b.columns)
      .filter(Set("__graft_bk_probe", "__graft_bk_a", "__graft_bk_b"))
    require(clash.isEmpty,
      s"bandedRangeJoin reserves ${clash.mkString(", ")} — rename first")
    val overlap = a.columns.toSet intersect b.columns.toSet
    require(overlap.isEmpty,
      s"a and b share columns ${overlap.mkString(", ")} — rename first " +
      "(self-joins must alias both sides)")
    // a probes its own bucket and the next: tsB ∈ (tsA, tsA+W] ⇒
    // tsB div W ∈ {tsA div W, tsA div W + 1}
    // exact integral bucket: (ts − ts mod W)/W is integral, < 2⁵³ for
    // epoch-µs, so the IEEE division is exact (same Determinism
    // argument as intRatio4) — Column has no `div` operator
    def bucket(ts: Column): Column =
      ((ts - pmod(ts, lit(maxGapUs))) / maxGapUs).cast("long")
    val ap = a
      .withColumn("__graft_bk_probe", explode(sequence(lit(0L), lit(1L))))
      .withColumn("__graft_bk_a", bucket(tsA) + col("__graft_bk_probe"))
    val bp = b.withColumn("__graft_bk_b", bucket(tsB))
    ap.join(bp,
        keyA === keyB && col("__graft_bk_a") === col("__graft_bk_b") &&
        tsB > tsA && tsB <= tsA + maxGapUs)
      .drop("__graft_bk_probe", "__graft_bk_a", "__graft_bk_b")
  }

  /** INTERVAL × INTERVAL overlap join (the [[bandedRangeJoin]] family's
    * two-sided sibling): emit (a, b) pairs with the same key whose
    * CLOSED intervals [startA, endA] and [startB, endB] intersect
    * (startA ≤ endB ∧ startB ≤ endA). The naive per-key self-join
    * squares every heavy key; here each interval explodes to the
    * `bandWidth`-sized buckets it covers and candidates meet through a
    * plain EQUI join on (key, bucket), so a pair is compared only where
    * it actually coexists. Each surviving pair is emitted EXACTLY once
    * — no distinct shuffle: of all shared buckets the join keeps only
    * the one containing max(startA, startB) (the overlap's first
    * bucket, which both sides necessarily cover).
    *
    * `bandWidth` trades fan-out for selectivity like bandedRangeJoin's
    * maxGapUs: each row replicates ceil(len/W)+1 times, a bucket holds
    * intervals overlapping a W-window. Pick W near the MEDIAN interval
    * length; at 100 TB a hot (key, bucket) is the usual salting
    * escape. Times are any integral unit (µs, days); intervals must
    * satisfy start ≤ end (enforce upstream). Output keeps every a and
    * b column; callers project. */
  def intervalOverlapJoin(
      a: DataFrame, b: DataFrame,
      keyA: Column, keyB: Column,
      startA: Column, endA: Column,
      startB: Column, endB: Column,
      bandWidth: Long): DataFrame = {
    require(bandWidth > 0, "bandWidth must be positive")
    val clash = (a.columns ++ b.columns)
      .filter(Set("__graft_ob_a", "__graft_ob_b"))
    require(clash.isEmpty,
      s"intervalOverlapJoin reserves ${clash.mkString(", ")} — rename first")
    val overlap = a.columns.toSet intersect b.columns.toSet
    require(overlap.isEmpty,
      s"a and b share columns ${overlap.mkString(", ")} — rename first " +
      "(self-joins must alias both sides)")
    // exact integral bucket (same IEEE-exactness argument as
    // bandedRangeJoin.bucket); pmod keeps pre-epoch times correct
    def bucket(t: Column): Column =
      ((t - pmod(t, lit(bandWidth))) / bandWidth).cast("long")
    val ap = a.withColumn(
      "__graft_ob_a",
      explode(sequence(bucket(startA), bucket(endA))))
    val bp = b.withColumn(
      "__graft_ob_b",
      explode(sequence(bucket(startB), bucket(endB))))
    ap.join(bp,
        keyA === keyB && col("__graft_ob_a") === col("__graft_ob_b") &&
        startA <= endB && startB <= endA &&
        col("__graft_ob_a") === bucket(greatest(startA, startB)))
      .drop("__graft_ob_a", "__graft_ob_b")
  }

  /** Last-touch attribution: each conversion event is credited to the
    * entity's most recent PRECEDING touch event (strictly earlier in
    * (time, tieBreak…) order); conversions with no prior touch get
    * `noTouch`. Returns the conversion rows with a `channel` column.
    *
    * One window over one (key, time) shuffle — the same sort
    * sessionize rides, so attribution composes with it at zero extra
    * exchanges. `last(..., ignoreNulls)` over UNBOUNDED PRECEDING..-1
    * is O(1) running state per row (Spark keeps the last non-null going
    * forward), never a per-row rescan of history — at 100 TB a user's
    * whole clickstream still streams through in one sorted pass.
    * First-touch is the same shape with `first` over the same frame. */
  def attributeLastTouch(
      df: DataFrame, key: Column, time: Column, tieBreak: Seq[Column],
      eventType: Column, touchTypes: Seq[String], conversion: String,
      noTouch: String = "none"): DataFrame = {
    require(touchTypes.nonEmpty, "touchTypes must be non-empty")
    require(!touchTypes.contains(conversion),
      "conversion cannot also be a touch type")
    val order = time.asc +: tieBreak.map(_.asc)
    val w = Window.partitionBy(key).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val ch = last(when(eventType.isin(touchTypes: _*), eventType),
                  ignoreNulls = true).over(w)
    df.withColumn("channel", coalesce(ch, lit(noTouch)))
      .filter(eventType === conversion)
  }
}
