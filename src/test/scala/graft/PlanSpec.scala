package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.io.Tables

/** Plan-shape assertions — the 100 TB story is made of these properties,
  * so they are pinned as tests, not just eyeballed via .explain:
  *  - column pruning reaches the parquet scan (ReadSchema),
  *  - predicates push into the reader (PushedFilters),
  *  - small dims broadcast (no shuffle of the fact side for them),
  *  - the asof emulation plans exactly one shuffle.
  */
class PlanSpec extends SparkSpec {

  private def formatted(df: DataFrame): String =
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

  test("q_scan_prune reads only the projected columns") {
    val plan = formatted(SparkEntry.queries("q_scan_prune")(spark, sfDir))
    val readSchema = plan.linesIterator
      .find(_.trim.startsWith("ReadSchema")).getOrElse("")
    assert(readSchema.contains("p_partkey") && readSchema.contains("p_size"))
    assert(!readSchema.contains("p_name") && !readSchema.contains("p_type"),
      s"scan not pruned: $readSchema")
  }

  test("q_scan_pred_pushdown pushes the filter into the parquet reader") {
    val plan = formatted(
      SparkEntry.queries("q_scan_pred_pushdown")(spark, sfDir))
    val pushed = plan.linesIterator
      .find(_.trim.startsWith("PushedFilters")).getOrElse("")
    assert(pushed.contains("LessThan(l_quantity"),
      s"filter not pushed: $pushed")
  }

  test("q_join_broadcast plans broadcast joins for the dims (no shuffle)") {
    val plan = formatted(SparkEntry.queries("q_join_broadcast")(spark, sfDir))
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("SortMergeJoin"),
      "dim join fell back to a shuffle join")
  }

  test("join hints reach the physical plan (MERGE / SHUFFLE_HASH)") {
    val smj = formatted(SparkEntry.queries("q_join_sortmerge")(spark, sfDir))
    assert(smj.contains("SortMergeJoin"))
    val shj = formatted(
      SparkEntry.queries("q_join_shuffle_hash")(spark, sfDir))
    assert(shj.contains("ShuffledHashJoin"))
  }

  test("asof emulation is one-pass: a single user_id exchange, no join") {
    val df = SparkEntry.queries("q_join_asof")(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), "asof emulation should not join")
    // one hashpartitioning(user_id) for the window + one rangepartitioning
    // for the final ORDER BY
    assert(plan.linesIterator.count(_.contains("Exchange hashpartitioning")) == 1,
      s"asof should shuffle on user_id exactly once:\n$plan")
  }

  test("aggregations are partial (map-side combine before the shuffle)") {
    val plan = formatted(SparkEntry.queries("q_agg_group")(spark, sfDir))
    // partial_ aggregate functions appear below the exchange
    assert(plan.contains("partial_sum") || plan.contains("Partial"),
      s"no map-side partial aggregation:\n$plan")
  }

  test("whole-stage codegen covers the flagship aggregation") {
    // AQE's placeholder plan reports 0 subtrees before execution —
    // disable it for this static inspection only (finally-restored: a
    // throw here must not leave the shared session AQE-less)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val plan =
      try {
        val df = SparkEntry.queries("q_agg_group")(spark, sfDir)
        df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("codegen"))
      } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    val found = "Found (\\d+) WholeStageCodegen".r
      .findFirstMatchIn(plan).map(_.group(1).toInt)
    assert(found.exists(_ >= 1), s"no codegen subtrees:\n${plan.take(500)}")
  }

  test("cosine top-k broadcasts the query side (no O(n^2) shuffle)") {
    val plan = formatted(SparkEntry.queries("q_sim_cosine_topk")(spark, sfDir))
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastHashJoin"))
  }

  test("ANN top-k ranks via the map-side heap aggregate, never a window") {
    // the window form shuffles |Q|·n scored pairs into |Q| partitions
    // (guaranteed per-query skew at scale); the heap agg crosses ≤ k
    // pairs per (query × partition)
    for (q <- Seq("q_sim_cosine_topk", "q_sim_ann_lsh", "q_sim_ann_ivf",
                  "q_sim_quantized_topk", "q_sim_ann_pq")) {
      val plan = SparkEntry.queries(q)(spark, sfDir)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("Window"), s"$q ranks via a window:\n$plan")
      assert(plan.contains("topk_pairs_by_long"),
        s"$q must heap-rank:\n$plan")
    }
  }

  test("PQ/ADC: codebook and LUT broadcast; scoring is a partial hash-agg") {
    // the serving-scale contract: the only corpus-sized frames are the
    // encode pass and the (cand, j, code) scoring join — codebook and
    // query LUT ride broadcasts, the ADC sum has map-side partials,
    // and nothing ever window-sorts per query
    val plan = formatted(SparkEntry.queries("q_sim_ann_pq")(spark, sfDir))
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"),
      s"PQ scoring must not sort-merge the corpus:\n$plan")
    assert(plan.contains("partial_sum") || plan.contains("Partial"),
      s"ADC sum needs map-side partials:\n$plan")
  }

  test("stratified sampling decides membership at the scan (map-side)") {
    val df = SparkEntry.queries("q_sample_stratified")(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    // the hash predicate must be a scan-stage DataFilter — membership
    // is decided before ANY exchange; the only shuffles are the two
    // tiny reporting aggregates'
    val scanFilter = plan.linesIterator
      .filter(_.contains("DataFilters:")).mkString
    assert(scanFilter.contains("conv(substring(md5"),
      s"hash predicate not at the scan:\n$plan")
    assert(plan.linesIterator
      .count(_.contains("Exchange hashpartitioning")) <= 2)
    assert(!plan.contains("Window"), "no window belongs in a sample")
  }

  test("contamination semi-joins against a broadcast benchmark set") {
    val df = SparkEntry.queries("q_contamination")(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), s"expected semi join:\n$plan")
    assert(plan.contains("Broadcast"), "benchmark shingles should broadcast")
    assert(!plan.contains("CartesianProduct"))
  }

  test("simhash hamming banding merge-joins (no broadcast of the self-join)") {
    val df = SparkEntry.queries("q_dedup_simhash_hamming")(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"band join shape:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"))
    // the bit_count confirmation must run inside the join stage, before
    // the pair-dedup aggregate (filter-early, SCALE.md pathology #5)
    // plan prints top-down: pair-dedup aggregate, then the bit_count
    // filter, then the band join below it
    val joinIdx = plan.indexOf("SortMergeJoin")
    val aggIdx = plan.indexOf("HashAggregate")
    val filterIdx = plan.indexOf("bit_count")
    assert(filterIdx >= 0, "bit_count filter missing from the plan")
    assert(aggIdx < filterIdx && filterIdx < joinIdx,
      "hamming filter must sit between the join and the aggregate")
  }

  test("bm25 plans TakeOrderedAndProject (no global sort for top-k)") {
    val df = SparkEntry.queries("q_text_bm25")(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"plan:\n$plan")
  }

  test("capped minhash anti-joins a BROADCAST hot set (corpus never reshuffles for the cap)") {
    // r12: q_dedup_minhash_capped's final plan now starts from the
    // materialized signature seam (minhashPairs localCheckpoints the
    // signature frame before the self-join), so the cap's anti-join
    // lives in the signature subtree — assert on it directly at the
    // API level, where the shape is still visible
    val df = graft.api.Dedup.minhashSignatures(
      graft.io.Tables.documents(spark, sfDir), col("doc_id"),
      col("text"), shingle = 3, maxShingleDocFreq = Some(5))
    val plan = df.queryExecution.executedPlan.toString
    // the cap must be a broadcast LeftAnti probe on the exploded corpus —
    // a shuffled anti-join would add a full corpus exchange per cap
    assert(plan.contains("LeftAnti"), s"cap anti-join missing:\n$plan")
    val antiLine = plan.linesIterator
      .find(l => l.contains("LeftAnti")).getOrElse("")
    assert(antiLine.contains("Broadcast"),
      s"hot-set anti-join is not broadcast:\n$antiLine")
  }

  test("multi-probe LSH expands probes on the broadcast query side only") {
    val df = SparkEntry.queries("q_sim_ann_multiprobe")(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    // probe expansion = Generate (explode) feeding the BROADCAST side;
    // the collection side must not gain an exchange or a generate
    assert(plan.contains("BroadcastHashJoin"),
      s"bucket join should broadcast the probe side:\n$plan")
    val bIdx = plan.indexOf("BroadcastExchange")
    val gIdx = plan.indexOf("Generate explode")
    assert(bIdx >= 0 && gIdx > bIdx,
      s"probe explode must sit under the broadcast exchange:\n$plan")
  }

  test("keepLatest is ONE hash-aggregate: no Window, no per-key sort") {
    val df = SparkEntry.queries("q_dedup_latest")(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"window-rank crept in:\n$plan")
    val ex = plan.linesIterator
      .count(_.contains("Exchange hashpartitioning"))
    assert(ex == 1, s"expected exactly one exchange, got $ex:\n$plan")
  }

  test("active-users covers days with ONE distinct pass + broadcast grid") {
    val df = SparkEntry.queries("q_events_active_users")(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    // one coverage explode — a second du branch would double-scan events
    val gen = plan.linesIterator.count(_.contains("Generate explode"))
    assert(gen == 1, s"expected one coverage explode, got $gen:\n$plan")
    // the day grid joins as a BROADCAST semi, never a shuffle/BNL join
    assert(plan.contains("BroadcastHashJoin") &&
           plan.contains("LeftSemi"), s"grid semi-join not broadcast:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"range-style join crept in:\n$plan")
  }

  test("boilerplate probes the corpus ONCE against a broadcast hot set") {
    val df = SparkEntry.queries("q_text_boilerplate")(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    // two explodes total: one to build the hot set, one probe pass —
    // the old three-branch form re-exploded the corpus for the totals
    val gen = plan.linesIterator.count(_.contains("Generate"))
    assert(gen == 2, s"expected two shingle explodes, got $gen:\n$plan")
    // the hot-set mark is a broadcast outer join on the probe side
    val outerLine = plan.linesIterator
      .find(l => l.contains("LeftOuter") && l.contains("Join")).getOrElse("")
    assert(outerLine.contains("Broadcast"),
      s"hot-set mark join is not broadcast:\n$outerLine\n$plan")
  }

  test("ship-priority gates orders with a SEMI join and heap-merges top-k") {
    val df = SparkEntry.queries("q_macro_ship_priority")(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    // customer is a filter, not a data source: its columns must not
    // survive past a LeftSemi join
    assert(plan.contains("LeftSemi"),
      s"customer gate is not a semi join:\n$plan")
    // top-10 through the aggregate = per-partition heaps, no global sort
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k fell back to a global sort:\n$plan")
    // both fact-side date filters reach the parquet readers
    val fmt = formatted(df)
    assert(fmt.linesIterator.filter(_.trim.startsWith("PushedFilters"))
      .count(l => l.contains("l_shipdate") || l.contains("o_orderdate")) == 2,
      s"date filters not pushed to both scans:\n$fmt")
  }

  test("local-supplier broadcasts the whole dim chain (no dim shuffle)") {
    val df = SparkEntry.queries("q_macro_local_supplier")(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    // every dim join in the chain is a broadcast: region⋈nation,
    // nation⋈supplier, lineitem⋈supplier, plus the customer join at
    // this SF — a single contains() would pass with one
    assert(plan.linesIterator.count(_.contains("BroadcastHashJoin")) >= 3,
      s"dim chain is not broadcast end-to-end:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"a dim join fell back to sort-merge:\n$plan")
    // the fact side must never reshuffle on the supplier dim key
    assert(!plan.contains("Exchange hashpartitioning(l_suppkey"),
      s"fact side shuffled on the dim key:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"cartesian crept into the star join:\n$plan")
  }

  test("the optimizer-banded range join actually rewrote (band key in plan)") {
    val df = SparkEntry.queries("q_join_range_optrule")(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("__graft_bk"),
      s"BandedRangeJoinRule did not fire:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"range join fell back to nested loops:\n$plan")
  }

  test("profile is ONE scan: multi-distinct expands, never re-reads") {
    val df = SparkEntry.queries("q_etl_profile")(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    val scans = plan.linesIterator.count(_.contains("Scan parquet"))
    assert(scans == 1, s"profiling must be scan-bound, got $scans scans:\n$plan")
    assert(plan.contains("Expand"),
      s"multi-distinct should rewrite via Expand:\n$plan")
  }

  test("ohlc is one hash-agg: no Window, no per-group sort") {
    val df = SparkEntry.queries("q_ts_ohlc")(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"ohlc must not window:\n$plan")
    // one agg exchange + the final ORDER BY range exchange only
    val ex = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(ex == 1, s"expected one agg exchange, got $ex:\n$plan")
  }

  test("scd2 plans ONE custkey exchange shared by both window passes") {
    val df = SparkEntry.queries("q_etl_scd2")(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    // lag-filter-lead all share (custkey × date,orderkey): one exchange
    // for the windows (+ one range exchange for the final ORDER BY)
    val ex = plan.linesIterator
      .count(_.contains("Exchange hashpartitioning"))
    assert(ex == 1, s"expected one window exchange, got $ex:\n$plan")
    assert(!plan.contains("Join"), s"scd2 should be join-free:\n$plan")
  }

  test("volume-shipping shuffles the fact ONCE (both dim chains broadcast)") {
    val df = SparkEntry.queries("q_macro_volume_shipping")(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    // supplier+nation and customer+nation broadcast; lineitem shuffles
    // only on l_orderkey into orders, then the agg reuses AQE exchanges
    assert(plan.contains("BroadcastHashJoin"),
      s"dim chains must broadcast:\n$plan")
    val smj = plan.linesIterator
      .count(l => l.contains("SortMergeJoin") ||
                  l.contains("ShuffledHashJoin"))
    assert(smj <= 1, s"more than the one fact join shuffles:\n$plan")
  }

  test("promo share is ONE conditional hash-agg (no second pass, no window)") {
    val df = SparkEntry.queries("q_macro_promo_share")(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"share must not window:\n$plan")
    // part broadcasts; one agg exchange on mon (+ final range exchange)
    assert(plan.contains("BroadcastHashJoin"))
    val ex = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(ex == 1, s"expected one agg exchange, got $ex:\n$plan")
  }

  test("large-orders aggregates BEFORE joining (HAVING prunes pre-join)") {
    val df = SparkEntry.queries("q_macro_large_orders")(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    // the lineitem agg + its HAVING filter must sit BELOW the join in
    // the tree. executedPlan prints top-down, so "below" = a LARGER
    // line index: the first join line must precede the first
    // HashAggregate line (a regression that joined raw lineitem to
    // orders first would print the agg ABOVE the join — smaller index;
    // the previous exists-only asserts could never fail, review r4)
    val lines = plan.linesIterator.toSeq
    val aggIdx = lines.indexWhere(_.contains("HashAggregate"))
    val joinIdx = lines.indexWhere(l =>
      l.contains("SortMergeJoin") || l.contains("ShuffledHashJoin") ||
      l.contains("BroadcastHashJoin"))
    assert(aggIdx >= 0 && joinIdx >= 0, s"agg/join missing:\n$plan")
    assert(joinIdx < aggIdx,
      s"agg (line $aggIdx) must sit under the join (line $joinIdx):\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k must heap-merge:\n$plan")
  }

  test("min-cost supplier is one argmin hash-agg (no window, dims broadcast)") {
    val df = SparkEntry.queries("q_macro_min_cost_supplier")(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"argmin must not window:\n$plan")
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("SortMergeJoin"),
      s"nothing should shuffle-join here:\n$plan")
  }

  test("interval overlap joins on the band key, never nested-loop") {
    val df = SparkEntry.queries("q_join_interval_overlap")(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop"),
      s"banding failed — nested loop join:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"banding failed — cartesian:\n$plan")
    // the equi-key includes the bucket column
    assert(plan.contains("__graft_ob"),
      s"band key missing from the join:\n$plan")
  }

  test("snapshot diff is union + ONE hash-agg (no full-outer join)") {
    val df = SparkEntry.queries("q_etl_snapshot_diff")(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"diff must be join-free:\n$plan")
    assert(plan.contains("Union"), s"union-tag shape expected:\n$plan")
    // one exchange for the key agg, one for the class rollup
    // (+ final range exchange) — never more
    val ex = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(ex <= 2, s"expected <=2 hash exchanges, got $ex:\n$plan")
  }

  test("per-group sample heap-aggregates (no per-group sort, no window)") {
    val df = SparkEntry.queries("q_sample_pergroup")(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"sample must not window:\n$plan")
    assert(plan.contains("ObjectHashAggregate") ||
           plan.contains("SortAggregate"),
      s"typed-imperative heap agg expected:\n$plan")
  }

  test("order-priority EXISTS is a LEFT SEMI (no payload, no count subq)") {
    val df = SparkEntry.queries("q_macro_order_priority")(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), s"EXISTS must plan semi:\n$plan")
    assert(!plan.contains("Window") && !plan.contains("LeftOuter"),
      s"no outer/window emulation expected:\n$plan")
  }

  test("rev-forecast pushes every predicate into the parquet reader") {
    val df = SparkEntry.queries("q_macro_rev_forecast")(spark, sfDir)
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val pushed = plan.linesIterator
      .find(_.trim.startsWith("PushedFilters")).getOrElse("")
    assert(pushed.contains("l_shipdate") && pushed.contains("l_quantity") &&
           pushed.contains("l_discount"),
      s"filters not all pushed: $pushed")
  }

  test("waiting-suppliers scans+shuffles the fact ONCE (no triple EXISTS)") {
    val df = SparkEntry.queries("q_macro_waiting_suppliers")(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    // the classic Q21 needs lineitem × lineitem × lineitem; the
    // aggregate formulation reads it exactly once
    val scans = plan.linesIterator.count(_.contains("lineitem.parquet"))
    assert(scans == 1, s"expected one lineitem scan, got $scans:\n$plan")
    assert(!plan.contains("Window"), s"no window expected:\n$plan")
  }

  test("important-stock total is a one-row broadcast (no window, no rescan)") {
    val df = SparkEntry.queries("q_macro_important_stock")(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") ||
           plan.contains("BroadcastExchange"),
      s"scalar total must broadcast:\n$plan")
    assert(!plan.contains("Window"), s"threshold must not window:\n$plan")
  }

  test("small-qty-revenue broadcasts the per-part stats back (no window)") {
    val df = SparkEntry.queries("q_macro_small_qty_revenue")(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      s"correlated avg must not window:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"per-part stats must broadcast:\n$plan")
  }

  test("triangle counting is all equi-joins (no nested loop, semi confirm)") {
    val df = SparkEntry.queries("q_graph_triangles")(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    // orientation, wedge, and closing-edge joins must all hash/merge on
    // keys — a nested-loop anywhere means the O(√m) fanout bound is lost
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
           !plan.contains("CartesianProduct"),
      s"triangle join degenerated to a nested loop:\n$plan")
    assert(plan.contains("LeftSemi"),
      s"closing-edge confirm must be a semi join:\n$plan")
  }

  test("pareto frontier: prefix attaches by broadcast, windows stay bucketed") {
    val df = SparkEntry.queries("q_skyline_pareto")(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    // the cross-bucket prefix (bucket-maxima cummax) must come back as a
    // broadcast, and the dominance test must never be a nested loop pair
    // join (the naive quadratic skyline)
    assert(plan.contains("BroadcastExchange"),
      s"bucket prefix must broadcast:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
           !plan.contains("CartesianProduct"),
      s"skyline degenerated to the all-pairs join:\n$plan")
  }

  test("weighted sampling never shuffles the corpus for the keep decision") {
    val df = SparkEntry.queries("q_sample_weighted")(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    // the one-row max attaches via broadcast nested loop (1-row build);
    // the corpus side must not sort-merge or hash-shuffle for it
    assert(plan.contains("BroadcastNestedLoopJoin") ||
           plan.contains("BroadcastExchange"),
      s"wmax must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"corpus must not shuffle for the keep decision:\n$plan")
  }

  test("fuzzy edit-distance join: gram candidates equi-join; only the bounded short set all-pairs") {
    val df = SparkEntry.queries("q_fuzzy_editdist_join")(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    // the candidate path must be a real equi-join on the gram key —
    // the oracle's quadratic cross join is exactly what this plan must
    // NOT contain for the main path
    assert(plan.contains("SortMergeJoin") ||
           plan.contains("ShuffledHashJoin") ||
           plan.contains("BroadcastHashJoin"),
      s"gram candidate join missing:\n$plan")
    // at most ONE non-equi pair join: the short-string fallback, whose
    // input is alphabet-bounded (len <= q-1+k*q), never the corpus
    val loops = plan.linesIterator.count(l =>
      l.contains("CartesianProduct") ||
      l.contains("BroadcastNestedLoopJoin"))
    assert(loops <= 1, s"$loops nested-loop joins:\n$plan")
  }

  test("equi-depth histogram: counting-sort shape — windows only above the distinct-value collapse") {
    val df = SparkEntry.queries("q_agg_histogram_eqdepth")(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    // neither failure mode may appear: a global ntile/rank over the raw
    // corpus, or N percentile_disc buffers (ObjectHashAggregate) — the
    // corpus's only wide pass is the (value, count) hash-agg; the
    // running-count window is PARTITIONED by the prefix bucket, and the
    // boundary/prefix frames come back as broadcasts
    assert(!plan.contains("percentile_disc"),
      s"single-reducer percentile buffers crept back:\n$plan")
    assert(plan.contains("BroadcastExchange"),
      s"boundary frame must broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"boundary attach degenerated:\n$plan")
    val winLines = plan.linesIterator.filter(_.contains("Window [")).toSeq
    assert(winLines.exists(_.matches(""".*Window \[.*\], \[_pb#\d+L?\], \[.*""")),
      s"running count must stay prefix-bucket-partitioned:\n${winLines.mkString("\n")}")
  }

  test("epoch shuffle: rank windows are per-shard, never global") {
    val df = SparkEntry.queries("q_shuffle_epoch")(spark, sfDir)
    // a global row_number (empty partition spec) would pull the whole
    // corpus through one task — the permutation must materialize
    // shard-by-shard. (String-matched: AQE hides WindowExec from
    // .collect until execution; the plan string prints
    // `Window [fns], [partitionSpec], [orderSpec]`.)
    val winLines = df.queryExecution.executedPlan.toString.linesIterator
      .filter(_.contains("Window [")).toSeq
    assert(winLines.nonEmpty, "expected a rank window")
    assert(winLines.forall(_.matches(""".*Window \[.*\], \[shard#\d+\], \[.*""")),
      s"epoch shuffle planned a GLOBAL window:\n${winLines.mkString("\n")}")
  }

  test("curate funnel: stage range-join sits ABOVE the per-last aggregate") {
    import org.apache.spark.sql.catalyst.plans.logical.{
      Aggregate, Join, LocalRelation, LogicalPlan}
    val lp = SparkEntry.queries("q_curate_funnel")(spark, sfDir)
      .queryExecution.optimizedPlan
    // the non-equi (last >= stage_no) join was the round-4 build-side
    // trap: the 5-row stage dim can't build-left under LEFT OUTER, so
    // a stages ⟕ corpus formulation silently broadcast the CORPUS.
    // Pin the fix structurally: one side of the range join is the
    // 5-row LocalRelation, and the other side's TOP operator (through
    // unary projections) is an Aggregate — so at most |last| rows ever
    // cross the join, no matter the corpus size.
    val rangeJoins = lp.collect {
      case j: Join if j.condition.exists(_.sql.contains(">=")) => j
    }
    assert(rangeJoins.nonEmpty, s"expected the stage range-join:\n$lp")
    @annotation.tailrec
    def throughUnary(p: LogicalPlan): LogicalPlan = p match {
      case a: Aggregate => a
      case u if u.children.size == 1 => throughUnary(u.children.head)
      case x => x
    }
    rangeJoins.foreach { j =>
      val sides = Seq(j.left, j.right)
      assert(sides.exists(
        _.collectLeaves().forall(_.isInstanceOf[LocalRelation])),
        s"one side must be the local stage dim:\n$j")
      val corpusSide = sides.find(
        s => !s.collectLeaves().forall(_.isInstanceOf[LocalRelation])).get
      assert(throughUnary(corpusSide).isInstanceOf[Aggregate],
        s"corpus side must be pre-aggregated to <=5 rows:\n$corpusSide")
    }
  }

  test("embed dim stats: one exchange, map-side partials below it") {
    val df = SparkEntry.queries("q_embed_dim_stats")(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    val ex = plan.linesIterator
      .count(_.contains("Exchange hashpartitioning"))
    assert(ex == 1, s"expected exactly one shuffle, got $ex:\n$plan")
    assert(plan.contains("partial_count") || plan.contains("partial_sum"),
      "per-dimension aggregation must combine map-side")
  }

  test("source overlap: shingle intersection is an equi-join on the shingle key") {
    val plan = SparkEntry.queries("q_source_overlap")(spark, sfDir)
      .queryExecution.executedPlan.toString
    // the intersection must be an equi-join keyed on the shingle (hash
    // or merge — AQE picks by size), never a theta/nested-loop over
    // (source, shingle) rows; the tree string prints join keys inline
    val joins = plan.linesIterator.filter(l =>
      l.contains("SortMergeJoin") || l.contains("ShuffledHashJoin") ||
      l.contains("BroadcastHashJoin")).toSeq
    assert(joins.exists(_.contains("[sh#")),
      s"shingle intersection should equi-join on the shingle key:\n$joins")
  }

  test("running distinct: ONE type-keyed exchange feeds both window sorts") {
    val plan = SparkEntry.queries("q_win_running_distinct")(spark, sfDir)
      .queryExecution.executedPlan.toString
    val ex = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(ex == 1,
      s"first-occurrence flag and cumsum must share one exchange, got $ex:\n$plan")
  }

  test("rolling distinct: the offset explode runs over BITMAPS, not rows") {
    val df = SparkEntry.queries("q_win_rolling_distinct")(spark, sfDir)
    val plan = df.queryExecution.optimizedPlan
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Generate}
    // every Generate (explode) must sit ABOVE the per-day Aggregate —
    // exploding 7 offsets on raw order rows would be the 7× blowup the
    // operator exists to avoid
    def hasAggBelow(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
        : Boolean =
      p.isInstanceOf[Aggregate] || p.children.exists(hasAggBelow)
    val gens = plan.collect { case g: Generate => g }
    assert(gens.nonEmpty, "expected the 7-offset explode")
    gens.foreach(g => assert(hasAggBelow(g.child),
      s"explode must run over per-day bitmaps, not order rows:\n$g"))
  }

  test("bitmap distinct: no Expand, no per-value shuffle rows") {
    // countDistinct plans an Expand + a value-keyed exchange; the bitmap
    // path must shuffle only fixed-size bitmap partials
    val bm = SparkEntry.queries("q_agg_bitmap_distinct")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!bm.contains("Expand"), s"bitmap path must not Expand:\n$bm")
    assert(bm.contains("partial_bitmap_construct_agg") ||
           bm.contains("bitmap_construct_agg"),
      s"bitmap partials must combine map-side:\n$bm")
    val cd = SparkEntry.queries("q_agg_distinct")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(cd.contains("Expand"),
      "sanity: the countDistinct twin does plan an Expand")
  }

  test("linreg/fano: moments fold in ONE hash-agg with map-side partials") {
    for (q <- Seq("q_stats_linreg", "q_events_fano")) {
      val plan = SparkEntry.queries(q)(spark, sfDir)
        .queryExecution.executedPlan.toString
      assert(plan.contains("partial_sum"),
        s"$q: moment aggregation must combine map-side:\n$plan")
      // no window anywhere: the statistic is pure hash-agg
      assert(!plan.contains("Window"),
        s"$q: moments must not need a window sort:\n$plan")
    }
  }

  test("spearman: windows run over the COLLAPSED rank maps, not the corpus") {
    val df = SparkEntry.queries("q_stats_spearman")(spark, sfDir)
    val plan = df.queryExecution.optimizedPlan
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LW}
    // every Window node must sit above the distinct-value collapse — a
    // window directly over the scan would sort the corpus. Since r9 the
    // collapse hides behind distCumSums' pid-pinning persist(), so the
    // probe looks through InMemoryRelation into its cached plan (the
    // HashAggregate must be what was cached).
    def hasAggBelow(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
        : Boolean = p match {
      case _: Aggregate => true
      case imr: org.apache.spark.sql.execution.columnar.InMemoryRelation =>
        imr.cachedPlan.toString.contains("HashAggregate")
      case other => other.children.exists(hasAggBelow)
    }
    val wins = plan.collect { case w: LW => w }
    assert(wins.nonEmpty, "expected rank-map windows")
    wins.foreach(w => assert(hasAggBelow(w.child),
      s"window must run above the distinct-value collapse:\n$w"))
  }

  test("sketch quantile: windows run over collapsed bins, never the corpus") {
    val df = SparkEntry.queries("q_stats_sketch_quantile")(spark, sfDir)
    val plan = df.queryExecution.optimizedPlan
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LW}
    def hasAggBelow(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
        : Boolean =
      p.isInstanceOf[Aggregate] || p.children.exists(hasAggBelow)
    val wins = plan.collect { case w: LW => w }
    assert(wins.size >= 2, "expected the bin and distinct-cent cum windows")
    wins.foreach(w => assert(hasAggBelow(w.child),
      s"cumulative window must sit above the bin/value collapse:\n$w"))
  }

  test("cusum: ONE event_type exchange, totals broadcast back") {
    val plan = SparkEntry.queries("q_events_cusum")(spark, sfDir)
      .queryExecution.executedPlan.toString
    // prefix sum and row_number must fuse into ONE Window node (one
    // per-type sort of the corpus, not one per function); the per-type
    // totals frame — tiny, already aggregated — rides a broadcast, so
    // its own exchange never touches corpus-sized data
    val wins = plan.linesIterator.count(_.contains("- Window ["))
    assert(wins == 1,
      s"prefix+rank must share one Window node, got $wins:\n$plan")
    assert(plan.contains("BroadcastExchange"), plan)
    assert(plan.contains("partial_count") || plan.contains("Partial"),
      s"argmax agg needs map-side partials:\n$plan")
  }

  test("session paths/pattern: ONE session-window sort serves the leads") {
    for (q <- Seq("q_events_paths", "q_events_seq_pattern")) {
      val plan = SparkEntry.queries(q)(spark, sfDir)
        .queryExecution.executedPlan.toString
    // sessionize's lag/cumsum and the per-session rank/leads all order
    // by the same (user, ts, id) key — Spark must plan ONE user_id
    // exchange (window group reuse), not one per window function
      val ex = plan.linesIterator
        .count(l => l.contains("Exchange hashpartitioning") &&
                    l.contains("user_id"))
      assert(ex == 1, s"$q: expected one user_id exchange, got $ex:\n$plan")
    }
  }

  test("q_graph_rcte executes as a NATIVE UnionLoop (engine-owned recursion)") {
    val df = SparkEntry.queries("q_graph_rcte")(spark, sfDir)
    val logical = df.queryExecution.optimizedPlan.toString
    val physical = df.queryExecution.executedPlan.toString
    // the recursion must reach the engine as a loop operator — if the
    // CTE were expanded or planned as anything else, the "Spark runs
    // the recursion" claim would silently regress to a rewrite
    assert(logical.contains("UnionLoop"),
      s"optimized plan lost the recursive loop:\n$logical")
    assert(physical.contains("UnionLoop"),
      s"physical plan lost the recursive loop:\n$physical")
  }

  test("q_embed_gram: the d² blow-up stays in projections — no Generate") {
    val df = SparkEntry.queries("q_embed_gram")(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    // all 36 partial sums must ride the map-side projection of ONE
    // aggregate: an explode-based shape would multiply the corpus d²×
    // into rows before the shuffle
    assert(!plan.contains("Generate [posexplode") &&
           !plan.contains("Generate [explode"),
      s"gram matrix must not explode the corpus:\n$plan")
    assert(plan.contains("partial_sum") || plan.contains("Partial"),
      s"gram sums need map-side partials:\n$plan")
  }

  test("q_embed_diversity: one-pass sum-vector identity — no Generate, no self-join") {
    val df = SparkEntry.queries("q_embed_diversity")(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    // the whole point vs the O(n²) definition: no join, no explode —
    // 66 partial sums ride one map-side projection into one hash-agg
    assert(!plan.contains("Join"),
      s"diversity must not self-join the corpus:\n$plan")
    assert(!plan.contains("Generate [posexplode") &&
           !plan.contains("Generate [explode"),
      s"diversity must not explode the corpus:\n$plan")
    assert(plan.contains("partial_sum") || plan.contains("Partial"),
      s"diversity sums need map-side partials:\n$plan")
  }

  test("q_join_range_anti rides the user_id equi key — never BroadcastNestedLoop") {
    val df = SparkEntry.queries("q_join_range_anti")(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"range anti-join lost its equi key:\n$plan")
    assert(plan.contains("LeftAnti"),
      s"anti join missing from the plan:\n$plan")
  }

  test("q_etl_table_checksum: commutative digest sum is map-side partial") {
    val df = SparkEntry.queries("q_etl_table_checksum")(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    // the reconciliation digest must combine before the exchange —
    // that is what makes it 3 tiny rows instead of the table
    assert(plan.contains("partial_sum") || plan.contains("Partial"),
      s"checksum needs map-side partial sums:\n$plan")
    assert(!plan.contains("Window"),
      s"checksum must not sort/window the corpus:\n$plan")
  }

  test("substring dedup: gram semi-join + islands window, never a doc self-join") {
    // the ExactSubstr shape: candidates come from the gram-keyed agg
    // (df>=2) semi-joined back — a corpus×corpus join or a cartesian
    // product here would be the O(n²) failure mode at 100 TB
    for (q <- Seq("q_dedup_substring", "q_dedup_substring_mass")) {
      val df = SparkEntry.queries(q)(spark, sfDir)
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("LeftSemi"),
        s"$q: shared-gram semi join missing:\n$plan")
      assert(!plan.contains("CartesianProduct") &&
             !plan.contains("BroadcastNestedLoopJoin"),
        s"$q: must never plan an all-pairs join")
    }
  }

  test("threshold sweep: conditional sums in ONE agg, no tau join at all") {
    val df = SparkEntry.queries("q_sim_threshold_sweep")(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    // all seven τ counts ride the single pair-frame aggregation as
    // conditional partial sums — a τ-dimension nested-loop join would
    // broadcast the pair frame, a hazard once pairs number millions
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
           !plan.contains("CartesianProduct"),
      s"tau fan-out must not join:\n$plan")
    val nJoins = "Join".r.findAllIn(plan).size
    assert(nJoins >= 1, s"bucket candidate join missing:\n$plan")
    assert(plan.contains("Generate") || plan.contains("stack"),
      s"constant-size stack to rows missing:\n$plan")
  }

  test("copresence: interval pairs ride the hour-bucket equi key, never all-pairs") {
    val df = SparkEntry.queries("q_events_copresence")(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"session-pair candidates must come from the bucket equi-join:\n$plan")
    // the only nested-loop join allowed is the 1-row accounting cross
    // (broadcast n_capped_slots onto the ≤30-row top-k) — it must sit
    // ABOVE the pair count agg, never on the pair-generation side
    val bnl = plan.linesIterator
      .filter(_.contains("BroadcastNestedLoopJoin")).toList
    assert(bnl.size <= 1 && bnl.forall(_.contains("Cross")),
      s"only the single-row accounting cross may nest-loop:\n$plan")
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin")
           || plan.contains("BroadcastHashJoin"),
      s"bucket equi-join missing:\n$plan")
  }

  test("multimodal decode scan prunes text; codec adds no shuffle of blobs") {
    val df = SparkEntry.queries("q_multimodal_decode")(spark, sfDir)
    val plan = formatted(df)
    val read = plan.linesIterator
      .filter(_.trim.startsWith("ReadSchema")).mkString("\n")
    // the codec generates its OWN payloads from doc_id — the documents
    // scan must not materialize the text column for it
    assert(read.contains("doc_id") && read.contains("source") &&
      !read.contains("text"),
      s"decode query should read only (doc_id, source): $read")
  }

  test("dedup-from-signatures consumes the STORE, never re-shingles") {
    // pin the PAIRS stage itself (the declared query's final plan only
    // shows the post-CC checkpointed labels — the store scan runs
    // inside the fixpoint): signatures written to a store, read back,
    // pairs built purely from the stored frame
    val store = tmpDir("sigstore") + "/sig"
    graft.api.Dedup.minhashSignatures(
        graft.io.Tables.documents(spark, sfDir),
        org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("text"))
      .write.mode("overwrite").partitionBy("k").parquet(store)
    val pairs = graft.api.Dedup.minhashPairsFromSignatures(
      spark.read.parquet(store), minMatch = 8)
    val plan = formatted(pairs)
    assert(plan.contains("sigstore"),
      s"pairs must scan the signature store:\n${plan.take(1200)}")
    // no shingle explode / md5-slot hashing anywhere in the plan —
    // the corpus text is never touched again
    assert(!plan.toLowerCase.contains("explode") && !plan.contains("md5"),
      s"stored-seam pairs must not re-shingle or re-hash:\n${plan.take(1200)}")
    // and it is a real bucket equi-join, not a cartesian shape
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin")
        || plan.contains("BroadcastHashJoin"),
      s"pairs join missing:\n${plan.take(1200)}")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"))
  }

  test("quantile norm: CDF block table broadcasts; no single-partition corpus window") {
    val df = SparkEntry.queries("q_curate_quantile_norm")(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"block-CDF range join should broadcast the block table:\n$plan")
    // the per-source rank window partitions by source — a global
    // row_number over the corpus would print 'Window' with an empty
    // partition spec; assert every Window in the plan carries one
    val windows = plan.linesIterator.filter(_.contains("Window")).toList
    // every corpus-frame Window must partition by source; the one
    // allowed unpartitioned window is the block-CDF cumsum (`cum`),
    // which runs over the BOUNDED value-block table, not the corpus
    assert(windows.nonEmpty && windows.forall(w =>
        w.contains("source") || w.contains("AS cum#")),
      s"unexpected unpartitioned corpus Window (only the bounded " +
        s"block-CDF cumsum may omit a partition spec):\n$plan")
  }

  test("copresence: every window partitioned; top-30 is the bounded heap agg") {
    // r5's worst scaler: the global row_number top-30 forced every pair
    // count through ONE task (336× wall at 100× data). The rebuilt plan
    // must carry ZERO unpartitioned windows — sessionize partitions by
    // user, the density cap by hour bucket — and take the top-30 with
    // the 30-slot topk_pairs_by_long heap (map-side partials), never a
    // single-partition sort
    // r12: the declared query's final plan now starts from the
    // materialized session-bucket seam (the capped frame is
    // localCheckpointed), so the sessionize/cap windows are asserted
    // on the same frame built through the API — identical window
    // definitions, still fully visible
    val sess = graft.api.Events.sessionize(
        graft.io.Tables.events(spark, sfDir)
          .select(col("user_id"), col("event_id"), col("ts_us")),
        key = col("user_id"), timeUs = col("ts_us"),
        tieBreak = Seq(col("event_id")), gapUs = 1800000000L)
      .groupBy(col("user_id"), col("sess"))
      .agg(min(col("ts_us")).as("s0"), max(col("ts_us")).as("e0"))
      .select(col("user_id"), col("sess"), col("s0"), col("e0"),
              explode(expr(
                "sequence(s0 div 3600000000, e0 div 3600000000)"))
                .as("hb"))
      .withColumn("_rkb", org.apache.spark.sql.functions.row_number()
        .over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("hb"))
          .orderBy(col("s0"), col("user_id"), col("sess"))))
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LW}
    val wins = sess.queryExecution.optimizedPlan.collect { case w: LW => w }
    assert(wins.nonEmpty, "expected the sessionize/cap windows")
    wins.foreach(w => assert(w.partitionSpec.nonEmpty,
      s"unpartitioned Window in copresence:\n$w"))
    val df = SparkEntry.queries("q_events_copresence")(spark, sfDir)
    val phys = df.queryExecution.executedPlan.toString
    assert(phys.contains("topk_pairs_by_long"),
      s"top-30 must ride the bounded-heap aggregate:\n${phys.take(1500)}")
    assert(!phys.contains("CartesianProduct"))
  }

  test("eval lift: rank from block CDF — no unpartitioned per-row window") {
    // deciles come from base(score block) + within-score rank: the only
    // unpartitioned windows run over AGGREGATED frames (distinct-score
    // blocks; 10 decile rows), never per-document rows
    val df = SparkEntry.queries("q_eval_lift")(spark, sfDir)
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LW}
    def hasAggBelow(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
        : Boolean =
      p.isInstanceOf[Aggregate] || p.children.exists(hasAggBelow)
    val wins = df.queryExecution.optimizedPlan.collect { case w: LW => w }
    assert(wins.nonEmpty, "expected the block-CDF and decile windows")
    wins.foreach(w => assert(w.partitionSpec.nonEmpty || hasAggBelow(w.child),
      s"unpartitioned per-row Window in eval_lift:\n$w"))
    // the CDF block table joins back by score equality on a broadcast
    val phys = df.queryExecution.executedPlan.toString
    assert(phys.contains("BroadcastHashJoin"),
      s"block-CDF join should broadcast:\n${phys.take(1500)}")
  }

  test("eval lift: block domain is grid-quantized AND guard-enforced") {
    // r6's de-weakening was nominal: blocking on the RAW double score
    // left the block frame at 82% of the corpus (4,121 distinct values
    // / 5,000 docs measured at sf0.1) — corpus-sized single-task sort
    // on diverse data. The r7 plan quantizes the score to the 1e-4
    // grid FIRST (≤ 10⁴+1 blocks at ANY corpus size, bounded by the
    // grid, not the data) and enforces it with the boundedDomain
    // assert_true guard, so outgrowing the bound fails loudly instead
    // of degrading. Both properties pinned here.
    val df = SparkEntry.queries("q_eval_lift")(spark, sfDir)
    // assert_true is RuntimeReplaceable (expands to if/raise_error at
    // analysis), so the guard is pinned by its synthetic count column
    // and its error-message literal surviving into the optimized plan
    val opt = df.queryExecution.optimizedPlan.toString
    assert(opt.contains("_dom_n") &&
           opt.contains("value-domain frame exceeded"),
      s"boundedDomain guard missing from eval_lift plan:\n${opt.take(1500)}")
    // The block key must be the EXACT-INTEGER grid cell (long), never a
    // raw or round()ed double: a DoubleType grouping key anywhere in
    // this plan means either the corpus-growing raw-score block CDF is
    // back or the cross-engine round(double,4) midpoint hazard is.
    // (The r7 pin was a substring match on "round" — satisfiable by any
    // alias or literal; this inspects the actual grouping expressions.)
    import org.apache.spark.sql.catalyst.plans.logical.Aggregate
    import org.apache.spark.sql.types.{DoubleType, LongType}
    val aggs = df.queryExecution.optimizedPlan.collect { case a: Aggregate => a }
    assert(aggs.nonEmpty, "expected the block-CDF aggregate")
    aggs.foreach(a => a.groupingExpressions.foreach(ge =>
      assert(ge.dataType != DoubleType,
        s"eval_lift groups on a double — the exact-integer 1e-4 grid " +
        s"cell was removed: $ge")))
    assert(aggs.exists(a => a.groupingExpressions.size >= 1 &&
             a.groupingExpressions.exists(_.dataType == LongType)),
      "expected a long-typed (grid-cell) grouping key in eval_lift")
    // and the guard's bound actually holds on the fixture, measured via
    // the same exact-integer cell derivation (not round(double,4))
    import spark.implicits._
    val w = split(col("text"), " ")
    val blocks = Tables.documents(spark, sfDir)
      .select(col("n_chars").cast("long").as("_chars"),
              size(w).cast("long").as("_ntok"),
              size(filter(w, t => t === "the" || t === "a"))
                .cast("long").as("_nstop"))
      .withColumn("_num",
        lit(8L) * least(col("_chars"), lit(500L)) * col("_ntok") +
        lit(3000L) * (col("_ntok") - col("_nstop")) +
        lit(375L) * least(col("_chars") - col("_ntok") + lit(1L),
                          lit(8L) * col("_ntok")))
      .select(expr("(2 * _num + _ntok) div (2 * _ntok)").as("cell"))
      .agg(countDistinct(col("cell"))).as[Long].head()
    assert(blocks <= 10001L, s"grid quantization bound violated: $blocks")
  }

  test("char-ngram sim: the corpus tokenizes at most twice") {
    // r6's worst new scaler before the fix: the per-lang norms were a
    // THIRD reference to the trigram profile and every DataFrame
    // reference re-executes its subtree — 4 full tokenize passes in
    // the physical plan (measured 32.2 s at sf10). The rebuilt plan
    // attaches norms via a lang-partitioned window over the AGGREGATED
    // profile, so only the self-join's two sides scan documents.
    val phys = SparkEntry.queries("q_text_char_ngram_sim")(spark, sfDir)
      .queryExecution.executedPlan.toString
    val scans = phys.linesIterator
      .count(l => l.contains("ReadSchema") && l.contains("documents"))
    assert(scans <= 2, s"char-ngram profile re-tokenizes the corpus: " +
      s"$scans document scans in the plan")
  }

  test("dsir: one corpus-sized token agg; bucket LMs derive from it") {
    // the bucket LMs and corpus totals must re-aggregate the
    // (doc,lang,source,bucket) counts, never re-explode the tokens —
    // a stats branch rooted at the raw explode adds a full tokenize
    // pass per reference (3 scans pre-fix)
    val phys = SparkEntry.queries("q_curate_dsir")(spark, sfDir)
      .queryExecution.executedPlan.toString
    val scans = phys.linesIterator
      .count(l => l.contains("ReadSchema") && l.contains("documents"))
    assert(scans <= 2, s"dsir re-tokenizes the corpus: $scans scans")
  }

  test("mmr: declared frame is the k-row literal — greedy ran at construction") {
    // the kmeans-trainer shape: the 5 greedy argmaxes execute as
    // construction-time jobs (each a corpus-linear pass against a
    // broadcast ≤5-vector side) and the DECLARED DataFrame is the
    // 5-row literal result — no corpus subtree may survive into it,
    // or every downstream consumer would re-run the whole greedy loop
    val df = SparkEntry.queries("q_embed_mmr")(spark, sfDir)
    val phys = df.queryExecution.executedPlan.toString
    assert(phys.contains("LocalTableScan"),
      s"mmr should declare the collected picks:\n${phys.take(1200)}")
    assert(!phys.contains("ReadSchema"),
      "no file scan may survive into the declared mmr frame")
    assert(df.count() == 5)
  }

}
