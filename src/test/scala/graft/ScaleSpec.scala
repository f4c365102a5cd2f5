package graft

import org.apache.spark.sql.functions._

import graft.io.Tables

/** Scale mechanics that single-file fixtures leave inert (SURVEY §4.2
  * notes partition pruning is a no-op on them): write a properly
  * partitioned table, then pin the pruning behaviors a 100 TB layout
  * depends on — static partition pruning from literal predicates and
  * dynamic partition pruning (DPP) injected through a dim join. */
class ScaleSpec extends SparkSpec {

  private lazy val partitionedOrders: String = {
    val dir = tmpDir("scale") + "/orders_by_year"
    Tables.orders(spark, sfDir)
      .withColumn("yr", year(col("o_orderdate")))
      .write.mode("overwrite").partitionBy("yr").parquet(dir)
    dir
  }

  test("static partition pruning: literal year filter skips partitions") {
    val df = spark.read.parquet(partitionedOrders)
      .filter(col("yr") === 1997)
      .select(col("o_orderkey"))
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val pf = plan.linesIterator
      .find(_.trim.startsWith("PartitionFilters")).getOrElse("")
    assert(pf.contains("yr"), s"no partition filter: $pf")
    // only the 1997 partition's files are scanned
    val scanned = df.queryExecution.executedPlan.collectLeaves()
      .collect { case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.selectedPartitions.partitionCount }
    assert(scanned.headOption.contains(1), s"scanned=$scanned")
  }

  test("dynamic partition pruning flows through a broadcast dim join") {
    val reuseKey =
      "spark.sql.optimizer.dynamicPartitionPruning.reuseBroadcastOnly"
    val prevReuse = spark.conf.get(reuseKey)
    spark.conf.set(reuseKey, "false")
    try dppBody()
    finally spark.conf.set(reuseKey, prevReuse)
  }

  private def dppBody(): Unit = {
    import spark.implicits._
    // DPP requires a SELECTIVE FILTER over a scannable relation on the
    // build side — a bare in-memory literal doesn't qualify
    val dimDir = tmpDir("scale") + "/year_dim"
    (1995 to 2001).map(y => (y, if (y == 1995) "keep" else "drop"))
      .toDF("d_yr", "tag").write.mode("overwrite").parquet(dimDir)
    val dim = spark.read.parquet(dimDir).filter(col("tag") === "keep")
    val joined = spark.read.parquet(partitionedOrders)
      .join(dim, col("yr") === col("d_yr"))
      .select(col("o_orderkey"), col("tag"))
    val plan = joined.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("dynamicpruning"),
      s"DPP subquery not injected:\n${plan.take(1200)}")
  }

  test("bucketed tables join with ZERO exchanges (the 100 TB fact-join plan)") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    // Spark 3+ ignores bucket sortBy order at read time by default
    // (multiple files per bucket would break it); Writers.bucketed
    // guarantees one file per bucket, so opting back in is sound and
    // elides the merge-join sorts too
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    try {
      // end-to-end through the write-side layout API
      graft.io.Writers.bucketed(
        Tables.orders(spark, sfDir), "orders_b", 4, "o_orderkey")
      graft.io.Writers.bucketed(
        Tables.lineitem(spark, sfDir), "lineitem_b", 4, "l_orderkey")
      val joined = spark.table("orders_b")
        .join(spark.table("lineitem_b"),
              col("o_orderkey") === col("l_orderkey"))
        .select(col("o_orderkey"), col("l_quantity"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      // the pre-sorted layout also elides the merge-join sorts
      assert(!plan.contains("Sort "), s"bucketed join still sorts:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.conf.set(
        "spark.sql.legacy.bucketedTableScan.outputOrdering", "false")
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }

  test("bucketed (key,time)-sorted tables feed AsOfJoinExec with ZERO exchanges") {
    // the claim AsOfJoin.scala makes ("pre-bucketed tables join with
    // zero shuffle") — proven: ClusteredDistribution is satisfied by the
    // bucketed layout and the (key, time) sortBy satisfies the merge's
    // requiredChildOrdering, so neither an Exchange nor a Sort appears
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    try {
      val e = Tables.events(spark, sfDir)
      graft.io.Writers.bucketed(
        e.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts_us")),
        "asof_l_b", 4, "user_id", sortCols = Seq("ts_us"))
      graft.io.Writers.bucketed(
        e.filter(col("event_type") === "click")
          .select(col("event_id").as("rid"), col("user_id").as("ruser"),
                  col("ts_us").as("rts")),
        "asof_r_b", 4, "ruser", sortCols = Seq("rts"))
      val l = spark.table("asof_l_b")
      val r = spark.table("asof_r_b")
      val df = graft.plans.AsOf.join(l, r,
        Seq(l("user_id")), Seq(r("ruser")), l("ts_us"), r("rts"))
      assert(df.count() > 0)
      val plan = df.queryExecution.executedPlan.toString
      // the exec prints as "AsOfJoin" (Spark strips the Exec suffix)
      assert(plan.contains("AsOfJoin"), s"custom exec not planned:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed as-of join still shuffles:\n$plan")
      assert(!plan.contains("Sort "),
        s"bucketed as-of join still sorts:\n$plan")
    } finally {
      spark.conf.set(
        "spark.sql.legacy.bucketedTableScan.outputOrdering", "false")
      spark.sql("DROP TABLE IF EXISTS asof_l_b")
      spark.sql("DROP TABLE IF EXISTS asof_r_b")
    }
  }

  test("salted join spreads a hot key and matches the plain join result") {
    import spark.implicits._
    // one pathological key carrying 10k rows + a normal tail
    val probe = ((1 to 10000).map(i => ("hot", i)) ++
      (1 to 100).map(i => (s"k$i", i))).toDF("k", "v")
    val build = (Seq("hot") ++ (1 to 100).map(i => s"k$i"))
      .map(k => (k, s"dim_$k")).toDF("bk", "payload")
    val plain = probe.join(build, col("k") === col("bk"))
      .select(col("k"), col("v"), col("payload"))
    val salted = graft.ops.Skew.saltedEquiJoin(
        probe, build, col("k"), col("bk"), 8)
      .select(col("k"), col("v"), col("payload"))
    assert(salted.count() == plain.count())
    assert(salted.except(plain).isEmpty && plain.except(salted).isEmpty)
  }

  test("Writers: partitioned layout prunes, sorted layout narrows row-group stats") {
    import graft.io.Writers
    val dir = tmpDir("writers")
    Writers.partitioned(
      Tables.orders(spark, sfDir).withColumn("yr", year(col("o_orderdate"))),
      s"$dir/part", Seq("yr"))
    val years = new java.io.File(s"$dir/part").listFiles()
      .filter(_.getName.startsWith("yr=")).map(_.getName).sorted
    assert(years.length >= 5 && years.head == "yr=1995")
    Writers.sortedWithin(Tables.lineitem(spark, sfDir),
      s"$dir/sorted", Seq("l_shipdate"), partitions = Some(2))
    val back = spark.read.parquet(s"$dir/sorted")
    assert(back.count() == Tables.lineitem(spark, sfDir).count())
    // within each file, values are clustered: every file's rows arrive
    // non-decreasing in l_shipdate (what row-group stats skipping needs)
    import spark.implicits._
    val perFile = back
      .select(input_file_name().as("f"),
              unix_micros(col("l_shipdate").cast("timestamp")).as("d"))
      .as[(String, Long)].collect().groupBy(_._1)
    assert(perFile.values.forall { rows =>
      val ds = rows.map(_._2).toSeq
      ds == ds.sorted
    })
  }

  test("zordered keeps EVERY dim local per file; a single-dim sort cannot") {
    import graft.io.Writers
    import spark.implicits._
    val dir = tmpDir("zorder")
    val bucketed = Tables.orders(spark, sfDir).select(
      (col("o_custkey") % 64).as("bx"),
      least(floor(col("o_totalprice") / 8000.0).cast("long"), lit(63L))
        .as("by"))
    Writers.zordered(bucketed, s"$dir/z",
      Seq(col("bx"), col("by")), bits = 6, files = 8)
    // baseline: same file count, range-clustered on bx ONLY (the
    // proper single-sort-key layout — each file owns a bx slice)
    bucketed.repartitionByRange(8, col("bx"))
      .sortWithinPartitions(col("bx"))
      .write.mode("overwrite").parquet(s"$dir/naive")
    // per-file average span of each dimension = the width of the
    // bucket-space window a row-group stat covers (what min/max
    // pruning can exploit)
    def spans(path: String): (Double, Double) = {
      val per = spark.read.parquet(path)
        .groupBy(input_file_name())
        .agg((max("bx") - min("bx")).as("sx"),
             (max("by") - min("by")).as("sy"))
        .select(avg("sx"), avg("sy")).as[(Double, Double)].head()
      per
    }
    val (zx, zy) = spans(s"$dir/z")
    val (nx, ny) = spans(s"$dir/naive")
    // the single-dim sort nails bx but leaves by at ~full range;
    // z-order holds BOTH well under the full 0..63 span
    assert(nx < 20, s"baseline bx span $nx — sort broken?")
    assert(ny > 50, s"baseline by span $ny unexpectedly local")
    assert(zx < 40 && zy < 40, s"z-order spans ($zx, $zy) not local")
    assert(zy < ny * 0.7, s"z-order by-span $zy not better than naive $ny")
    // row counts survive the layout
    assert(spark.read.parquet(s"$dir/z").count() == bucketed.count())
  }

  test("runtime bloom filter prunes the fact side of a selective join") {
    // at 100 TB this is the difference between scanning the whole fact
    // table and skipping most of it: a bloom filter built from the
    // filtered dim side is injected into the fact scan. Save/restore
    // ALL four confs to their prior values (the old finally restored
    // only two, to hard-coded literals — review r4 test pass)
    val conf = spark.conf
    val keys = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold")
    val prev = keys.map(k => k -> conf.get(k)).toMap
    conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100GB")
    conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val dimDir = tmpDir("bloom") + "/orders"
      Tables.orders(spark, sfDir).write.mode("overwrite").parquet(dimDir)
      val factDir = tmpDir("bloom") + "/lineitem"
      Tables.lineitem(spark, sfDir).write.mode("overwrite").parquet(factDir)
      val dim = spark.read.parquet(dimDir)
        .filter(col("o_orderpriority") === "1-URGENT")
      val joined = spark.read.parquet(factDir)
        .join(dim, col("l_orderkey") === col("o_orderkey"))
        .select(col("l_orderkey"), col("l_quantity"))
      val plan = joined.queryExecution.optimizedPlan.toString
      assert(plan.contains("bloom_filter") || plan.contains("BloomFilter"),
        s"runtime bloom filter not injected:\n$plan")
      assert(joined.count() > 0)
    } finally prev.foreach { case (k, v) => conf.set(k, v) }
  }

  test("compact collapses a small-file tail, preserving rows and order") {
    val dir = tmpDir("scale") + "/compact_me"
    val src = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_custkey"))
    // simulate a streaming sink's micro-batch litter: 40 tiny files
    src.repartition(40).write.mode("overwrite").parquet(dir)
    val before = src.count()
    val (nBefore, nAfter) = graft.io.Writers.compact(
      spark, dir, targetFileBytes = 512L * 1024,
      sortCols = Seq("o_orderkey"))
    assert(nBefore == 40, s"expected 40 litter files, got $nBefore")
    assert(nAfter < nBefore, s"no collapse: $nBefore -> $nAfter")
    val rd = spark.read.parquet(dir)
    assert(rd.count() == before)
    // same multiset of keys survives the swap
    assert(rd.agg(sum(col("o_orderkey"))).head().getLong(0) ==
           src.agg(sum(col("o_orderkey"))).head().getLong(0))
    // range clustering survives: files hold disjoint key ranges, so a
    // point predicate's row-group stats can skip whole files
    import org.apache.spark.sql.Row
    val ranges = rd.select(col("o_orderkey"),
        input_file_name().as("f"))
      .groupBy(col("f"))
      .agg(min(col("o_orderkey")).as("lo"), max(col("o_orderkey")).as("hi"))
      .collect().map { case Row(_, lo: Long, hi: Long) => (lo, hi) }
      .sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) =>
        assert(hi1 <= lo2, s"file ranges overlap: $hi1 > $lo2")
      case _ =>
    }
  }

  test("AQE coalesces the post-shuffle partitions of a small aggregate") {
    val df = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag")).agg(count(lit(1)).as("n"))
    df.collect()
    val finalPlan = df.queryExecution.executedPlan.toString
    assert(finalPlan.contains("AQEShuffleRead coalesced") ||
           finalPlan.contains("coalesced"),
      s"AQE did not coalesce:\n$finalPlan")
  }

  test("runtime bloom filter prunes the fact side of a selective shuffle join") {
    // the third pruning channel beside static PP and DPP: when the dim
    // side of a SHUFFLE join carries a selective filter, Catalyst's
    // InjectRuntimeFilter plants bloom_filter_agg(dim keys) and guards
    // the fact scan with might_contain(...) — at 100 TB this is what
    // keeps a non-partition-key semi-filtered fact scan from shuffling
    // rows the join will discard. Thresholds are sized for real
    // clusters (10 GB application side), so the fixture-sized proof
    // lowers them explicitly.
    val prev = Map(
      "spark.sql.autoBroadcastJoinThreshold" ->
        spark.conf.get("spark.sql.autoBroadcastJoinThreshold"),
      // the enabled flag must restore too — leaking it true lets
      // injected might_contain nodes flip later plan-shape asserts on
      // the shared session (review r4 finding)
      "spark.sql.optimizer.runtime.bloomFilter.enabled" ->
        spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.enabled"),
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" ->
        spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"))
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      val dir = tmpDir("scale")
      Tables.orders(spark, sfDir)
        .select(col("o_orderkey"), col("o_custkey"))
        .write.mode("overwrite").parquet(s"$dir/fact")
      Tables.customer(spark, sfDir)
        .select(col("c_custkey"), col("c_mktsegment"))
        .write.mode("overwrite").parquet(s"$dir/dim")
      val fact = spark.read.parquet(s"$dir/fact")
      val dim = spark.read.parquet(s"$dir/dim")
        .filter(col("c_mktsegment") === "BUILDING")
      val joined = fact.join(dim, col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), col("c_mktsegment"))
      val plan = joined.queryExecution.optimizedPlan.toString
      assert(plan.contains("might_contain"),
        s"no runtime bloom filter injected:\n${plan.take(1500)}")
      assert(joined.count() > 0)
    } finally prev.foreach { case (k, v) => spark.conf.set(k, v) }
  }

  test("planted skew: AQE skew-join splits the hot partition; salted join agrees") {
    // one key carries 20% of a 2M-row probe side — the planted-skew
    // validation the 100 TB narrative needs MEASURED, not just designed:
    //  (a) plain SMJ with skew handling OFF = the baseline hot-task plan
    //  (b) SMJ with AQE skewJoin ON: the executed plan must carry the
    //      skew marker (hot partition split at runtime)
    //  (c) Skew.saltedEquiJoin: the static escape hatch
    // All three must produce the identical row count; timings go to the
    // test report + SCALE.md.
    val keys = 100000L
    val probe = spark.range(2000000L).select(
      when(col("id") % 5 === 0, lit(0L))
        .otherwise(col("id") % keys + 1L).as("k"),
      col("id").as("v"))
    val build = spark.range(keys + 1).select(
      col("id").as("bk"), (col("id") * 7).as("payload"))
    val restore = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.shuffle.partitions")
      .map(k => k -> spark.conf.getOption(k)).toMap
    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    try {
      // force shuffle joins (the skewed-exchange shape); stop AQE from
      // coalescing the small tail partitions so the skew factor-vs-
      // median test sees the planted distribution
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      // cluster-like fan-out: with the suite's tiny default (4) the
      // tail partitions are so fat the hot one never clears the
      // 5x-median skew factor — 64 makes the median ~0.4 MB and the
      // planted partition ~6 MB, the shape AQE's detector targets
      spark.conf.set("spark.sql.shuffle.partitions", "64")
      // test-scale thresholds: the hot partition (~6 MB of shuffle
      // bytes) must clear the absolute bar and the 5x-median factor
      spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1MB")
      spark.conf.set(
        "spark.sql.adaptive.advisoryPartitionSizeInBytes", "1MB")

      // time + finalize each df's OWN AQE plan: toRdd.count() executes
      // this QueryExecution (df.count() would execute a fresh derived
      // plan and leave this one isFinalPlan=false)
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
      val plainDf = probe.join(build, col("k") === col("bk"))
      val (plainN, tPlain) = time(plainDf.queryExecution.toRdd.count())

      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      val aqeDf = probe.join(build, col("k") === col("bk"))
      val (aqeN, tAqe) = time(aqeDf.queryExecution.toRdd.count())
      val finalPlan = aqeDf.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true") ||
             finalPlan.contains("skewed"),
        s"AQE skew-join did not split the planted hot partition:\n" +
          finalPlan.take(2000))

      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
      val saltedDf = graft.ops.Skew.saltedEquiJoin(
        probe, build, col("k"), col("bk"), 16)
      val (saltedN, tSalted) = time(saltedDf.queryExecution.toRdd.count())

      assert(plainN == 2000000L && aqeN == plainN && saltedN == plainN)
      info(f"plain SMJ (skew off): $tPlain%.2fs; AQE skew-join: " +
        f"$tAqe%.2fs; salted(16): $tSalted%.2fs")
    } finally restore.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("value-domain windows: the cent domain grows ≪ corpus, and the guard is live") {
    // VERDICT r6 task 6. The rank-statistics family (Spearman, Mann-
    // Whitney, KS, Kruskal) runs its cumulative windows over the
    // DISTINCT value-cents frame — fine only while that domain stays
    // ≪ corpus. Three probes:
    // (a) measured: across the real fixtures rows grow 100× (sf0.001 →
    //     sf0.1) while distinct cents grows ≤ ~a few × (the price
    //     domain saturates) — the documented bound, now a number
    val probe = Seq("sf0.001", "sf0.01", "sf0.1").map { sf =>
      val e = Tables.events(spark, s"/root/testdata/$sf")
        .select((col("value").cast(graft.Determinism.Money) * 100)
          .cast("long").as("vc"))
      val r = e.agg(count(lit(1)), countDistinct(col("vc"))).head()
      (sf, r.getLong(0), r.getLong(1))
    }
    val (_, rows0, dom0) = probe.head
    val (_, rows2, dom2) = probe.last
    info(probe.map { case (sf, n, d) => s"$sf: rows=$n domain=$d" }
      .mkString("; "))
    assert(rows2 >= 90 * rows0, "fixtures should span ~100× rows")
    // measured r6: 952 → 17792 distinct cents for 1000 → 100000 rows —
    // 18.7× domain for 100× rows, density 0.95 → 0.18. The bound is
    // DENSITY DECAY (each decade of rows at least halves rows-per-
    // distinct-value... inverted: distinct/rows falls ≥2× per 100×),
    // plus an absolute headroom check against the in-code cap
    assert(dom2.toDouble / rows2 < 0.5 * dom0.toDouble / rows0,
      s"value-domain density must decay with scale: " +
      s"$dom0/$rows0 → $dom2/$rows2")
    assert(dom2 * 4 <= rows2,
      s"domain must stay ≪ corpus at the largest fixture: $dom2 vs $rows2")
    // (b) enforced: a frame past the cap fails LOUDLY (assert_true),
    //     not silently-degrades into a corpus-sized one-task sort
    val wide = spark.range(5000L).toDF("vc")
    val ex = intercept[Exception] {
      graft.Determinism.boundedDomain(wide, "probe", cap = 1000L)
        .count()
    }
    assert(ex.getMessage != null &&
           ex.toString.contains("bounded-domain") ||
           Option(ex.getCause).exists(_.toString.contains("bounded-domain")),
      s"guard must raise its own message, got: $ex")
    // (c) in-plan: the guard survives optimization inside a declared
    //     query (an unreferenced assert would be pruned away)
    // the optimizer rewrites assert_true into its raise_error form —
    // pin the guard's own message text. eval_lift carries the guard on
    // its grid-bounded block frame (mannwhitney's rank frame moved to
    // the distributed prefix sum in r8 and needs no cap at all).
    val gl = SparkEntry.queries("q_eval_lift")(spark, sfDir)
    assert(gl.queryExecution.optimizedPlan.toString
             .contains("value-domain frame exceeded"),
      "the domain guard must sit in the optimized plan")
    // (d) r8: the rank-statistics family runs NO unpartitioned window
    //     over a data-sized frame at all — every Window in the
    //     mannwhitney plan is partitioned (the distCumSums per-range
    //     frames) or sits above the ≤64-row per-partition offsets
    //     aggregate, so there is nothing for a cap to save
    val mw = SparkEntry.queries("q_events_mannwhitney")(spark, sfDir)
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LW}
    def hasAggBelow(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
        : Boolean =
      p.isInstanceOf[Aggregate] || p.children.exists(hasAggBelow)
    val wins = mw.queryExecution.optimizedPlan.collect { case w: LW => w }
    assert(wins.nonEmpty, "expected the distributed rank windows")
    wins.foreach(w => assert(w.partitionSpec.nonEmpty || hasAggBelow(w.child),
      s"unpartitioned data-sized window in mannwhitney:\n$w"))
    mw.collect() // and pass at fixture scale
  }
}
