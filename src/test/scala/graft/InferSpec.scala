package graft

/** Property tests for the round-6 third-batch operators (InferOps +
  * the TrainOps/PrivacyOps additions) — closed-form invariants the
  * DuckDB hash gate can't express: statistic ranges, exact identities
  * (MMR's greedy score decomposition, BH's prefix property), and
  * partition-count invariance for the exact-integer greedy selection.
  * All at sf0.001 on the shared session; the oracle gate (3 SFs +
  * 5-partition variant) carries the cross-engine proof. */
class InferSpec extends SparkSpec {

  private def q(name: String) =
    SparkEntry.queries(name)(spark, sfDir)

  test("cramers v: chi2 >= 0, V in [0,1], 3x5 contingency") {
    val r = q("q_stats_cramers_v").head()
    assert(r.getAs[Double]("chi2_4") >= -0.0001)
    val v = r.getAs[Double]("v4")
    assert(v >= 0.0 && v <= 1.0001, s"v4 $v out of range")
    assert(r.getAs[Long]("nr") == 3L && r.getAs[Long]("nc") == 5L)
  }

  test("theil u: both directions in [0,1], entropies positive") {
    val r = q("q_stats_theil_u").head()
    for (c <- Seq("u_pri_given_st4", "u_st_given_pri4")) {
      val u = r.getAs[Double](c)
      assert(u >= -0.0001 && u <= 1.0001, s"$c $u out of range")
    }
    assert(r.getAs[Double]("h_pri4") > 0 && r.getAs[Double]("h_st4") > 0)
    // conditioning on the 3-value status can never remove more
    // entropy than the 5-value priority carries (and vice versa)
    assert(r.getAs[Double]("h_pri4") >= r.getAs[Double]("h_st4") - 1.61)
  }

  test("page trend: L2 within the permutation extremes [70b, 110b]") {
    val r = q("q_stats_page_trend").head()
    val b = r.getAs[Long]("n_blocks")
    val l2 = r.getAs[Long]("l2")
    assert(b > 0)
    // min Σ j·R2_j = 2b·Σ j(6−j) = 70b (reversed order), max = 2b·Σ j²
    // = 110b (agreeing order); ties push strictly inside the bounds
    assert(l2 >= 70 * b && l2 <= 110 * b, s"L2 $l2 outside [${70 * b}, ${110 * b}]")
  }

  test("fdr bh: dense ranks, p-values in range, rejections a prefix") {
    val rows = q("q_stats_fdr_bh").collect()
    assert(rows.length == 25)
    val byRank = rows.sortBy(_.getAs[Long]("rnk"))
    assert(byRank.map(_.getAs[Long]("rnk")).toSeq == (1L to 25L))
    byRank.foreach { r =>
      val p6 = r.getAs[Long]("p6")
      assert(p6 >= 0L && p6 <= 1000000L)
    }
    // p6 non-decreasing in rank, and the rejected set is a prefix of
    // the rank order (the defining BH step-up property)
    val p6s = byRank.map(_.getAs[Long]("p6"))
    assert(p6s.zip(p6s.tail).forall { case (a, b) => a <= b })
    val rej = byRank.map(_.getAs[Long]("reject"))
    assert(rej.zip(rej.tail).forall { case (a, b) => a >= b },
      "rejections must form a prefix of the p-value order")
  }

  test("granger: F >= 0 and partial R2 in [0,1]") {
    val r = q("q_ts_granger").head()
    assert(r.getAs[Long]("n_days") > 100)
    // adding a regressor can never increase RSS
    assert(r.getAs[Double]("f4") >= -0.0001)
    val pr2 = r.getAs[Double]("partial_r2_4")
    assert(pr2 >= -0.0001 && pr2 <= 1.0001)
  }

  test("mmr: 5 distinct picks, exact score identity, pick1 = argmax rel") {
    val rows = q("q_embed_mmr").collect()
      .sortBy(_.getAs[Long]("pick_order"))
    assert(rows.length == 5)
    assert(rows.map(_.getAs[Long]("vec_id")).distinct.length == 5)
    rows.foreach { r =>
      assert(r.getAs[Long]("score")
        == 2 * r.getAs[Long]("rel") - r.getAs[Long]("max_prev_dot"))
    }
    assert(rows.head.getAs[Long]("max_prev_dot") == 0L)
    // the first pick is the pure-relevance argmax
    assert(rows.head.getAs[Long]("rel")
      == rows.map(_.getAs[Long]("rel")).max)
  }

  test("mmr: partition-count invariance (exact integer greedy)") {
    val a = q("q_embed_mmr").collect().map(_.toSeq)
    val re = Tables2.repartitioned(spark, sfDir)
    val b = SparkEntry.queries("q_embed_mmr")(spark, re)
      .collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq)
  }

  test("tokenizer fertility: ratios well-formed on every cell") {
    val rows = q("q_curate_tokenizer_fertility").collect()
    assert(rows.length > 10)
    rows.foreach { r =>
      // every token is >= 1 char and ceil(len/4) <= len, so:
      assert(r.getAs[Double]("fertility4") > 0)
      assert(r.getAs[Double]("bytes_per_tok4") >= 1.0)
      assert(r.getAs[Double]("multibyte_ratio4") >= 0.0)
      assert(r.getAs[Long]("bpe_tokens") <= r.getAs[Long]("ws_tokens") * 64)
    }
  }

  test("ljung-box: autocorrelations in [-1,1], Q >= 0") {
    val r = q("q_ts_ljung_box").head()
    assert(r.getAs[Long]("n_days") > 100)
    for (k <- 1 to 5) {
      val rho = r.getAs[Double](s"rho${k}_4")
      assert(rho >= -1.0001 && rho <= 1.0001, s"rho$k $rho out of range")
    }
    assert(r.getAs[Double]("q5_4") >= 0.0)
  }

  test("merge upsert: counts partition the batch, revenue shifts by the corrections") {
    val r = q("q_etl_merge_upsert").head()
    assert(r.getAs[Long]("version") == 2L)
    val o = graft.io.Tables.orders(spark, sfDir)
    assert(r.getAs[Long]("n_rows") == o.count())
    // each of the n_updated rows gained exactly $1.00
    import org.apache.spark.sql.functions._
    val raw = o.agg(sum(graft.Determinism.money("o_totalprice")))
      .head().getDecimal(0).doubleValue()
    val expect = raw + r.getAs[Long]("n_updated") * 1.0
    assert(math.abs(r.getAs[Double]("rev_usd") - expect) < 0.01)
  }

  test("wap: failed audit leaves the head pinned, success appends") {
    val rows = q("q_etl_wap").collect().sortBy(_.getAs[Long]("attempt"))
    val Array(a1, a2) = rows
    assert(a1.getAs[Long]("published") == 0L)
    assert(a1.getAs[String]("verdict") == "negative cents")
    assert(a1.getAs[Long]("head_version") == 1L)
    assert(a2.getAs[Long]("published") == 1L)
    assert(a2.getAs[String]("verdict") == "ok")
    assert(a2.getAs[Long]("head_version") == 2L)
    assert(a2.getAs[Long]("n_rows") > a1.getAs[Long]("n_rows"))
  }

  test("vacuum audit: the three categories partition the order book") {
    val rows = q("q_etl_vacuum_audit").collect()
    val byCat = rows.map(r => r.getAs[String]("category") -> r).toMap
    assert(byCat.keySet == Set("live", "unlisted", "unreferenced"))
    val total = graft.io.Tables.orders(spark, sfDir).count()
    assert(rows.map(_.getAs[Long]("n_rows")).sum == total)
    // the abandoned stage carries negated cents
    assert(byCat("unreferenced").getAs[Double]("rev_usd") <= 0.0)
    assert(byCat("live").getAs[Double]("rev_usd") > 0.0)
  }

  test("hard negatives: 5 lowest-id anchors, margin identity, no self-picks") {
    val rows = q("q_embed_hard_negatives").collect()
      .sortBy(_.getAs[Long]("anchor_id"))
    assert(rows.length == 5)
    val expectIds = graft.io.Tables.embeddings(spark, sfDir)
      .filter(org.apache.spark.sql.functions.size(
        org.apache.spark.sql.functions.col("embedding")) === 64)
      .select("vec_id").collect().map(_.getLong(0)).sorted.take(5).toSeq
    assert(rows.map(_.getAs[Long]("anchor_id")).toSeq == expectIds)
    rows.foreach { r =>
      assert(r.getAs[Long]("margin")
        == r.getAs[Long]("hard_pos_dot") - r.getAs[Long]("hard_neg_dot"))
      assert(r.getAs[Long]("hard_neg_id") != r.getAs[Long]("anchor_id"))
      assert(r.getAs[Long]("hard_pos_id") != r.getAs[Long]("anchor_id"))
    }
  }

  test("cochran-armitage: counts consistent, z finite") {
    val r = q("q_stats_cochran_armitage").head()
    assert(r.getAs[Long]("n_f") <= r.getAs[Long]("n_orders"))
    assert(!r.getAs[Double]("z4").isNaN)
  }

  test("seasonal mk: 12 seasons, positive variance, |S| bounded by the pair grid") {
    val r = q("q_stats_seasonal_mk").head()
    assert(r.getAs[Long]("n_seasons") == 12L)
    assert(r.getAs[Long]("var18") > 0L)
    val n = r.getAs[Long]("n_days")
    // pairs only form within seasons, so |S| < n²/2 trivially
    assert(math.abs(r.getAs[Long]("s_stat")) < n * n / 2)
  }

  test("hill tail: adaptive k order statistics, alpha positive") {
    val r = q("q_events_hill_tail").head()
    val users = graft.io.Tables.events(spark, sfDir)
      .select("user_id").distinct().count()
    assert(r.getAs[Long]("k") == math.min(100L, users - 1))
    assert(r.getAs[Long]("x_kp1") >= 1L)
    // every top-100 count >= the 101st, so all ln terms >= 0
    assert(r.getAs[Long]("sum_ln9") >= 0L)
    assert(r.getAs[Double]("alpha4") > 0.0)
  }

  test("compact tx: compaction preserves rows and cents bit-exactly") {
    val rows = q("q_etl_compact_tx").collect()
      .sortBy(_.getAs[String]("snapshot"))
    val Array(post, pre) = rows
    assert(pre.getAs[String]("snapshot") == "pre_compact")
    assert(pre.getAs[Long]("n_rows") == post.getAs[Long]("n_rows"))
    assert(pre.getAs[Double]("rev_usd") == post.getAs[Double]("rev_usd"))
    assert(post.getAs[Long]("head_version") == 4L)
  }

  test("dp sum: clipping bounds the release, noisy = clipped + noise") {
    val rows = q("q_privacy_dp_sum").collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val clip = r.getAs[Double]("clipped_sum_usd")
      assert(clip >= 0.0 && clip <= r.getAs[Long]("n") * 5000.0)
      assert(math.abs(r.getAs[Double]("noisy4") -
        (clip + r.getAs[Double]("noise4"))) < 1e-3)
      assert(r.getAs[Double]("epsilon") == 0.1)
    }
  }

  test("dp counts: noisy = n + noise, Laplace tail bounded by the grid") {
    val rows = q("q_privacy_dp_counts").collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val n = r.getAs[Long]("n").toDouble
      val noise = r.getAs[Double]("noise4")
      assert(math.abs(r.getAs[Double]("noisy4") - (n + noise)) < 1e-3)
      // |noise| <= b·ln(65536) — the worst case of the 2^16 hash grid
      assert(math.abs(noise) <= 20.0 * math.log(65536.0) + 1e-6)
      assert(r.getAs[Double]("epsilon") == 0.05)
    }
  }
}
