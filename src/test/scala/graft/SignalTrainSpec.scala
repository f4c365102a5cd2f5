package graft

import org.apache.spark.sql.Row

/** Property tests for the round-6 second-half operators (SignalOps /
  * TrainOps) — closed-form invariants the DuckDB hash gate can't
  * express directly: statistic ranges, exact-arithmetic identities,
  * and snapshot-isolation semantics. All at sf0.001 on the shared
  * session; the oracle gate (3 SFs) carries the cross-engine proof. */
class SignalTrainSpec extends SparkSpec {

  private def q(name: String) =
    SparkEntry.queries(name)(spark, sfDir)

  test("kendall: tau in [-1,1], full pair grid, C+D+ties >= pairs") {
    val r = q("q_ts_kendall").head()
    val nDays = r.getAs[Long]("n_days")
    val nPairs = r.getAs[Long]("n_pairs")
    assert(nPairs == nDays * (nDays - 1) / 2)
    val tau = r.getAs[Double]("tau4")
    assert(tau >= -1.0 && tau <= 1.0)
    assert(r.getAs[Long]("concordant") + r.getAs[Long]("discordant")
      <= nPairs)
  }

  test("hodges-lehmann: one row, shift bounded by the price range") {
    val r = q("q_ts_hodges_lehmann").head()
    val shift = r.getAs[Double]("hl_shift_usd")
    // weekly mean order values live in [~$800, ~$560k]; their
    // difference must too
    assert(math.abs(shift) < 600000.0 && r.getAs[Long]("n_pairs") > 0)
  }

  test("changepoint: split partitions the corpus, gain share in [0,1]") {
    val r = q("q_ts_changepoint").head()
    assert(r.getAs[Long]("n_left") + r.getAs[Long]("n_right")
      == r.getAs[Long]("n_orders"))
    val g = r.getAs[Double]("gain_share4")
    assert(g >= -0.0001 && g <= 1.0001)
  }

  test("friedman: chi2 >= 0 and complete blocks only") {
    val r = q("q_stats_friedman").head()
    assert(r.getAs[Double]("chi2_4") >= 0.0)
    assert(r.getAs[Long]("k") == 5L)
    assert(r.getAs[Long]("n_blocks") > 0)
  }

  test("macd: histogram identity holds exactly on every row") {
    val rows = q("q_ts_macd").collect()
    assert(rows.length > 300)
    rows.foreach { r =>
      assert(r.getAs[Long]("macd_mc")
        == r.getAs[Long]("ema12_mc") - r.getAs[Long]("ema26_mc"))
      assert(r.getAs[Long]("hist_mc")
        == r.getAs[Long]("macd_mc") - r.getAs[Long]("signal_mc"))
    }
  }

  test("median CI: lo <= median <= hi, ranks ordered") {
    val r = q("q_stats_median_ci").head()
    assert(r.getAs[Double]("lo_usd") <= r.getAs[Double]("median_usd"))
    assert(r.getAs[Double]("median_usd") <= r.getAs[Double]("hi_usd"))
    assert(r.getAs[Long]("r_lo") <= r.getAs[Long]("r_med") &&
      r.getAs[Long]("r_med") <= r.getAs[Long]("r_hi"))
  }

  test("dsir: every source profiled, min <= avg <= max") {
    val rows = q("q_curate_dsir").collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      assert(r.getAs[Double]("min_w4") <= r.getAs[Double]("avg_w4") + 1e-4)
      assert(r.getAs[Double]("avg_w4") <= r.getAs[Double]("max_w4") + 1e-4)
    }
  }

  test("upsample: realized multiplier lands on the target frac") {
    val target = Map("de" -> 2.5, "en" -> 1.0, "es" -> 3.0,
                     "fr" -> 2.5, "zh" -> 1.5)
    val rows = q("q_mix_upsample").collect()
    val perLang = rows.groupBy(_.getAs[String]("lang"))
    assert(perLang.keySet == target.keySet)
    perLang.foreach { case (lang, rs) =>
      val m = rs.head.getAs[Double]("realized_mult4")
      // hash16-coin expectation: within ~5pp of the target at n≈10..50
      assert(math.abs(m - target(lang)) < 0.35,
        s"$lang realized $m vs ${target(lang)}")
      // copy indices are dense 1..max
      val copies = rs.map(_.getAs[Long]("copy")).sorted
      assert(copies.head == 1L && copies.last <= 4L)
    }
  }

  test("time travel: v1 is a strict prefix of v2 and stays pinned") {
    val rows = q("q_etl_time_travel").collect()
      .sortBy(_.getAs[Long]("version"))
    val Array(v1, v2) = rows
    assert(v1.getAs[Long]("n_rows") < v2.getAs[Long]("n_rows"))
    assert(v1.getAs[Double]("rev_usd") < v2.getAs[Double]("rev_usd"))
  }

  test("char-ngram sim: all 10 lang pairs, cosine in [0,1]") {
    val rows = q("q_text_char_ngram_sim").collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      val c = r.getAs[Double]("cos4")
      assert(c >= 0.0 && c <= 1.0001, s"cos4 $c out of range")
    }
  }

  test("pca power: unit-max loading, deterministic sign, eigval > 0") {
    val rows = q("q_embed_pca_power").collect()
    assert(rows.length == 64)
    val loadings = rows.map(_.getAs[Double]("loading4"))
    assert(math.abs(loadings.map(math.abs).max - 1.0) < 1e-9)
    // sign convention: the first dim attaining max |loading| is positive
    val firstMax = rows.sortBy(_.getAs[Long]("dim"))
      .find(r => math.abs(math.abs(r.getAs[Double]("loading4")) - 1.0)
        < 1e-9).get
    assert(firstMax.getAs[Double]("loading4") > 0)
    assert(rows.head.getAs[Double]("eigval4") > 0)
  }

  test("pca power: partition-count invariance (exact decimal iterates)") {
    val a = q("q_embed_pca_power").collect().map(_.toSeq)
    val re = Tables2.repartitioned(spark, sfDir)
    val b = SparkEntry.queries("q_embed_pca_power")(spark, re)
      .collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq)
  }
}

/** Re-materialize the embeddings table at a different partition count
  * so partition-order-dependent accumulation would be caught (the
  * kmeans/bpe invariance device from round 5). */
object Tables2 {
  @volatile private var cached: String = null
  def repartitioned(spark: org.apache.spark.sql.SparkSession,
                    sfDir: String): String = synchronized {
    if (cached == null) {
      val dir = java.nio.file.Files
        .createTempDirectory("graft_repart").toString
      SparkSpec.cleanupOnExit(java.nio.file.Paths.get(dir))
      for (t <- Seq("region", "nation", "customer", "supplier", "part",
                    "orders", "lineitem", "events", "documents",
                    "embeddings")) {
        spark.read.parquet(s"$sfDir/$t.parquet").repartition(7)
          .write.mode("overwrite").parquet(s"$dir/$t.parquet")
      }
      cached = dir
    }
    cached
  }
}
