package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.io.Tables

/** MIRRORED-ORACLE AUDIT (round 8, VERDICT r7 "next round" #2).
  *
  * The correctness gate proves "Spark plan ≡ the hand-written DuckDB
  * twin" — NOT "the operator computes the right thing". The r7
  * q_ts_macd bug (signal line 10⁴ too large, green for a full round
  * because the oracle mirrored the same `* 10000`) demonstrated the
  * failure mode: any operator whose oracle shares derived constants or
  * algebra with the plan can carry a semantic bug both engines agree
  * on.
  *
  * Every test here recomputes an operator's output INDEPENDENTLY, in
  * plain Scala on the collected sf0.001 fixture, from the textbook
  * definition of the statistic — never by calling the shared
  * Determinism/SignalOps/api helpers the plans use. Exact-integer
  * outputs must match exactly (BigInt replay); 1e-4-rounded doubles
  * must match within TOL (half a grid step + float headroom), which
  * still catches every unit-scale (×10⁴), sign, and constant
  * (1.96 vs 1.64) error class.
  *
  * Families covered (the VERDICT's shared-derivation risk list):
  * EMA kernels (macd, ewma, rsi, decayed_sum), frozen z/q constants
  * (wilson, power, tukey_hsd, 2prop), rank statistics (mannwhitney,
  * mann_kendall, runs, spearman, auc), moment statistics (jarque_bera,
  * ab_ttest, linreg, gini, kl, benford, mcnemar), fixed-point PageRank,
  * DP inverse-CDF noise, and the eval_lift exact-rational grid ranker.
  */
class OracleAuditSpec extends SparkSpec {

  /** Half a 1e-4 grid step plus float headroom: a plan output rounded
    * half-up at scale 4 sits within 5e-5 of the unrounded value; the
    * independent double recompute adds ≤ ~1e-9. */
  private val TOL = 6e-5

  private def q(name: String) = SparkEntry.queries(name)(spark, sfDir)

  /** Exact cents of a money double — the DECIMAL(18,2) cast contract
    * (half-up at scale 2), recomputed via the JDK, not Catalyst. */
  private def cents(v: Double): Long =
    BigDecimal(java.lang.Double.toString(v).toDouble)
      .setScale(2, BigDecimal.RoundingMode.HALF_UP)
      .*(100).toLongExact

  /** Textbook half-up integer division: round(num/den) with den > 0,
    * negative numerators half-away-from-zero. */
  private def halfUp(num: BigInt, den: BigInt): BigInt = {
    require(den > 0)
    if (num >= 0) (num * 2 + den) / (den * 2)
    else -((-num * 2 + den) / (den * 2))
  }

  /** Standard normal CDF by adaptive Simpson integration of the
    * density — deliberately NOT the A&S erfc polynomial the plans
    * freeze, so the z-constant audits are derivation-independent. */
  private def normCdf(z: Double): Double = {
    if (z < -12) return 0.0
    if (z > 12) return 1.0
    val lo = math.min(0.0, z); val hi = math.max(0.0, z)
    val n = 20000
    val h = (hi - lo) / n
    var s = 0.0
    def f(x: Double) = math.exp(-x * x / 2) / math.sqrt(2 * math.Pi)
    for (i <- 0 until n)
      s += (f(lo + i * h) + 4 * f(lo + (i + 0.5) * h) +
            f(lo + (i + 1) * h)) * h / 6
    if (z >= 0) 0.5 + s else 0.5 - s
  }

  /** Inverse standard normal CDF by bisection over [[normCdf]]. */
  private def normInv(p: Double): Double = {
    var lo = -12.0; var hi = 12.0
    while (hi - lo > 1e-10) {
      val mid = (lo + hi) / 2
      if (normCdf(mid) < p) lo = mid else hi = mid
    }
    (lo + hi) / 2
  }

  // ----- shared fixture collections (tiny at sf0.001) -----

  private lazy val ordersRows: Seq[(Long, Long, String, Long, Long)] =
    Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
              // o_orderdate is parquet TIMESTAMP_NTZ (FIXTURES.md); the
              // epoch-day here must be derived OUTSIDE Catalyst's date
              // functions to stay independent — epoch µs floor-divided
              // by the day length, same integer contract as the oracle
              expr("unix_micros(cast(o_orderdate as timestamp))"),
              col("o_totalprice"))
      .collect().toSeq.map { r =>
        (r.getLong(0), r.getLong(1), r.getString(2),
         Math.floorDiv(r.getLong(3), 86400000000L),
         cents(r.getDouble(4)))
      }

  private lazy val eventsRows: Seq[(String, Long, Long, Long, Long)] =
    Tables.events(spark, sfDir)
      .select(col("event_type"), col("event_id"), col("user_id"),
              col("ts_us"), col("value"))
      .collect().toSeq.map { r =>
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
         cents(r.getDouble(4)))
      }

  private lazy val docRows: Seq[(Long, String, String, Long, String)] =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
              col("text"))
      .collect().toSeq.map { r =>
        (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3),
         r.getString(4))
      }

  /** Daily revenue cents keyed by epoch day — the series the signal
    * family consumes. */
  private lazy val dailyRev: Map[Long, Long] =
    ordersRows.groupMapReduce(_._4)(_._5)(_ + _)

  // =========================================================== EMA family

  /** Truncated renormalized EMA from the textbook definition:
    * w_j = round((1-α)^j·1e9), α = 2/(span+1); EMA(d) =
    * halfUp(Σ_{present j} w_j·v_{d-j} · scale, Σ_{present j} w_j). */
  private def truncEma(series: Map[Long, BigInt], span: Int, taps: Int,
                       scale: Long): Map[Long, BigInt] = {
    val w = (0 until taps)
      .map(j => BigInt(math.round(math.pow(1.0 - 2.0 / (span + 1), j) * 1e9)))
    series.keys.map { d =>
      var num = BigInt(0); var den = BigInt(0)
      for (j <- 0 until taps; v <- series.get(d - j)) {
        num += v * w(j); den += w(j)
      }
      d -> halfUp(num * scale, den)
    }.toMap
  }

  test("audit: q_ts_macd — EMA(12/26/9) replayed exactly from the definition") {
    val daily = dailyRev.map { case (k, v) => k -> BigInt(v) }
    val e12 = truncEma(daily, 12, 48, 10000L)
    val e26 = truncEma(daily, 26, 64, 10000L)
    val macd = daily.keys.map(d => d -> (e12(d) - e26(d))).toMap
    val sig = truncEma(macd, 9, 32, 1L)
    val expected = daily.keys.toSeq.sorted.map { d =>
      (d, e12(d).toLong, e26(d).toLong, macd(d).toLong,
       (macd(d) - sig(d)).toLong, sig(d).toLong)
    }
    val got = q("q_ts_macd").collect().toSeq.map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
       r.getLong(4), r.getLong(5)))
    assert(got.size == expected.size && got.nonEmpty)
    got.zip(expected).foreach { case (g, e) =>
      assert(g == e, s"macd row mismatch: got $g expected $e")
    }
  }

  test("audit: q_ts_ewma — 8-tap α=1/2 smoother replayed per event type") {
    val expected = eventsRows.groupBy(_._1).toSeq.flatMap {
      case (typ, rows) =>
        val seq = rows.sortBy(r => (r._4, r._2)) // (ts_us, event_id)
        seq.indices.map { i =>
          var num = 0L; var den = 0L
          for (j <- 0 to math.min(7, i)) {
            num += seq(i - j)._5 * (1L << (7 - j)); den += 1L << (7 - j)
          }
          (typ, seq(i)._2, num.toDouble / den / 100.0)
        }
    }.sortBy(r => (r._1, r._2))
    val got = q("q_ts_ewma").collect().toSeq.map(r =>
      (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(got.size == expected.size && got.nonEmpty)
    got.zip(expected).foreach { case (g, e) =>
      assert(g._1 == e._1 && g._2 == e._2 && math.abs(g._3 - e._3) < 1e-9,
        s"ewma mismatch: got $g expected $e")
    }
  }

  test("audit: q_agg_decayed_sum — half-life shift ladder replayed exactly") {
    val anchor = ordersRows.map(_._4).max
    val seg = Tables.customer(spark, sfDir)
      .select(col("c_custkey"), col("c_mktsegment"))
      .collect().toSeq.map(r => r.getLong(0) -> r.getString(1)).toMap
    val bySeg = ordersRows.groupBy(o => seg(o._2)).toSeq.map {
      case (segment, os) =>
        val dec = os.map { o =>
          val b = (anchor - o._4) / 180
          if (b >= 62) 0L else o._5 / (1L << b)
        }.sum
        (segment, os.size.toLong, os.map(_._5).sum.toDouble / 100.0,
         dec.toDouble / 100.0)
    }.sortBy(_._1)
    val got = q("q_agg_decayed_sum").collect().toSeq.map(r =>
      (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(got == bySeg, s"decayed_sum mismatch:\n got $got\n exp $bySeg")
  }

  test("audit: q_win_rsi — Wilder ratio over 14-row gain/loss sums, exact") {
    val days = dailyRev.keys.toSeq.sorted
    val diffs = days.sliding(2).collect {
      case Seq(p, c) => (c, dailyRev(c) - dailyRev(p))
    }.toSeq
    val expected = diffs.indices.drop(13).map { i =>
      val win = diffs.slice(i - 13, i + 1)
      val g14 = BigInt(win.map(d => math.max(d._2, 0L)).sum)
      val l14 = BigInt(win.map(d => math.max(-d._2, 0L)).sum)
      val rsi = if (g14 + l14 > 0)
        Some(halfUp(g14 * 100 * 10000, g14 + l14).toDouble / 10000.0)
      else None
      (diffs(i)._1, rsi)
    }
    val got = q("q_win_rsi").collect().toSeq.map(r =>
      (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getDouble(1))))
    assert(got.size == expected.size && got.nonEmpty)
    got.zip(expected).foreach { case (g, e) =>
      assert(g._1 == e._1 &&
        ((g._2.isEmpty && e._2.isEmpty) ||
         math.abs(g._2.get - e._2.get) < 1e-12),
        s"rsi mismatch: got $g expected $e")
    }
  }

  // ================================================ rank-statistic family

  private lazy val clickView: (Seq[Long], Seq[Long]) = {
    val cv = eventsRows.filter(r => r._1 == "click" || r._1 == "view")
    (cv.filter(_._1 == "click").map(_._5), cv.filter(_._1 == "view").map(_._5))
  }

  test("audit: q_events_mannwhitney — U and tie-corrected z from pooled ranks") {
    val (clicks, views) = clickView
    val n1 = clicks.size.toLong; val n2 = views.size.toLong
    val pooled = (clicks ++ views).sorted
    // textbook average ranks, held in exact 2× units
    val tieSizes = pooled.groupBy(identity).view.mapValues(_.size.toLong)
    val rank2 = {
      var before = 0L
      pooled.distinct.sorted.map { v =>
        val t = tieSizes(v)
        val r2 = 2 * before + t + 1
        before += t
        v -> r2
      }.toMap
    }
    val r1x2 = clicks.map(rank2).sum
    val u2 = r1x2 - n1 * (n1 + 1) // = 2·U_click
    val tsum = tieSizes.values.map(t => t * t * t - t).sum
    val n = n1 + n2
    val sigma = math.sqrt(n1.toDouble * n2 / 12.0 *
      ((n + 1).toDouble - tsum.toDouble / (n.toDouble * (n - 1))))
    val z = (u2.toDouble / 2.0 - n1.toDouble * n2 / 2.0) / sigma
    val row = q("q_events_mannwhitney").head()
    assert(row.getLong(0) == n1 && row.getLong(1) == n2)
    assert(row.getLong(2) == u2, s"U×2: got ${row.getLong(2)} expected $u2")
    assert(math.abs(row.getDouble(3) - z) < TOL,
      s"z: got ${row.getDouble(3)} expected $z")
  }

  test("audit: q_stats_mann_kendall — S, tie-corrected variance, z") {
    val daily = eventsRows.groupBy(_._4 / 86400000000L).view
      .mapValues(_.size.toLong).toSeq.sortBy(_._1)
    val s0 = (for {
      i <- daily.indices; j <- daily.indices if j > i
    } yield math.signum(daily(j)._2.toDouble - daily(i)._2).toLong).sum
    val n = daily.size.toLong
    val ties = daily.groupBy(_._2).values.map(_.size.toLong)
    val var18 = n * (n - 1) * (2 * n + 5) -
      ties.map(t => t * (t - 1) * (2 * t + 5)).sum
    val z =
      if (s0 > 0) (s0 - 1).toDouble / math.sqrt(var18 / 18.0)
      else if (s0 < 0) (s0 + 1).toDouble / math.sqrt(var18 / 18.0)
      else 0.0
    val row = q("q_stats_mann_kendall").head()
    assert(row.getLong(0) == n && row.getLong(1) == s0 &&
           row.getLong(2) == var18,
      s"MK integers: got $row expected ($n, $s0, $var18)")
    assert(math.abs(row.getDouble(3) - z) < TOL)
  }

  test("audit: q_stats_runs_test — Wald–Wolfowitz runs count and z") {
    val daily = eventsRows.groupBy(_._4 / 86400000000L).view
      .mapValues(_.size.toLong).toSeq.sortBy(_._1).map(_._2)
    val signs = daily.sliding(2).collect {
      case Seq(p, c) if c != p => if (c > p) 1 else -1
    }.toSeq
    val nUp = signs.count(_ == 1).toLong
    val nDown = signs.count(_ == -1).toLong
    val runs = if (signs.isEmpty) 0L
      else 1L + signs.sliding(2).count {
        case Seq(a, b) => a != b; case _ => false }
    val n = nUp + nDown; val p2 = 2.0 * nUp * nDown
    val z = (runs - (1.0 + p2 / n)) /
      math.sqrt(p2 * (p2 - n) / (n.toDouble * n * (n - 1)))
    val row = q("q_stats_runs_test").head()
    assert(row.getLong(0) == nUp && row.getLong(1) == nDown &&
           row.getLong(2) == runs,
      s"runs integers: got $row expected ($nUp, $nDown, $runs)")
    assert(math.abs(row.getDouble(3) - z) < TOL)
  }

  test("audit: q_stats_spearman — ρ from textbook average ranks") {
    val base = Tables.lineitem(spark, sfDir)
      .select(col("l_quantity"), col("l_extendedprice"))
      .collect().toSeq.map(r => (cents(r.getDouble(0)), cents(r.getDouble(1))))
    def avgRanks(vs: Seq[Long]): Map[Long, Double] = {
      val sorted = vs.sorted
      val firstIdx = scala.collection.mutable.Map.empty[Long, Int]
      sorted.zipWithIndex.foreach { case (v, i) =>
        if (!firstIdx.contains(v)) firstIdx(v) = i
      }
      val counts = vs.groupBy(identity).view.mapValues(_.size)
      counts.map { case (v, c) =>
        v -> (firstIdx(v) + 1 + (firstIdx(v) + c)) / 2.0
      }.toMap
    }
    val rx = avgRanks(base.map(_._1)); val ry = avgRanks(base.map(_._2))
    val n = base.size
    val xs = base.map(b => rx(b._1)); val ys = base.map(b => ry(b._2))
    val mx = xs.sum / n; val my = ys.sum / n
    val cov = xs.zip(ys).map { case (a, b) => (a - mx) * (b - my) }.sum
    val vx = xs.map(a => (a - mx) * (a - mx)).sum
    val vy = ys.map(b => (b - my) * (b - my)).sum
    val rho = cov / math.sqrt(vx * vy)
    val row = q("q_stats_spearman").head()
    assert(row.getLong(0) == n.toLong)
    assert(math.abs(row.getDouble(1) - rho) < TOL,
      s"rho: got ${row.getDouble(1)} expected $rho")
  }

  test("audit: q_eval_auc — rank AUC per source from average positive ranks") {
    val expected = docRows.groupBy(_._3).toSeq.flatMap {
      case (source, docs) =>
        val nPos = docs.count(_._2 == "en").toLong
        val nNeg = docs.size - nPos
        if (nPos == 0 || nNeg == 0) None
        else {
          // average rank of each doc under score = n_chars ascending
          val sorted = docs.map(_._4).sorted
          val firstIdx = scala.collection.mutable.Map.empty[Long, Int]
          sorted.zipWithIndex.foreach { case (v, i) =>
            if (!firstIdx.contains(v)) firstIdx(v) = i
          }
          val counts = docs.groupBy(_._4).view.mapValues(_.size)
          val avgRank = counts.map { case (v, c) =>
            v -> (firstIdx(v) + 1 + (firstIdx(v) + c)) / 2.0
          }.toMap
          val rPos = docs.filter(_._2 == "en").map(d => avgRank(d._4)).sum
          val auc = (rPos - nPos * (nPos + 1) / 2.0) / (nPos.toDouble * nNeg)
          Some((source, nPos, nNeg, auc))
        }
    }.sortBy(_._1)
    val got = q("q_eval_auc").collect().toSeq.map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.size == expected.size && got.nonEmpty)
    got.zip(expected).foreach { case (g, e) =>
      assert(g._1 == e._1 && g._2 == e._2 && g._3 == e._3 &&
             math.abs(g._4 - e._4) < TOL,
        s"auc mismatch: got $g expected $e")
    }
  }

  // ================================================ moment / test family

  test("audit: q_events_ab_ttest — Welch t from two-pass mean/variance") {
    val (clicks, views) = clickView
    def stats(v: Seq[Long]): (Double, Double) = {
      val m = v.map(BigInt(_)).sum.toDouble / v.size
      val s2 = v.map(x => (x - m) * (x - m)).sum / (v.size - 1).toDouble
      (m, s2)
    }
    val (m1, v1) = stats(clicks); val (m2, v2) = stats(views)
    val t = (m1 - m2) / math.sqrt(v1 / clicks.size + v2 / views.size)
    val row = q("q_events_ab_ttest").head()
    assert(row.getLong(0) == clicks.size.toLong &&
           row.getLong(1) == views.size.toLong)
    assert(math.abs(row.getDouble(2) - m1 / 100.0) < TOL)
    assert(math.abs(row.getDouble(3) - m2 / 100.0) < TOL)
    assert(math.abs(row.getDouble(4) - t) < TOL,
      s"t: got ${row.getDouble(4)} expected $t")
  }

  test("audit: q_stats_jarque_bera — JB from two-pass central moments") {
    val expected = eventsRows.groupBy(_._1).toSeq.map { case (typ, rows) =>
      val v = rows.map(_._5)
      val n = v.size
      val m = v.map(BigInt(_)).sum.toDouble / n
      val m2 = v.map(x => math.pow(x - m, 2)).sum / n
      val m3 = v.map(x => math.pow(x - m, 3)).sum / n
      val m4 = v.map(x => math.pow(x - m, 4)).sum / n
      val g1 = m3 / math.pow(m2, 1.5)
      val g2 = m4 / (m2 * m2) - 3.0
      (typ, n.toLong, n / 6.0 * (g1 * g1 + g2 * g2 / 4.0))
    }.sortBy(_._1)
    val got = q("q_stats_jarque_bera").collect().toSeq.map(r =>
      (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(got.size == expected.size && got.nonEmpty)
    got.zip(expected).foreach { case (g, e) =>
      assert(g._1 == e._1 && g._2 == e._2 &&
        math.abs(g._3 - e._3) < math.max(TOL, 1e-6 * math.abs(e._3)),
        s"jb mismatch: got $g expected $e")
    }
  }

  test("audit: q_stats_linreg — OLS slope/intercept from exact moments") {
    val base = Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag"), col("l_quantity"), col("l_extendedprice"))
      .collect().toSeq.map(r =>
        (r.getString(0), cents(r.getDouble(1)) / 100, cents(r.getDouble(2))))
    val expected = base.groupBy(_._1).toSeq.map { case (flag, rows) =>
      val n = rows.size
      val sx = rows.map(r => BigInt(r._2)).sum
      val sy = rows.map(r => BigInt(r._3)).sum
      val sxy = rows.map(r => BigInt(r._2) * BigInt(r._3)).sum
      val sxx = rows.map(r => BigInt(r._2) * BigInt(r._2)).sum
      val num = (BigInt(n) * sxy - sx * sy).toDouble
      val den = (BigInt(n) * sxx - sx * sx).toDouble
      val slope = num / den
      val icept = (sy.toDouble - slope * sx.toDouble) / n
      (flag, n.toLong, slope, icept)
    }.sortBy(_._1)
    val got = q("q_stats_linreg").collect().toSeq.map(r =>
      (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(got.size == expected.size && got.nonEmpty)
    got.zip(expected).foreach { case (g, e) =>
      assert(g._1 == e._1 && g._2 == e._2 &&
        math.abs(g._3 - e._3) < TOL &&
        math.abs(g._4 - e._4) < math.max(TOL, 1e-9 * math.abs(e._4)),
        s"linreg mismatch: got $g expected $e")
    }
  }

  test("audit: q_stats_mcnemar — discordant pairs and χ², exact") {
    val byCust = ordersRows.groupBy(_._2)
    val b10 = byCust.values.count(os =>
      os.exists(_._3 == "F") && !os.exists(_._3 == "O")).toLong
    val b01 = byCust.values.count(os =>
      !os.exists(_._3 == "F") && os.exists(_._3 == "O")).toLong
    val chi2 = halfUp(BigInt(b10 - b01).pow(2) * 10000, BigInt(b10 + b01))
      .toDouble / 10000.0
    val row = q("q_stats_mcnemar").head()
    assert(row.getLong(0) == byCust.size.toLong &&
           row.getLong(1) == b10 && row.getLong(2) == b01)
    assert(math.abs(row.getDouble(3) - chi2) < 1e-12)
  }

  test("audit: q_stats_gini — inequality coefficient from the sorted sum") {
    val rev = ordersRows.groupBy(_._2).toSeq
      .map { case (ck, os) => (ck, os.map(_._5).sum) }
      .sortBy(r => (r._2, r._1))
    val n = rev.size
    val sx = rev.map(r => BigInt(r._2)).sum
    val six = rev.zipWithIndex.map { case (r, i) =>
      BigInt(i + 1) * BigInt(r._2) }.sum
    val gini = (BigInt(2) * six - BigInt(n + 1) * sx).toDouble /
      (BigInt(n) * sx).toDouble
    val row = q("q_stats_gini").head()
    assert(row.getLong(0) == n.toLong)
    assert(math.abs(row.getDouble(1) - gini) < TOL)
  }

  test("audit: q_mix_kl — divergence vs the declared target mix") {
    val target = Map("de" -> 0.15, "en" -> 0.40, "es" -> 0.10,
                     "fr" -> 0.15, "zh" -> 0.20)
    val n = docRows.size.toDouble
    val kl = target.toSeq.sortBy(_._1).map { case (l, qp) =>
      val c = docRows.count(_._2 == l)
      if (c == 0) 0.0 else (c / n) * math.log(c / n / qp)
    }.sum
    val row = q("q_mix_kl").head()
    assert(row.getLong(0) == docRows.size.toLong)
    assert(math.abs(row.getDouble(1) - kl) < TOL,
      s"kl: got ${row.getDouble(1)} expected $kl")
  }

  test("audit: q_stats_benford — leading digit shares and log10 expectation") {
    val digits = ordersRows.map(_._5.toString.head.asDigit)
    val tot = digits.size.toLong
    val expected = digits.groupBy(identity).toSeq.map { case (d, xs) =>
      (d, xs.size.toLong,
       halfUp(BigInt(xs.size) * 10000, BigInt(tot)).toDouble / 10000.0,
       math.log10(1.0 + 1.0 / d))
    }.sortBy(_._1)
    val got = q("q_stats_benford").collect().toSeq.map(r =>
      (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(got.size == expected.size && got.nonEmpty)
    got.zip(expected).foreach { case (g, e) =>
      assert(g._1 == e._1 && g._2 == e._2 &&
        math.abs(g._3 - e._3) < 1e-12 && math.abs(g._4 - e._4) < TOL,
        s"benford mismatch: got $g expected $e")
    }
  }

  // ======================================== frozen-constant family

  test("audit: q_stats_wilson — interval recomputed with textbook z=1.96") {
    // funnel population recomputed independently: n = users with a
    // view; k = those with a purchase strictly after their first view
    val byUser = eventsRows.groupBy(_._3)
    val viewers = byUser.collect {
      case (u, evs) if evs.exists(_._1 == "view") =>
        u -> evs.filter(_._1 == "view").map(_._4).min
    }
    val n = viewers.size.toLong
    val k = viewers.count { case (u, mv) =>
      byUser(u).exists(e => e._1 == "purchase" && e._4 > mv)
    }.toLong
    val z2 = 1.96 * 1.96
    val ctr = (k + z2 / 2) / (n + z2)
    val hw = 1.96 / (n + z2) * math.sqrt(k.toDouble * (n - k) / n + z2 / 4)
    val row = q("q_stats_wilson").head()
    assert(row.getLong(0) == n && row.getLong(1) == k,
      s"wilson counts: got (${row.getLong(0)}, ${row.getLong(1)}) " +
      s"expected ($n, $k)")
    assert(math.abs(row.getDouble(2) - k.toDouble / n) < TOL)
    assert(math.abs(row.getDouble(3) - (ctr - hw)) < TOL)
    assert(math.abs(row.getDouble(4) - (ctr + hw)) < TOL)
  }

  test("audit: q_stats_2prop — pooled two-proportion z from exact counts") {
    def yearOf(epochDay: Long) =
      java.time.LocalDate.ofEpochDay(epochDay).getYear
    val g = ordersRows.filter(o => Set(1997, 1998)(yearOf(o._4)))
      .groupBy(o => yearOf(o._4))
    val (n1, k1) = (g(1997).size.toLong, g(1997).count(_._3 == "F").toLong)
    val (n2, k2) = (g(1998).size.toLong, g(1998).count(_._3 == "F").toLong)
    val p1 = k1.toDouble / n1; val p2 = k2.toDouble / n2
    val pp = (k1 + k2).toDouble / (n1 + n2)
    val z = (p1 - p2) / math.sqrt(pp * (1 - pp) * (1.0 / n1 + 1.0 / n2))
    val row = q("q_stats_2prop").head()
    assert(row.getLong(0) == n1 && row.getLong(1) == k1 &&
           row.getLong(2) == n2 && row.getLong(3) == k2)
    assert(math.abs(row.getDouble(4) - p1) < TOL)
    assert(math.abs(row.getDouble(5) - p2) < TOL)
    assert(math.abs(row.getDouble(6) - z) < TOL)
  }

  test("audit: q_stats_power — the frozen 7.849 IS (z₀.₉₇₅+z₀.₈₀)², and nreq") {
    // the z constants re-derived by numeric inversion of an integrated
    // normal CDF — no erfc polynomial, no stats library
    val zsum = normInv(0.975) + normInv(0.80)
    assert(math.abs(zsum * zsum - 7.849) < 5e-4,
      s"frozen constant drifted from first principles: (z975+z80)^2 = " +
      s"${zsum * zsum}, plan froze 7.849")
    val (clicks, views) = clickView
    def stats(v: Seq[Long]): (Double, Double) = {
      val m = v.map(BigInt(_)).sum.toDouble / v.size
      (m, v.map(x => (x - m) * (x - m)).sum / (v.size - 1).toDouble)
    }
    val (m1, v1) = stats(clicks); val (m2, v2) = stats(views)
    val nreq = math.ceil(7.849 * (v1 + v2) / ((m1 - m2) * (m1 - m2))).toLong
    val row = q("q_stats_power").head()
    assert(row.getLong(0) == clicks.size.toLong &&
           row.getLong(1) == views.size.toLong)
    assert(math.abs(row.getDouble(2) - math.abs(m1 - m2) / 100.0) < TOL)
    assert(row.getLong(3) == nreq,
      s"n_required: got ${row.getLong(3)} expected $nreq")
    assert(row.getBoolean(4) ==
      (clicks.size >= nreq && views.size >= nreq))
  }

  test("audit: q_stats_tukey_hsd — pairwise HSD from two-pass group stats") {
    val byLang = docRows.groupBy(_._2).view.mapValues(_.map(_._4)).toMap
    val k = byLang.size
    val nn = docRows.size
    val means = byLang.view.mapValues(v =>
      v.map(BigInt(_)).sum.toDouble / v.size).toMap
    val ssw = byLang.map { case (l, v) =>
      v.map(x => math.pow(x - means(l), 2)).sum }.sum
    val msw = ssw / (nn - k)
    val langs = byLang.keys.toSeq.sorted
    val expected = for {
      a <- langs; b <- langs if a < b
    } yield {
      val hsd = 3.478 * math.sqrt(
        msw * (1.0 / byLang(a).size + 1.0 / byLang(b).size) / 2.0)
      val diff = math.abs(means(a) - means(b))
      (a, b, byLang(a).size.toLong, byLang(b).size.toLong,
       diff, hsd, diff > hsd)
    }
    val got = q("q_stats_tukey_hsd").collect().toSeq.map(r =>
      (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
       r.getDouble(4), r.getDouble(5), r.getBoolean(6)))
    assert(got.size == expected.size && got.nonEmpty)
    got.zip(expected).foreach { case (g, e) =>
      assert(g._1 == e._1 && g._2 == e._2 && g._3 == e._3 && g._4 == e._4,
        s"tukey key mismatch: got $g expected $e")
      assert(math.abs(g._5 - e._5) < math.max(TOL, 1e-9 * e._5) &&
             math.abs(g._6 - e._6) < math.max(TOL, 1e-9 * e._6) &&
             g._7 == e._7,
        s"tukey stats mismatch: got $g expected $e")
    }
  }

  test("audit: q_privacy_dp_counts — Laplace inverse-CDF noise on the u16 grid") {
    val custSeg = Tables.customer(spark, sfDir)
      .select(col("c_mktsegment")).collect().toSeq.map(_.getString(0))
    val counts = custSeg.groupBy(identity).view.mapValues(_.size.toLong)
      .toSeq.sortBy(_._1)
    // u recomputed via the JDK's MD5, not Catalyst's
    def u16(s: String): Int = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      Integer.parseInt(d.take(2).map("%02x".format(_)).mkString, 16)
    }
    val expected = counts.map { case (seg, n) =>
      val u = (u16(seg + ":dp") + 0.5) / 65536.0
      val noise = -20.0 * math.signum(u - 0.5) *
        math.log(1.0 - 2.0 * math.abs(u - 0.5))
      (seg, n, noise, n + noise)
    }
    val got = q("q_privacy_dp_counts").collect().toSeq.map(r =>
      (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
       r.getDouble(4)))
    assert(got.size == expected.size && got.nonEmpty)
    got.zip(expected).foreach { case (g, e) =>
      assert(g._1 == e._1 && g._2 == e._2 &&
        math.abs(g._3 - e._3) < TOL && math.abs(g._4 - e._4) < TOL &&
        g._5 == 0.05,
        s"dp_counts mismatch: got $g expected $e")
      // and the released noise really is Laplace(b=20): inverting the
      // CDF must land back on the (j+0.5)/65536 grid
      val uBack = if (e._3 >= 0) 0.5 - (1 - math.exp(-e._3 / 20.0)) / 2
                  else 0.5 + (1 - math.exp(e._3 / 20.0)) / 2
      val gridPos = uBack * 65536.0 - 0.5
      assert(math.abs(gridPos - math.round(gridPos)) < 1e-6,
        s"noise for ${e._1} is not an inverse-CDF draw on the u16 grid")
    }
  }

  // ======================================== fixed-point / graph family

  test("audit: q_graph_pagerank — fixed-point ranks track a double PageRank") {
    // co-supply graph recomputed from raw tables
    val wk = ordersRows.filter { o =>
      val d = java.time.LocalDate.ofEpochDay(o._4)
      !d.isBefore(java.time.LocalDate.of(1997, 1, 1)) &&
      d.isBefore(java.time.LocalDate.of(1997, 1, 8))
    }.map(_._1).toSet
    val ls = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_suppkey"))
      .collect().toSeq.map(r => (r.getLong(0), r.getLong(1)))
      .filter(r => wk(r._1)).distinct
    val byOrder = ls.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val edges = byOrder.values.flatMap(ss =>
      for (a <- ss; b <- ss if a != b) yield (a, b)).toSet
    assert(edges.nonEmpty, "co-supply graph empty at sf0.001 — audit moot")
    val nodes = edges.flatMap(e => Seq(e._1, e._2))
    val odeg = edges.groupBy(_._1).view.mapValues(_.size).toMap
    var r = nodes.map(_ -> 1.0).toMap
    for (_ <- 1 to 3) {
      val c = scala.collection.mutable.Map.empty[Long, Double]
        .withDefaultValue(0.0)
      edges.foreach { case (s0, d0) => c(d0) += r(s0) / odeg(s0) }
      r = nodes.map(n => n -> (0.15 + 0.85 * c(n))).toMap
    }
    val got = q("q_graph_pagerank").collect().toSeq.map(x =>
      (x.getLong(0), x.getLong(1)))
    assert(got.size == nodes.size)
    got.foreach { case (node, rankE12) =>
      val mine = r(node)
      assert(math.abs(rankE12 / 1e12 - mine) < 1e-5,
        s"pagerank($node): got ${rankE12 / 1e12} expected $mine")
    }
  }

  // ======================================== exact-rational grid ranker

  test("audit: q_eval_lift — decile lift/gains replayed with exact rationals") {
    val scored = docRows.map { d =>
      val toks = d._5.split(" ", -1)
      val ntok = toks.length.toLong
      val nstop = toks.count(t => t == "the" || t == "a").toLong
      val chars = d._4
      val num = 8 * math.min(chars, 500L) * ntok +
        3000 * (ntok - nstop) +
        375 * math.min(chars - ntok + 1, 8 * ntok)
      val cell = (2 * num + ntok) / (2 * ntok)
      (d._1, if (d._2 == "en") 1L else 0L, cell)
    }
    val n = scored.size.toLong
    val p = scored.map(_._2).sum
    val ranked = scored.sortBy(s => (-s._3, s._1)).zipWithIndex
    val byDecile = ranked.groupBy { case (_, i) => i.toLong * 10 / n }
      .toSeq.sortBy(_._1)
    var cpos = 0L
    val expected = byDecile.map { case (dec, rows) =>
      val nd = rows.size.toLong
      val pos = rows.map(_._1._2).sum
      cpos += pos
      val lift = halfUp(BigInt(pos) * n * 10000, BigInt(nd) * p)
        .toDouble / 10000.0
      val gains = halfUp(BigInt(cpos) * 10000, BigInt(p)).toDouble / 10000.0
      (dec, nd, pos, lift, gains)
    }
    val got = q("q_eval_lift").collect().toSeq.map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
       r.getDouble(4)))
    assert(got == expected,
      s"eval_lift mismatch:\n got $got\n exp $expected")
  }

  // ============== r10: the inferential batch-5-7 family (VERDICT r9
  // #6 — granger, ljung_box, cochran_armitage, seasonal_mk, page_trend,
  // fdr_bh leaned on the hash gate alone; the MACD lesson says a
  // mirrored oracle can be green while wrong). Plain-Scala textbook
  // replays, no shared helpers with the plans.

  /** Orders with the fields this family consumes: epoch day, calendar
    * month/ym from java.time (NOT Catalyst's year()/month()), the
    * priority's leading digit parsed from the raw string, status, and
    * exact cents. */
  private lazy val prioRows: Seq[(Long, Int, Long, Long, String, Long)] =
    Tables.orders(spark, sfDir)
      .select(expr("unix_micros(cast(o_orderdate as timestamp))"),
              col("o_orderpriority"), col("o_orderstatus"),
              col("o_totalprice"))
      .collect().toSeq.map { r =>
        val day = Math.floorDiv(r.getLong(0), 86400000000L)
        val date = java.time.LocalDate.ofEpochDay(day)
        (day, date.getMonthValue,
         date.getYear.toLong * 100 + date.getMonthValue,
         r.getString(1).takeWhile(_.isDigit).toLong,
         r.getString(2), cents(r.getDouble(3)))
      }

  test("audit: q_ts_granger — lag-1 F test from a plain two-variable " +
       "OLS on the daily series") {
    val daily = prioRows.groupBy(_._1).view.mapValues(rs =>
      (rs.size.toLong, rs.map(r => BigInt(r._6)).sum)).toMap
    val pairs = daily.toSeq.flatMap { case (d, (_, y)) =>
      daily.get(d - 1).map { case (xl, yl) =>
        (y.toDouble, yl.toDouble, xl.toDouble) }
    }
    val n = pairs.size
    def mean(v: Seq[Double]) = v.sum / v.size
    val (ys, yls, xls) = (pairs.map(_._1), pairs.map(_._2),
                          pairs.map(_._3))
    val (my, myl, mxl) = (mean(ys), mean(yls), mean(xls))
    def c(a: Seq[Double], ma: Double, b: Seq[Double], mb: Double) =
      a.zip(b).map { case (x, z) => (x - ma) * (z - mb) }.sum
    val cyy = c(ys, my, ys, my); val cylyl = c(yls, myl, yls, myl)
    val cxlxl = c(xls, mxl, xls, mxl); val cyyl = c(ys, my, yls, myl)
    val cyxl = c(ys, my, xls, mxl); val cylxl = c(yls, myl, xls, mxl)
    val rssR = cyy - cyyl * cyyl / cylyl
    val det = cylyl * cxlxl - cylxl * cylxl
    val b1 = (cyyl * cxlxl - cyxl * cylxl) / det
    val b2 = (cyxl * cylyl - cyyl * cylxl) / det
    val rssU = cyy - b1 * cyyl - b2 * cyxl
    val f = (rssR - rssU) * (n - 3) / rssU
    val pr2 = 1.0 - rssU / rssR
    val row = q("q_ts_granger").head()
    assert(row.getLong(0) == n.toLong, s"n_days ${row.getLong(0)} != $n")
    assert(math.abs(row.getDouble(1) - f) < TOL,
      s"f4: got ${row.getDouble(1)} expected $f")
    assert(math.abs(row.getDouble(2) - pr2) < TOL,
      s"partial_r2: got ${row.getDouble(2)} expected $pr2")
  }

  test("audit: q_ts_ljung_box — lag 1..5 autocorrelations and Q from " +
       "mean-centered pair sums") {
    val daily = prioRows.groupMapReduce(_._1)(r => BigInt(r._6))(_ + _)
    val n = daily.size
    val mu = daily.values.sum.toDouble / n
    val denom = daily.values.map(v => (v.toDouble - mu) *
                                      (v.toDouble - mu)).sum
    val rhos = (1 to 5).map { k =>
      daily.toSeq.flatMap { case (d, y) =>
        daily.get(d - k).map(yl =>
          (y.toDouble - mu) * (yl.toDouble - mu))
      }.sum / denom
    }
    val q5 = n.toDouble * (n + 2) *
      rhos.zipWithIndex.map { case (r, i) => r * r / (n - i - 1) }.sum
    val row = q("q_ts_ljung_box").head()
    assert(row.getLong(0) == n.toLong)
    rhos.zipWithIndex.foreach { case (r, i) =>
      assert(math.abs(row.getDouble(1 + i) - r) < TOL,
        s"rho${i + 1}: got ${row.getDouble(1 + i)} expected $r")
    }
    assert(math.abs(row.getDouble(6) - q5) < 2e-3,
      // Q multiplies Σρ²/(n−k) by n(n+2) ≈ 2.5e5 at sf0.001, so the
      // 1e-4 output grid is the binding precision, not the replay
      s"q5: got ${row.getDouble(6)} expected $q5")
  }

  test("audit: q_stats_cochran_armitage — trend z from the textbook " +
       "score-test form") {
    val cells = prioRows.groupBy(_._4).view.mapValues(rs =>
      (rs.size.toLong, rs.count(_._5 == "F").toLong)).toSeq
    val nn = cells.map(_._2._1).sum
    val kk = cells.map(_._2._2).sum
    val pbar = kk.toDouble / nn
    val t = cells.map { case (w, (nw, kw)) =>
      w * (kw - nw * pbar) }.sum
    val varT = pbar * (1 - pbar) *
      (cells.map { case (w, (nw, _)) => w.toDouble * w * nw }.sum -
       math.pow(cells.map { case (w, (nw, _)) => w.toDouble * nw }.sum,
                2) / nn)
    val z = t / math.sqrt(varT)
    val row = q("q_stats_cochran_armitage").head()
    assert(row.getLong(0) == nn && row.getLong(1) == kk)
    assert(math.abs(row.getDouble(2) - z) < TOL,
      s"z4: got ${row.getDouble(2)} expected $z")
  }

  test("audit: q_stats_seasonal_mk — within-season sign pairs, tie " +
       "correction, continuity-corrected z") {
    val daily = prioRows.groupMapReduce(r => (r._1, r._2))(r =>
      BigInt(r._6))(_ + _)
    val bySeason = daily.toSeq.map { case ((d, m), y) => (m, d, y) }
      .groupBy(_._1)
    var s = 0L; var var18 = BigInt(0); var nDays = 0L
    bySeason.values.foreach { rs =>
      val sorted = rs.sortBy(_._2)
      for (i <- sorted.indices; j <- (i + 1) until sorted.size)
        s += sorted(j)._3.compare(sorted(i)._3).sign
      val nm = BigInt(rs.size)
      val ties = rs.groupBy(_._3).values.map(g => BigInt(g.size))
      var18 += nm * (nm - 1) * (nm * 2 + 5) -
        ties.map(t => t * (t - 1) * (t * 2 + 5)).sum
      nDays += rs.size
    }
    val z =
      if (s > 0) (s - 1).toDouble / math.sqrt(var18.toDouble / 18.0)
      else if (s < 0) (s + 1).toDouble / math.sqrt(var18.toDouble / 18.0)
      else 0.0
    val row = q("q_stats_seasonal_mk").head()
    assert(row.getLong(0) == nDays &&
           row.getLong(1) == bySeason.size.toLong &&
           row.getLong(2) == s && row.getLong(3) == var18.toLong,
      s"seasonal MK integers: got $row expected " +
      s"($nDays, ${bySeason.size}, $s, $var18)")
    assert(math.abs(row.getDouble(4) - z) < TOL)
  }

  test("audit: q_stats_page_trend — Page's L from within-block " +
       "average ranks over complete months") {
    val cell = prioRows.groupMapReduce(r => (r._3, r._4))(r =>
      BigInt(r._6))(_ + _)
    val blocks = cell.toSeq.map { case ((ym, j), v) => (ym, j, v) }
      .groupBy(_._1).filter(_._2.size == 5)
    var l2 = 0L
    blocks.values.foreach { rs =>
      val vs = rs.map(_._3).sorted
      // average rank of v among the block's 5 values (1-based), doubled
      def ar2(v: BigInt): Long = {
        val below = vs.count(_ < v); val eq = vs.count(_ == v)
        // 2 * avg(below+1 .. below+eq) = 2*below + eq + 1
        2L * below + eq + 1
      }
      rs.foreach { case (_, j, v) => l2 += j * ar2(v) }
    }
    val b = blocks.size
    val z = (l2 - 90.0 * b) / (10.0 * math.sqrt(b.toDouble))
    val row = q("q_stats_page_trend").head()
    assert(row.getLong(0) == b.toLong && row.getLong(1) == l2,
      s"page integers: got $row expected ($b, $l2)")
    assert(math.abs(row.getDouble(2) - z) < TOL)
  }

  test("audit: q_stats_fdr_bh — per-nation two-proportion z, normal " +
       "p-values, Benjamini–Hochberg step-up") {
    val nationName = Tables.customer(spark, sfDir)
      .join(Tables.nation(spark, sfDir),
            col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val fam = ordersRows.groupBy(o => nationName(o._2)).view
      .mapValues(os => (os.size.toLong, os.count(_._3 == "F").toLong))
      .toSeq
    val tn = fam.map(_._2._1).sum; val tk = fam.map(_._2._2).sum
    val p0 = tk.toDouble / tn
    val scored = fam.map { case (nation, (nw, kw)) =>
      val z = (kw.toDouble / nw - p0) / math.sqrt(p0 * (1 - p0) / nw)
      // two-sided normal p via the Simpson-integrated CDF — NOT the
      // A&S erfc polynomial the engines freeze; the polynomial's
      // ~1.5e-7 absolute error can flip the 1e-6 rounding by one ulp,
      // hence the ±1 allowance on p6 below
      val p6 = math.round(2.0 * (1.0 - normCdf(math.abs(z))) * 1e6)
      (nation, nw, kw, z, p6)
    }.sortBy(s => (s._5, s._1))
    val ranked = scored.zipWithIndex.map { case (s, i) =>
      (s, i + 1L) }
    val imax = ranked.filter { case (s, i) => s._5 <= i * 2000 }
      .map(_._2).maxOption.getOrElse(0L)
    val got = q("q_stats_fdr_bh").collect().toSeq
    assert(got.size == ranked.size)
    got.zip(ranked).foreach { case (g, ((nation, nw, kw, z, p6), rnk)) =>
      assert(g.getString(0) == nation && g.getLong(1) == nw &&
             g.getLong(2) == kw && g.getLong(5) == rnk,
        s"fdr row: got $g expected ($nation, $nw, $kw, rnk=$rnk)")
      assert(math.abs(g.getDouble(3) - z) < TOL,
        s"$nation z4: got ${g.getDouble(3)} expected $z")
      assert(math.abs(g.getLong(4) - p6) <= 1,
        s"$nation p6: got ${g.getLong(4)} expected $p6")
      assert(g.getLong(6) == (if (rnk <= imax) 1L else 0L),
        s"$nation reject flag: got ${g.getLong(6)} rnk=$rnk imax=$imax")
    }
  }

  // ---- round-11 additions (VERDICT r10 #4): the next hash-gate-only
  // tier — survival, isotonic, hill_tail, theil_sen, ks, wmedian.
  // Same discipline: plain-Scala textbook replays sharing NO helper
  // with the plans (halfUp/cents above are JDK re-derivations).

  test("audit: q_events_survival — Kaplan–Meier from first-view cohorts") {
    // textbook KM: cohort = users with a view; event = first purchase
    // strictly after first view; censor at the corpus horizon.
    val byUser = eventsRows.groupBy(_._3)
    val horizon = eventsRows.map(_._4).max
    // .toSeq first: flatMap on a Map would rebuild a Map keyed by t
    // and silently collapse users sharing a (t, conv) pair
    val cohort = byUser.toSeq.flatMap { case (uid, rows) =>
      val views = rows.filter(_._1 == "view").map(_._4)
      if (views.isEmpty) None else {
        val mv = views.min
        val purch = rows.filter(r => r._1 == "purchase" && r._4 > mv)
          .map(_._4)
        val (conv, tEnd) =
          if (purch.nonEmpty) (true, purch.min) else (false, horizon)
        Some((Math.floorDiv(tEnd - mv, 86400000000L), conv))
      }
    }.toSeq
    val byT = cohort.groupBy(_._1).toSeq.sortBy(_._1).map {
      case (t, rs) => (t, rs.size.toLong, rs.count(_._2).toLong)
    }
    // n_risk(t) = everyone whose observed time is >= t
    val nRisk = byT.map { case (t, _, _) =>
      t -> byT.filter(_._1 >= t).map(_._2).sum
    }.toMap
    var s = 1.0
    var dead = false
    val expected = byT.map { case (t, nt, dt) =>
      val nr = nRisk(t)
      if (dt == nr) dead = true // everyone converts: S pins to 0
      else if (dt > 0) s *= (nr - dt).toDouble / nr
      (t, nr, dt, if (dead) 0.0 else s)
    }
    val got = q("q_events_survival").collect().toSeq.map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.size == expected.size && got.nonEmpty)
    got.zip(expected).foreach { case (g, e) =>
      assert(g._1 == e._1 && g._2 == e._2 && g._3 == e._3,
        s"survival integers: got $g expected $e")
      assert(math.abs(g._4 - e._4) < TOL,
        s"survival S(t=${e._1}): got ${g._4} expected ${e._4}")
    }
  }

  test("audit: q_stats_isotonic — max–min PAVA identity over textbook " +
       "quality bins") {
    // score from the published definition (length, stopword ratio,
    // avg word length), split on single spaces KEEPING empties
    case class Bin(n: Long, pos: Long)
    val binned = docRows.map { case (_, lang, _, nChars, text) =>
      val toks = text.split(" ", -1)
      val nTok = toks.length.toDouble
      val nStop = toks.count(t => t == "the" || t == "a").toDouble
      val chars = nChars.toDouble
      val score = math.min(chars / 500.0, 1.0) * 0.4 +
        (1.0 - nStop / nTok) * 0.3 +
        math.min((chars - nTok + 1.0) / nTok / 8.0, 1.0) * 0.3
      val bin = math.min(math.floor(score * 10).toInt, 9)
      (bin, if (lang == "en") 1L else 0L)
    }
    val bins = binned.groupBy(_._1).toSeq.sortBy(_._1).map {
      case (b, rs) => b -> Bin(rs.size.toLong, rs.map(_._2).sum)
    }
    val present = bins.map(_._1)
    def segRate4(i: Int, j: Int): Double = {
      val in = bins.filter { case (b, _) => b >= i && b <= j }
      val n = in.map(_._2.n).sum
      val p = in.map(_._2.pos).sum
      halfUp(BigInt(p) * 10000, BigInt(n)).toDouble / 10000.0
    }
    val expected = bins.map { case (k, bn) =>
      // iso(k) = max_{i<=k} min_{j>=k} rate4(i..j) over PRESENT bins,
      // min/max over the ALREADY-quantized rates (the plan's contract)
      val iso = present.filter(_ <= k).map { i =>
        present.filter(_ >= k).map(j => segRate4(i, j)).min
      }.max
      (k, bn.n, bn.pos,
       halfUp(BigInt(bn.pos) * 10000, BigInt(bn.n)).toDouble / 10000.0,
       iso)
    }
    val got = q("q_stats_isotonic").collect().toSeq.map(r =>
      (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3),
       r.getDouble(4)))
    assert(got.size == expected.size && got.nonEmpty)
    got.zip(expected).foreach { case (g, e) =>
      assert(g._1 == e._1 && g._2 == e._2 && g._3 == e._3,
        s"isotonic integers: got $g expected $e")
      assert(math.abs(g._4 - e._4) < 1e-9 && math.abs(g._5 - e._5) < 1e-9,
        s"isotonic rates bin ${e._1}: got $g expected $e")
      // the defining property, independently of values: monotone
    }
    got.sliding(2).foreach {
      case Seq(a, b) => assert(a._5 <= b._5 + 1e-12,
        s"isotonic fit not monotone: $a then $b")
      case _ =>
    }
  }

  test("audit: q_events_hill_tail — α from the top-k order statistics") {
    val act = eventsRows.groupBy(_._3).map { case (u, rs) =>
      (u, rs.size.toLong)
    }.toSeq
    val top = act.sortBy { case (u, c) => (-c, u) }.take(101)
    val xk1 = top.last._2
    val terms = top.dropRight(1).map { case (_, c) =>
      math.round((math.log(c.toDouble) - math.log(xk1.toDouble)) * 1e9)
    }
    val k = terms.size.toLong
    val s9 = terms.sum
    val alpha = k.toDouble / (s9.toDouble / 1e9)
    val row = q("q_events_hill_tail").head()
    assert(row.getLong(0) == k && row.getLong(1) == xk1 &&
           row.getLong(2) == s9,
      s"hill integers: got $row expected ($k, $xk1, $s9)")
    assert(math.abs(row.getDouble(3) - alpha) < TOL,
      s"alpha: got ${row.getDouble(3)} expected $alpha")
  }

  test("audit: q_ts_theil_sen — median pairwise slope and intercept") {
    val daily = eventsRows.groupBy(r => Math.floorDiv(r._4, 86400000000L))
      .toSeq.map { case (x, rs) => (x, rs.size.toLong) }.sortBy(_._1)
    val pairs = for {
      (xi, yi) <- daily; (xj, yj) <- daily if xj > xi
    } yield (((yj - yi).toDouble / (xj - xi).toDouble), xi, xj)
    val np = pairs.size.toLong
    val slope = pairs.sortBy(p => (p._1, p._2, p._3))
      .apply(((np + 1) / 2 - 1).toInt)._1
    val ics = daily.map { case (x, y) => (y.toDouble - slope * x.toDouble, x) }
    val nd = ics.size.toLong
    val ic = ics.sorted.apply(((nd + 1) / 2 - 1).toInt)._1
    val row = q("q_ts_theil_sen").head()
    assert(row.getLong(0) == nd && row.getLong(1) == np,
      s"theil_sen counts: got $row expected ($nd, $np)")
    assert(math.abs(row.getDouble(2) - slope) < TOL,
      s"slope4: got ${row.getDouble(2)} expected $slope")
    assert(math.abs(row.getDouble(3) - ic) < TOL,
      s"intercept4: got ${row.getDouble(3)} expected $ic")
  }

  test("audit: q_events_ks — two-sample D from exact cross-multiplied CDFs") {
    val cv = eventsRows.filter(r => r._1 == "click" || r._1 == "view")
    val byVal = cv.groupBy(_._5).toSeq.sortBy(_._1).map { case (vc, rs) =>
      (vc, rs.count(_._1 == "click").toLong, rs.count(_._1 == "view").toLong)
    }
    val n1 = byVal.map(_._2).sum
    val n2 = byVal.map(_._3).sum
    var c1 = 0L; var c2 = 0L
    var dnum = BigInt(0)
    byVal.foreach { case (_, nc, nv) =>
      c1 += nc; c2 += nv
      val d = (BigInt(c1) * n2 - BigInt(c2) * n1).abs
      if (d > dnum) dnum = d
    }
    val d4 = halfUp(dnum * 10000, BigInt(n1) * n2).toDouble / 10000.0
    val row = q("q_events_ks").head()
    assert(row.getLong(0) == n1 && row.getLong(1) == n2,
      s"ks counts: got $row expected ($n1, $n2)")
    assert(math.abs(row.getDouble(2) - d4) < 1e-9,
      s"d_ks: got ${row.getDouble(2)} expected $d4")
  }

  test("audit: q_stats_wmedian — first price where 2·cumweight ≥ total") {
    val base = Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag"), col("l_extendedprice"),
              col("l_quantity"))
      .collect().toSeq.map { r =>
        (r.getString(0), cents(r.getDouble(1)),
         // floor of the DECIMAL(18,2) quantity, replayed via the JDK
         BigDecimal(java.lang.Double.toString(r.getDouble(2)).toDouble)
           .setScale(2, BigDecimal.RoundingMode.HALF_UP)
           .setScale(0, BigDecimal.RoundingMode.FLOOR).toLongExact)
      }
    val expected = base.groupBy(_._1).toSeq.sortBy(_._1).map {
      case (flag, rs) =>
        val byVc = rs.groupBy(_._2).toSeq.sortBy(_._1)
          .map { case (vc, xs) => (vc, xs.map(_._3).sum) }
        val tot = byVc.map(_._2).sum
        var cum = 0L
        val wm = byVc.collectFirst {
          case (vc, w) if { cum += w; cum * 2 >= tot } => vc
        }.get
        (flag, wm, tot)
    }
    val got = q("q_stats_wmedian").collect().toSeq.map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got == expected, s"wmedian: got $got expected $expected")
  }

  // ---- round-11 batch 2: grubbs, sign_test, circular_hour, kruskal,
  // cramers_v, cusum — the argmax/χ²/rank/directional classes not yet
  // independently replayed.

  test("audit: q_stats_grubbs — extreme-day G from exact moments") {
    val daily = dailyRev.toSeq.sortBy(_._1)
    val n = daily.size.toLong
    val s = daily.map(d => BigInt(d._2)).sum
    val qq = daily.map(d => BigInt(d._2) * d._2).sum
    // argmax |n·x − S|, ties to the earliest day
    val (day, rev) = daily.maxBy { case (d, v) =>
      ((BigInt(v) * n - s).abs, BigInt(-d))
    }
    val mean = s.toDouble / n
    val sd = math.sqrt((qq.toDouble - s.toDouble * s.toDouble / n) / (n - 1))
    val g = math.abs(rev.toDouble - mean) / sd
    val row = q("q_stats_grubbs").head()
    assert(row.getLong(0) == day && row.getLong(1) == n,
      s"grubbs ints: got $row expected ($day, $n)")
    assert(math.abs(row.getDouble(2) - rev / 100.0) < 1e-9)
    assert(math.abs(row.getDouble(3) - g) < TOL,
      s"G: got ${row.getDouble(3)} expected $g")
  }

  test("audit: q_stats_sign_test — lag-7 paired signs and z") {
    val daily = dailyRev.toSeq.sortBy(_._1)
    // lag(7) is POSITIONAL over the present-day frame (row 7 back),
    // not calendar day−7 — replay the same frame semantics
    val pairs = daily.indices.drop(7).map(i => (daily(i)._2, daily(i - 7)._2))
      .filter { case (a, b) => a != b }
    val sPlus = pairs.count { case (a, b) => a > b }.toLong
    val sMinus = pairs.size - sPlus
    val z = (2.0 * sPlus - pairs.size) / math.sqrt(pairs.size.toDouble)
    val row = q("q_stats_sign_test").head()
    assert(row.getLong(0) == sPlus && row.getLong(1) == sMinus,
      s"sign ints: got $row expected ($sPlus, $sMinus)")
    assert(math.abs(row.getDouble(2) - z) < TOL)
  }

  test("audit: q_stats_circular_hour — mean direction and resultant " +
       "length from the 24 frozen unit vectors") {
    val expected = eventsRows.groupBy(_._1).toSeq.sortBy(_._1).map {
      case (typ, rs) =>
        var n = 0L; var sc = 0L; var ss = 0L
        rs.foreach { r =>
          val h = ((Math.floorDiv(r._4, 3600000000L)) % 24).toInt
          n += 1
          sc += math.round(math.cos(2 * math.Pi * h / 24) * 1e6)
          ss += math.round(math.sin(2 * math.Pi * h / 24) * 1e6)
        }
        val mh = (math.atan2(ss.toDouble, sc.toDouble) * 12.0 /
                  math.Pi + 24.0) % 24.0
        val rr = math.sqrt(sc.toDouble * sc + ss.toDouble * ss) / (n * 1e6)
        (typ, n, mh, rr)
    }
    val got = q("q_stats_circular_hour").collect().toSeq.map(r =>
      (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(got.size == expected.size && got.nonEmpty)
    got.zip(expected).foreach { case (g, e) =>
      assert(g._1 == e._1 && g._2 == e._2, s"circular: got $g expected $e")
      assert(math.abs(g._3 - e._3) < TOL && math.abs(g._4 - e._4) < TOL,
        s"circular ${e._1}: got $g expected $e")
    }
  }

  test("audit: q_events_kruskal — H from pooled textbook midranks") {
    val vals = eventsRows.map(r => (r._1, r._5))
    val n = vals.size.toLong
    // average rank of each distinct value over the pooled sample
    val byV = vals.map(_._2).groupBy(identity).view.mapValues(_.size).toMap
    val sortedVs = byV.keys.toSeq.sorted
    var cum = 0L
    val midrank = sortedVs.map { v =>
      val r = cum + (byV(v) + 1) / 2.0; cum += byV(v); v -> r
    }.toMap
    val groups = vals.groupBy(_._1)
    val sumR2overN = groups.values.map { rs =>
      val rg = rs.map(r => midrank(r._2)).sum
      rg * rg / rs.size
    }.sum
    val tTies = byV.values.map(t => t.toLong * t * t - t).sum
    val h = (12.0 / (n * (n + 1.0)) * sumR2overN - 3.0 * (n + 1)) /
            (1.0 - tTies.toDouble / (n.toDouble * n * n - n))
    val row = q("q_events_kruskal").head()
    assert(row.getLong(0) == n && row.getLong(1) == groups.size.toLong &&
           row.getLong(2) == tTies,
      s"kruskal ints: got $row expected ($n, ${groups.size}, $tTies)")
    assert(math.abs(row.getDouble(3) - h) < TOL,
      s"H: got ${row.getDouble(3)} expected $h")
  }

  test("audit: q_stats_cramers_v — χ² identity ladder replayed in " +
       "exact integers") {
    val cells = Tables.orders(spark, sfDir)
      .select(col("o_orderstatus"), col("o_orderpriority"))
      .collect().toSeq.map(r => (r.getString(0), r.getString(1)))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val rSum = cells.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val cSum = cells.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
    val n = cells.values.sum
    // per-cell o²·10¹²/(r·c) half-up, summed exactly; χ²·10⁴ =
    // halfUp(n·(t−10¹²), 10⁸) — the textbook identity
    // χ² = N(Σ o²/(r·c) − 1) on the scale-12 grid
    val t = cells.map { case ((st, pri), o) =>
      halfUp(BigInt(o) * o * BigInt("1000000000000"),
             BigInt(rSum(st)) * cSum(pri))
    }.sum
    val chi2s = halfUp(BigInt(n) * (t - BigInt("1000000000000")),
                       BigInt(100000000L))
    val chi2 = chi2s.toDouble / 10000.0
    val nr = rSum.size.toLong
    val nc = cSum.size.toLong
    val v = math.sqrt(chi2 / (n * (math.min(nr, nc) - 1)).toDouble)
    val row = q("q_stats_cramers_v").head()
    assert(row.getLong(0) == n && row.getLong(1) == nr &&
           row.getLong(2) == nc,
      s"cramers ints: got $row expected ($n, $nr, $nc)")
    assert(math.abs(row.getDouble(3) - chi2) < 1e-9,
      s"chi2_4: got ${row.getDouble(3)} expected $chi2")
    assert(math.abs(row.getDouble(4) - v) < TOL)
  }

  test("audit: q_events_cusum — exact n·S argmax changepoint per type") {
    val expected = eventsRows.groupBy(_._1).toSeq.sortBy(_._1).map {
      case (typ, rs) =>
        val seq = rs.sortBy(r => (r._4, r._2))
        val n = seq.size.toLong
        val tot = seq.map(r => BigInt(r._5)).sum
        var pre = BigInt(0)
        var best: (BigInt, Long, BigInt, Long) = null // (|S|, pos, S, ts)
        seq.zipWithIndex.foreach { case (r, i) =>
          pre += r._5
          val sv = pre * n - BigInt(i + 1) * tot
          val cand = (sv.abs, (i + 1).toLong, sv, r._4)
          // max |S|, earliest position on ties
          if (best == null || cand._1 > best._1) best = cand
        }
        val cusumAbs = halfUp(best._1 * 100, BigInt(n)).toDouble / 10000.0
        (typ, n, best._2, best._4, cusumAbs,
         if (best._3 > 0) "hi" else "lo")
    }
    val got = q("q_events_cusum").collect().toSeq.map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
       r.getDouble(4), r.getString(5)))
    assert(got.size == expected.size && got.nonEmpty)
    got.zip(expected).foreach { case (g, e) =>
      assert(g._1 == e._1 && g._2 == e._2 && g._3 == e._3 &&
             g._4 == e._4 && g._6 == e._6,
        s"cusum: got $g expected $e")
      assert(math.abs(g._5 - e._5) < 1e-9,
        s"cusum_abs ${e._1}: got ${g._5} expected ${e._5}")
    }
  }

  // ---- round-11 batch 3: the ANOVA/entropy/order-statistic classes —
  // levene, anova, theil_u, median_ci, skew_kurtosis, markov_entropy.

  /** The exact scale-4 sum-of-squares ladder both F-tests share,
    * replayed in BigInt from the textbook identities (between-group
    * SS = Σ T_g − T_all on the 1e-4 grid, T = (Σd)²/n half-up). */
  private def ssLadder(groups: Seq[(Long, Seq[Long])]) // (ng, devs)
      : (Long, Long, BigInt, BigInt) = {
    val k = groups.size.toLong
    val n = groups.map(_._1).sum
    val tgs = groups.map { case (ng, ds) =>
      val sg = ds.map(BigInt(_)).sum
      halfUp(sg * sg * 10000, BigInt(ng))
    }
    val ss4 = groups.flatMap(_._2).map(d => BigInt(d) * d * 10000).sum
    val st = groups.flatMap(_._2).map(BigInt(_)).sum
    val tall = halfUp(st * st * 10000, BigInt(n))
    val ssb4 = (tgs.sum - tall).max(BigInt(0))
    val ssw4 = (ss4 - tgs.sum).max(BigInt(0))
    (k, n, ssb4, ssw4)
  }

  test("audit: q_stats_levene — Brown–Forsythe F from 2×-cent median " +
       "deviations") {
    val groups = eventsRows.groupBy(_._1).toSeq.map { case (_, rs) =>
      val vs = rs.map(_._5).sorted
      val n = vs.size
      val m2 = if (n % 2 == 1) 2 * vs(n / 2)
               else vs(n / 2 - 1) + vs(n / 2)
      (n.toLong, vs.map(v => math.abs(2 * v - m2)))
    }
    val (k, n, ssb4, ssw4) = ssLadder(groups)
    val bf = ssb4.toDouble * (n - k) / (ssw4.toDouble * (k - 1))
    val row = q("q_stats_levene").head()
    assert(row.getLong(0) == k && row.getLong(1) == n,
      s"levene ints: got $row expected ($k, $n)")
    assert(math.abs(row.getDouble(2) - bf) < TOL,
      s"BF: got ${row.getDouble(2)} expected $bf")
  }

  test("audit: q_events_anova — F from min-anchored exact moments") {
    val anchor = eventsRows.map(_._5).min
    val groups = eventsRows.groupBy(_._1).toSeq.map { case (_, rs) =>
      (rs.size.toLong, rs.map(_._5 - anchor))
    }
    val (k, n, ssb4, ssw4) = ssLadder(groups)
    val f = ssb4.toDouble * (n - k) / (ssw4.toDouble * (k - 1))
    val row = q("q_events_anova").head()
    assert(row.getLong(0) == k && row.getLong(1) == n,
      s"anova ints: got $row expected ($k, $n)")
    assert(math.abs(row.getDouble(2) - ssb4.toDouble / 1e4) < 1e-6 &&
           math.abs(row.getDouble(3) - ssw4.toDouble / 1e4) < 1e-6,
      s"anova SS: got $row expected (${ssb4.toDouble / 1e4}, " +
        s"${ssw4.toDouble / 1e4})")
    assert(math.abs(row.getDouble(4) - f) < TOL,
      s"F: got ${row.getDouble(4)} expected $f")
  }

  test("audit: q_stats_theil_u — directional uncertainty from " +
       "1e-9-quantized entropy terms") {
    val cellRows = Tables.orders(spark, sfDir)
      .select(col("o_orderstatus"), col("o_orderpriority"))
      .collect().toSeq.map(r => (r.getString(0), r.getString(1)))
    val cells = cellRows.groupBy(identity).view.mapValues(_.size.toLong)
    val rS = cellRows.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val cS = cellRows.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val n = cellRows.size.toDouble
    def q9(p: Double): Long = math.round(p * 1e9)
    val hy9 = cS.values.map(c => q9(-(c / n) * math.log(c / n))).sum
    val hx9 = rS.values.map(r => q9(-(r / n) * math.log(r / n))).sum
    val hygx9 = cells.map { case ((st, _), o) =>
      q9(-(o / n) * math.log(o.toDouble / rS(st)))
    }.sum
    val hxgy9 = cells.map { case ((_, pri), o) =>
      q9(-(o / n) * math.log(o.toDouble / cS(pri)))
    }.sum
    val row = q("q_stats_theil_u").head()
    assert(math.abs(row.getDouble(0) - hy9 / 1e9) < TOL &&
           math.abs(row.getDouble(1) - hx9 / 1e9) < TOL,
      s"entropies: got $row expected (${hy9 / 1e9}, ${hx9 / 1e9})")
    assert(math.abs(row.getDouble(2) -
             (hy9 - hygx9).toDouble / hy9) < TOL &&
           math.abs(row.getDouble(3) -
             (hx9 - hxgy9).toDouble / hx9) < TOL,
      s"U: got $row expected (${(hy9 - hygx9).toDouble / hy9}, " +
        s"${(hx9 - hxgy9).toDouble / hx9})")
  }

  test("audit: q_stats_median_ci — binomial order-statistic interval") {
    val vals = ordersRows.map(_._5).sorted
    val n = vals.size.toLong
    val rMed = (n + 1) / 2
    val rLo = math.max(1L,
      math.floor((n - 1.959964 * math.sqrt(n.toDouble)) / 2).toLong)
    val rHi = math.min(n,
      math.ceil((n + 1.959964 * math.sqrt(n.toDouble)) / 2).toLong + 1)
    def pick(r: Long): Double = vals((r - 1).toInt) / 100.0
    val row = q("q_stats_median_ci").head()
    assert(row.getLong(0) == n && row.getLong(1) == rLo &&
           row.getLong(2) == rMed && row.getLong(3) == rHi,
      s"median_ci ranks: got $row expected ($n, $rLo, $rMed, $rHi)")
    assert(math.abs(row.getDouble(4) - pick(rLo)) < 1e-9 &&
           math.abs(row.getDouble(5) - pick(rMed)) < 1e-9 &&
           math.abs(row.getDouble(6) - pick(rHi)) < 1e-9,
      s"median_ci values: got $row expected " +
        s"(${pick(rLo)}, ${pick(rMed)}, ${pick(rHi)})")
  }

  test("audit: q_agg_skew_kurtosis — central moments from anchored " +
       "exact power sums") {
    val expected = eventsRows.groupBy(_._1).toSeq.sortBy(_._1).map {
      case (typ, rs) =>
        val a = rs.map(_._5).min
        val ds = rs.map(r => BigInt(r._5 - a))
        val n = rs.size.toDouble
        val s1 = ds.sum.toDouble; val s2 = ds.map(d => d * d).sum.toDouble
        val s3 = ds.map(d => d * d * d).sum.toDouble
        val s4 = ds.map(d => d * d * d * d).sum.toDouble
        val mu = s1 / n
        val m2 = s2 / n - mu * mu
        val m3 = s3 / n - mu * s2 / n * 3 + mu * mu * mu * 2
        val m4 = s4 / n - mu * s3 / n * 4 + mu * mu * s2 / n * 6 -
                 mu * mu * mu * mu * 3
        (typ, rs.size.toLong, m3 / math.sqrt(m2 * m2 * m2),
         m4 / (m2 * m2) - 3.0)
    }
    val got = q("q_agg_skew_kurtosis").collect().toSeq.map(r =>
      (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(got.size == expected.size && got.nonEmpty)
    got.zip(expected).foreach { case (g, e) =>
      assert(g._1 == e._1 && g._2 == e._2, s"skew ints: $g vs $e")
      assert(math.abs(g._3 - e._3) < TOL && math.abs(g._4 - e._4) < TOL,
        s"skew/kurt ${e._1}: got $g expected $e")
    }
  }

  test("audit: q_events_markov_entropy — conditional entropy of the " +
       "per-user transition chain") {
    val cij = scala.collection.mutable.Map.empty[(String, String), Long]
    eventsRows.groupBy(_._3).values.foreach { rs =>
      val seq = rs.sortBy(r => (r._4, r._2)).map(_._1)
      seq.sliding(2).foreach {
        case Seq(p, c) =>
          cij((p, c)) = cij.getOrElse((p, c), 0L) + 1
        case _ =>
      }
    }
    val ni = cij.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val nn = cij.values.sum.toDouble
    val sq = cij.map { case ((p, _), c) =>
      math.round((c / nn) * math.log(c.toDouble / ni(p)) * 1e9)
    }.sum
    val row = q("q_events_markov_entropy").head()
    assert(row.getLong(0) == cij.values.sum && row.getLong(1) == cij.size,
      s"markov ints: got $row expected (${cij.values.sum}, ${cij.size})")
    assert(math.abs(row.getDouble(2) - sq / -1e9) < TOL,
      s"H(Y|X): got ${row.getDouble(2)} expected ${sq / -1e9}")
  }

  // ---- round-11 batch 4: friedman, fano, and the eval family whose
  // label source is the langid / quality-score pipeline — replayed
  // here from the documented spec, never via api.Text.

  test("audit: q_stats_friedman — blocked rank χ² over complete months") {
    val rows = Tables.orders(spark, sfDir)
      .select(col("o_orderpriority"),
              expr("unix_micros(cast(o_orderdate as timestamp))"),
              col("o_totalprice"))
      .collect().toSeq.map { r =>
        val day = Math.floorDiv(r.getLong(1), 86400000000L)
        val ld = java.time.LocalDate.ofEpochDay(day)
        (ld.getYear * 100 + ld.getMonthValue, r.getString(0),
         cents(r.getDouble(2)))
      }
    val cellsM = rows.groupBy(r => (r._1, r._2)).view
      .mapValues(_.map(x => BigInt(x._3)).sum).toMap
    val fullMonths = cellsM.keys.groupBy(_._1).collect {
      case (ym, ks) if ks.size == 5 => ym
    }.toSet
    // r2 = 2·RANK + ties − 1 (twice the midrank) within each month
    val r2ByPri = scala.collection.mutable.Map.empty[String, Long]
    fullMonths.foreach { ym =>
      val vs = cellsM.collect { case ((m, pri), v) if m == ym => (pri, v) }
        .toSeq
      vs.foreach { case (pri, v) =>
        val rank = vs.count(_._2 < v) + 1L
        val ties = vs.count(_._2 == v).toLong
        r2ByPri(pri) = r2ByPri.getOrElse(pri, 0L) + 2 * rank + ties - 1
      }
    }
    val nB = fullMonths.size.toLong
    val s2 = r2ByPri.values.map(r => BigInt(r) * r).sum
    val chi24 = halfUp(s2 * 3 * 10000 - BigInt(nB) * nB * 540 * 10000,
                       BigInt(nB) * 30).toDouble / 10000.0
    val row = q("q_stats_friedman").head()
    assert(row.getLong(0) == nB && row.getLong(1) == 5L &&
           row.getLong(2) == s2.toLong,
      s"friedman ints: got $row expected ($nB, 5, $s2)")
    assert(math.abs(row.getDouble(3) - chi24) < 1e-9,
      s"chi2: got ${row.getDouble(3)} expected $chi24")
  }

  test("audit: q_events_fano — hourly dispersion index per type") {
    val expected = eventsRows.groupBy(_._1).toSeq.sortBy(_._1).map {
      case (typ, rs) =>
        val byHr = rs.groupBy(r => Math.floorDiv(r._4, 3600000000L))
        val n = byHr.size.toLong
        val sc = byHr.values.map(_.size.toLong).sum
        val scc = byHr.values.map(c => BigInt(c.size) * c.size).sum
        val fano = (BigInt(n) * scc - BigInt(sc) * sc).toDouble /
                   (n.toDouble * sc)
        (typ, n, sc, fano)
    }
    val got = q("q_events_fano").collect().toSeq.map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.size == expected.size && got.nonEmpty)
    got.zip(expected).foreach { case (g, e) =>
      assert(g._1 == e._1 && g._2 == e._2 && g._3 == e._3,
        s"fano ints: $g vs $e")
      assert(math.abs(g._4 - e._4) < TOL, s"fano ${e._1}: $g vs $e")
    }
  }

  /** The langid pipeline replayed from its documented spec (tokens =
    * split on single spaces keeping empties; per-lang profile = top-5
    * terms by (count DESC, term ASC) over token INSTANCES; a doc's
    * hits against a profile count DISTINCT doc terms; prediction =
    * argmax (hits DESC, lang ASC), abstain when no profile term
    * matches). Never calls api.Text.languageId. */
  private lazy val langidPredicted: Map[Long, String] = {
    val tokens = docRows.flatMap { case (id, lang, _, _, text) =>
      text.split(" ", -1).map(t => (id, lang, t))
    }
    val profile: Seq[(String, String)] = tokens
      .groupBy(t => (t._2, t._3)).view.mapValues(_.size).toSeq
      .groupBy(_._1._1).toSeq.flatMap { case (lang, terms) =>
        terms.sortBy { case ((_, term), c) => (-c, term) }.take(5)
          .map { case ((_, term), _) => (lang, term) }
      }
    val byTerm = profile.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    docRows.flatMap { case (id, _, _, _, text) =>
      val distinctTerms = text.split(" ", -1).distinct
      val hits = distinctTerms.flatMap(t => byTerm.getOrElse(t, Nil))
        .groupBy(identity).view.mapValues(_.size).toSeq
      if (hits.isEmpty) None
      else Some(id -> hits.minBy { case (l, h) => (-h, l) }._1)
    }.toMap
  }

  test("audit: q_eval_kappa — Cohen's κ over the replayed langid " +
       "confusion matrix") {
    val j = docRows.map(d => (d._2, langidPredicted.get(d._1)))
    val abstained = j.count(_._2.isEmpty).toLong
    val conf = j.collect { case (t, Some(p)) => (t, p) }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val rt = conf.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val sp = conf.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
    val src = rt.keySet.intersect(sp.keySet)
      .map(l => BigInt(rt(l)) * sp(l)).sum
    val nn = conf.values.sum
    val diag = conf.collect { case ((t, p), c) if t == p => c }.sum
    val kappa4 = halfUp((BigInt(nn) * diag - src) * 10000,
                        BigInt(nn) * nn - src).toDouble / 10000.0
    val row = q("q_eval_kappa").head()
    assert(row.getLong(0) == nn && row.getLong(1) == abstained &&
           row.getLong(2) == diag,
      s"kappa ints: got $row expected ($nn, $abstained, $diag)")
    assert(math.abs(row.getDouble(3) - kappa4) < 1e-9,
      s"kappa: got ${row.getDouble(3)} expected $kappa4")
  }

  test("audit: q_eval_mcc — Matthews correlation of binarized English " +
       "detection") {
    val j = docRows.map(d =>
      (d._2 == "en", langidPredicted.get(d._1).contains("en")))
    val tp = j.count(x => x._1 && x._2).toLong
    val tn = j.count(x => !x._1 && !x._2).toLong
    val fp = j.count(x => !x._1 && x._2).toLong
    val fn = j.count(x => x._1 && !x._2).toLong
    val num = (BigInt(tp) * tn - BigInt(fp) * fn).toDouble
    val den = (BigInt(tp + fp) * (tp + fn) * (tn + fp) * (tn + fn))
      .toDouble
    val row = q("q_eval_mcc").head()
    assert((row.getLong(0), row.getLong(1), row.getLong(2),
            row.getLong(3)) == ((tp, tn, fp, fn)),
      s"mcc counts: got $row expected ($tp, $tn, $fp, $fn)")
    assert(den > 0, "degenerate margin at sf0.001 — fixture changed?")
    assert(math.abs(row.getDouble(4) - num / math.sqrt(den)) < TOL,
      s"mcc: got ${row.getDouble(4)} expected ${num / math.sqrt(den)}")
  }

  /** (bin, isEnglish) per doc from the documented quality-score
    * formula — shared by the brier and calibration audits (and the
    * same arithmetic the isotonic audit replays). */
  private lazy val qualityBins: Seq[(Int, Long)] =
    docRows.map { case (_, lang, _, nChars, text) =>
      val toks = text.split(" ", -1)
      val nTok = toks.length.toDouble
      val nStop = toks.count(t => t == "the" || t == "a").toDouble
      val chars = nChars.toDouble
      val score = math.min(chars / 500.0, 1.0) * 0.4 +
        (1.0 - nStop / nTok) * 0.3 +
        math.min((chars - nTok + 1.0) / nTok / 8.0, 1.0) * 0.3
      (math.min(math.floor(score * 10).toInt, 9),
       if (lang == "en") 1L else 0L)
    }

  test("audit: q_eval_brier — proper score on the exact 1/20 grid") {
    val n = qualityBins.size.toLong
    val p = qualityBins.map(_._2).sum
    val ss = qualityBins.map { case (b, y) =>
      val d = 2L * b + 1 - 20 * y; BigInt(d) * d
    }.sum
    val brier4 = halfUp(ss * 10000, BigInt(n) * 400).toDouble / 10000.0
    val ref4 = halfUp(BigInt(p) * (n - p) * 10000,
                      BigInt(n) * n).toDouble / 10000.0
    val row = q("q_eval_brier").head()
    assert(row.getLong(0) == n && row.getLong(1) == p,
      s"brier counts: got $row expected ($n, $p)")
    assert(math.abs(row.getDouble(2) - brier4) < 1e-9 &&
           math.abs(row.getDouble(3) - ref4) < 1e-9,
      s"brier: got $row expected ($brier4, $ref4)")
  }

  test("audit: q_eval_calibration — reliability bins and ECE from " +
       "exact 1/20 gaps") {
    val bins = qualityBins.groupBy(_._1).toSeq.sortBy(_._1).map {
      case (b, rs) => (b, rs.size.toLong, rs.map(_._2).sum)
    }
    val tg = bins.map { case (b, n, pos) =>
      BigInt(math.abs(n * (2L * b + 1) - pos * 20))
    }.sum
    val tn = bins.map(_._2).sum
    val ece4 = halfUp(tg * 500, BigInt(tn)).toDouble / 10000.0
    val got = q("q_eval_calibration").collect().toSeq.map(r =>
      (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3),
       r.getDouble(4), r.getDouble(5)))
    assert(got.size == bins.size && got.nonEmpty)
    got.zip(bins).foreach { case (g, (b, n, pos)) =>
      assert(g._1 == b && g._2 == n && g._3 == pos,
        s"calibration ints: $g vs ($b, $n, $pos)")
      assert(math.abs(g._4 - (2 * b + 1) / 20.0) < 1e-9,
        s"conf bin $b: ${g._4}")
      assert(math.abs(g._5 -
               halfUp(BigInt(pos) * 10000, BigInt(n)).toDouble / 10000.0)
             < 1e-9, s"rate bin $b: ${g._5}")
      assert(math.abs(g._6 - ece4) < 1e-9, s"ece bin $b: ${g._6}")
    }
  }

  // ---- round-11 batch 5: the mergeable-sketch family (countmin, kmv,
  // binned quantiles), the frozen-NDCG ranker, prf, and autocorr.

  /** JDK md5 hex — the independent twin of Pipeline.hash16/hash32 and
    * the oracle's instr-digit arithmetic. */
  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def u16(s: String): Int =
    Integer.parseInt(md5hex(s).substring(0, 4), 16)

  private def u32(s: String): Long =
    java.lang.Long.parseLong(md5hex(s).substring(0, 8), 16)

  /** The house tokenizer replayed: any run of ASCII whitespace is one
    * separator, no empty tokens. */
  private def wsTokens(text: String): Seq[String] =
    text.split("[ \\t\\n\\r\\f\\x0B]+").toSeq.filter(_.nonEmpty)

  test("audit: q_eval_ranking — P@10/MAP@10/NDCG@10 with re-derived " +
       "discount tables") {
    val emb = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"), col("label"))
      .collect().toSeq.map(r =>
        (r.getLong(0), r.getSeq[Float](1), r.getInt(2)))
    // re-derive the frozen tables from their definitions:
    // disc(i) = round(1e6 / log2(i+1)), pfac(i) = 2520 / i
    val disc = (1 to 10).map(i =>
      math.round(1e6 / (math.log(i + 1.0) / math.log(2.0))))
    val cum = disc.scanLeft(0L)(_ + _).tail
    val pfac = (1 to 10).map(i => 2520L / i)
    val qvecs = emb.filter(_._2 != null).flatMap { case (id, v, lbl) =>
      val amax = v.map(x => math.abs(x.toDouble)).max
      if (amax <= 0) None
      else Some((id, v.map(x => math.round(x * (127.0 / amax))), lbl))
    }
    val labCnt = emb.groupBy(_._3).view.mapValues(_.size.toLong).toMap
    val expected = qvecs.filter(_._1 < 10).sortBy(_._1).flatMap {
      case (qid, qv, qlbl) =>
        val nRel = labCnt(qlbl) - 1
        if (nRel <= 0) None else {
          val ranked = qvecs.filter(_._1 != qid).map { case (cid, cv, cl) =>
            (cid, qv.zip(cv).map { case (a, b) => a * b }.sum, cl)
          }.sortBy { case (cid, dot, _) => (-dot, cid) }.take(10)
          var hits = 0L; var dcg = 0L; var apn = 0L
          ranked.zipWithIndex.foreach { case ((_, _, cl), i) =>
            if (cl == qlbl) {
              hits += 1
              dcg += disc(i)
              apn += hits * pfac(i)
            }
          }
          val m = math.min(nRel, 10L)
          Some((qid, nRel, hits,
                halfUp(BigInt(hits) * 10000, BigInt(10)).toDouble / 1e4,
                halfUp(BigInt(apn) * 10000,
                       BigInt(2520) * m).toDouble / 1e4,
                halfUp(BigInt(dcg) * 10000,
                       BigInt(cum((m - 1).toInt))).toDouble / 1e4))
        }
    }
    val got = q("q_eval_ranking").collect().toSeq.map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
       r.getDouble(4), r.getDouble(5)))
    assert(got.size == expected.size && got.nonEmpty)
    got.zip(expected).foreach { case (g, e) =>
      assert(g._1 == e._1 && g._2 == e._2 && g._3 == e._3,
        s"ranking ints: $g vs $e")
      assert(math.abs(g._4 - e._4) < 1e-9 && math.abs(g._5 - e._5) < 1e-9
             && math.abs(g._6 - e._6) < 1e-9,
        s"ranking q=${e._1}: got $g expected $e")
    }
  }

  test("audit: q_eval_prf — per-class P/R/F1 over the replayed langid") {
    val j = docRows.map(d => (d._2, langidPredicted.get(d._1)))
    val nTrue = j.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val tp = j.collect { case (t, Some(p)) if t == p => t }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val nPred = j.collect { case (_, Some(p)) => p }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val expected = nTrue.keys.toSeq.sorted.map { lang =>
      val t = tp.getOrElse(lang, 0L)
      val nt = nTrue(lang)
      val np = nPred.getOrElse(lang, 0L)
      val prec = if (np > 0)
        halfUp(BigInt(t) * 10000, BigInt(np)).toDouble / 1e4 else 0.0
      (lang, nt, np, t, prec,
       halfUp(BigInt(t) * 10000, BigInt(nt)).toDouble / 1e4,
       halfUp(BigInt(t) * 20000, BigInt(nt + np)).toDouble / 1e4)
    }
    val got = q("q_eval_prf").collect().toSeq.map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
       r.getDouble(4), r.getDouble(5), r.getDouble(6)))
    assert(got == expected, s"prf:\n got $got\n exp $expected")
  }

  test("audit: q_ts_autocorr — lag-1 Pearson over consecutive hours") {
    val expected = eventsRows.groupBy(_._1).toSeq.sortBy(_._1).map {
      case (typ, rs) =>
        val byHr = rs.groupBy(r => Math.floorDiv(r._4, 3600000000L))
          .view.mapValues(_.size.toLong).toSeq.sortBy(_._1)
        val pairs = byHr.sliding(2).collect {
          case Seq((h1, c1), (h2, c2)) if h2 == h1 + 1 => (c1, c2)
        }.toSeq
        val n = pairs.size.toDouble
        val sx = pairs.map(_._1).sum.toDouble
        val sy = pairs.map(_._2).sum.toDouble
        val sxy = pairs.map(p => p._1 * p._2).sum.toDouble
        val sxx = pairs.map(p => p._1 * p._1).sum.toDouble
        val syy = pairs.map(p => p._2 * p._2).sum.toDouble
        val r1 = (n * sxy - sx * sy) /
                 math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
        (typ, pairs.size.toLong, r1)
    }
    val got = q("q_ts_autocorr").collect().toSeq.map(r =>
      (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(got.size == expected.size && got.nonEmpty)
    got.zip(expected).foreach { case (g, e) =>
      assert(g._1 == e._1 && g._2 == e._2, s"autocorr ints: $g vs $e")
      assert(math.abs(g._3 - e._3) < TOL, s"r1 ${e._1}: $g vs $e")
    }
  }

  test("audit: q_stats_sketch_quantile — 256-bin estimate AND exact " +
       "percentile, both replayed") {
    val expected = eventsRows.groupBy(_._1).toSeq.sortBy(_._1).map {
      case (typ, rs) =>
        val vs = rs.map(_._5)
        val n = vs.size.toLong
        val minc = vs.min; val maxc = vs.max
        val width = (maxc - minc) / 256 + 1
        def tgt(p: Int): Long = (p * n + 99) / 100
        // sketch side: bin counts, first bin edge whose cum >= target
        val bins = vs.groupBy(v => (v - minc) / width).toSeq.sortBy(_._1)
        def est(p: Int): Long = {
          var cum = 0L
          bins.collectFirst { case (b, xs)
            if { cum += xs.size; cum >= tgt(p) } =>
              math.min(minc + (b + 1) * width - 1, maxc)
          }.get
        }
        // exact side: distinct-value CDF
        val sorted = vs.sorted
        def exact(p: Int): Long = sorted((tgt(p) - 1).toInt)
        (typ, n, est(50), exact(50), est(95), exact(95),
         est(99), exact(99))
    }
    val got = q("q_stats_sketch_quantile").collect().toSeq.map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
       r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
    assert(got == expected,
      s"sketch_quantile:\n got $got\n exp $expected")
  }

  test("audit: q_agg_countmin — 4×16 counter matrix and min-estimate " +
       "replayed via JDK md5") {
    val words = docRows.flatMap(d => wsTokens(d._5))
    val exact = words.groupBy(identity).view.mapValues(_.size.toLong)
      .toMap
    val top = exact.toSeq.sortBy { case (w, c) => (-c, w) }.take(10)
    val counters = Array.fill(4, 16)(0L)
    words.foreach { w =>
      for (r <- 0 until 4)
        counters(r)(u16(s"$w#$r") % 16) += 1
    }
    val expected = top.map { case (w, c) =>
      val estC = (0 until 4).map(r => counters(r)(u16(s"$w#$r") % 16)).min
      (w, c, estC, estC - c)
    }
    val got = q("q_agg_countmin").collect().toSeq.map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got == expected, s"countmin:\n got $got\n exp $expected")
    // the sketch's defining one-sided guarantee, value-independently
    got.foreach(g => assert(g._4 >= 0, s"undercount! $g"))
  }

  test("audit: q_distinct_kmv — k-min-values estimator via JDK md5") {
    val expected = eventsRows.groupBy(_._1).toSeq.sortBy(_._1).map {
      case (typ, rs) =>
        val hvs = rs.map(r => u32(r._3.toString)).distinct.sorted
        val nd = hvs.size.toLong
        val est =
          if (nd < 64) nd.toDouble
          else {
            val kth = hvs(63).toDouble
            BigDecimal(63.0 / (kth / 4294967296.0))
              .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
          }
        (typ, nd, est)
    }
    val got = q("q_distinct_kmv").collect().toSeq.map(r =>
      (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(got.size == expected.size && got.nonEmpty)
    got.zip(expected).foreach { case (g, e) =>
      assert(g._1 == e._1 && g._2 == e._2, s"kmv ints: $g vs $e")
      assert(math.abs(g._3 - e._3) < TOL, s"kmv est ${e._1}: $g vs $e")
    }
  }

  // ---- round-11 batch 6: dp_sum, kendall, hodges_lehmann, mase, jsd,
  // readability — the Laplace/τ-b/pairwise-median/forecast/divergence/
  // frozen-formula classes.

  test("audit: q_privacy_dp_sum — clipped sums and hash-derandomized " +
       "Laplace noise") {
    val cust = Tables.customer(spark, sfDir)
      .select(col("c_mktsegment"), col("c_acctbal"))
      .collect().toSeq.map(r => (r.getString(0), r.getDouble(1)))
    val expected = cust.groupBy(_._1).toSeq.sortBy(_._1).map {
      case (seg, rs) =>
        val clipc = rs.map { case (_, bal) =>
          val c = math.floor(bal * 100 + 0.5).toLong
          math.min(math.max(c, 0L), 500000L)
        }.sum
        val u = (u16(seg + ":dpsum") + 0.5) / 65536.0
        val noise = -50000.0 * math.signum(u - 0.5) *
          math.log(1.0 - 2.0 * math.abs(u - 0.5))
        (seg, rs.size.toLong, clipc / 100.0, noise, clipc / 100.0 + noise)
    }
    val got = q("q_privacy_dp_sum").collect().toSeq.map(r =>
      (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
       r.getDouble(4), r.getDouble(5)))
    assert(got.size == expected.size && got.nonEmpty)
    got.zip(expected).foreach { case (g, e) =>
      assert(g._1 == e._1 && g._2 == e._2 &&
             math.abs(g._3 - e._3) < 1e-9, s"dp_sum base: $g vs $e")
      assert(math.abs(g._4 - e._4) < TOL && math.abs(g._5 - e._5) < TOL,
        s"dp_sum noise ${e._1}: got $g expected $e")
      assert(g._6 == 0.1)
    }
  }

  test("audit: q_ts_kendall — τ-b from exact pairwise concordance") {
    val daily = ordersRows.groupBy(_._4).toSeq.sortBy(_._1).map {
      case (d, os) => (d, os.size.toLong, os.map(_._5).sum)
    }
    var c = 0L; var dis = 0L; var tx = 0L; var ty = 0L; var np = 0L
    for (i <- daily.indices; j <- (i + 1) until daily.size) {
      val (_, na, sa) = daily(i); val (_, nb, sb) = daily(j)
      np += 1
      if ((na < nb && sa < sb) || (na > nb && sa > sb)) c += 1
      else if ((na < nb && sa > sb) || (na > nb && sa < sb)) dis += 1
      if (na == nb) tx += 1
      if (sa == sb) ty += 1
    }
    val tau = (c - dis).toDouble /
      math.sqrt((BigInt(np - tx) * (np - ty)).toDouble)
    val row = q("q_ts_kendall").head()
    assert(row.getLong(0) == daily.size.toLong && row.getLong(1) == np &&
           row.getLong(2) == c && row.getLong(3) == dis,
      s"kendall ints: got $row expected (${daily.size}, $np, $c, $dis)")
    assert(math.abs(row.getDouble(4) - tau) < TOL,
      s"tau: got ${row.getDouble(4)} expected $tau")
  }

  test("audit: q_ts_hodges_lehmann — median pairwise weekly-mean shift") {
    val rows = Tables.orders(spark, sfDir)
      .select(col("o_orderpriority"),
              expr("unix_micros(cast(o_orderdate as timestamp))"),
              col("o_totalprice"))
      .collect().toSeq.map(r =>
        (r.getString(0), Math.floorDiv(r.getLong(1), 7 * 86400000000L),
         cents(r.getDouble(2))))
    def arm(pri: String) = rows.filter(_._1 == pri).groupBy(_._2)
      .toSeq.map { case (wk, os) =>
        (wk, os.size.toLong, os.map(o => BigInt(o._3)).sum)
      }
    val pairs = for {
      (wka, na, sa) <- arm("1-URGENT"); (wkb, nb, sb) <- arm("5-LOW")
    } yield (halfUp((sa * nb - sb * na) * 10000, BigInt(na) * nb),
             wka, wkb)
    val np = pairs.size.toLong
    val dmc = pairs.sortBy(p => (p._1, p._2, p._3))
      .apply(((np + 1) / 2 - 1).toInt)._1
    val row = q("q_ts_hodges_lehmann").head()
    assert(row.getLong(0) == np, s"hl pairs: got $row expected $np")
    assert(math.abs(row.getDouble(1) - dmc.toDouble / 1e6) < 1e-9,
      s"hl shift: got ${row.getDouble(1)} expected ${dmc.toDouble / 1e6}")
  }

  test("audit: q_ts_mase — seasonal-naive error ratio over positional " +
       "lags") {
    val daily = dailyRev.toSeq.sortBy(_._1).map(_._2)
    def maeSum(lag: Int): (BigInt, Long) = {
      val es = daily.indices.drop(lag).map(i =>
        BigInt(math.abs(daily(i) - daily(i - lag))))
      (es.sum, es.size.toLong)
    }
    val (s1, n1) = maeSum(1); val (s7, n7) = maeSum(7)
    val ratio4 = halfUp(s7 * n1 * 10000, s1 * n7).toDouble / 10000.0
    val row = q("q_ts_mase").head()
    assert(row.getLong(0) == n1 && row.getLong(1) == n7,
      s"mase counts: got $row expected ($n1, $n7)")
    assert(math.abs(row.getDouble(2) - s1.toDouble / n1.toDouble / 100.0)
             < 1e-6 &&
           math.abs(row.getDouble(3) - s7.toDouble / n7.toDouble / 100.0)
             < 1e-6, s"mase maes: $row")
    assert(math.abs(row.getDouble(4) - ratio4) < 1e-9,
      s"mase ratio: got ${row.getDouble(4)} expected $ratio4")
  }

  test("audit: q_text_jsd — per-source divergence from 1e-9-quantized " +
       "terms") {
    val tok = docRows.flatMap(d => wsTokens(d._5).map(w => (d._3, w)))
    val byS = tok.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val ct = tok.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val n1 = tok.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val nn = tok.size.toDouble
    val expected = byS.keys.toSeq.map(_._1).distinct.sorted.map { src =>
      val terms = byS.keys.filter(_._1 == src).toSeq
      val sq = terms.map { case k @ (_, w) =>
        val p = byS(k).toDouble / n1(src)
        val qq = ct(w).toDouble / nn
        math.round((p * math.log(2.0 * p / (p + qq)) +
                    qq * (math.log(2.0 * qq / (p + qq)) -
                          math.log(2.0))) * 1e9)
      }.sum
      (src, terms.size.toLong, 0.5 * math.log(2.0) + sq / 2e9)
    }
    val got = q("q_text_jsd").collect().toSeq.map(r =>
      (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(got.size == expected.size && got.nonEmpty)
    got.zip(expected).foreach { case (g, e) =>
      assert(g._1 == e._1 && g._2 == e._2, s"jsd ints: $g vs $e")
      assert(math.abs(g._3 - e._3) < TOL, s"jsd ${e._1}: $g vs $e")
    }
  }

  test("audit: q_text_readability — Flesch from replayed syllable " +
       "counts and the frozen 206.835/1.015/84.6") {
    val syllRe = "[aeiouy]+".r
    val expected = docRows.map { d => (d._3, wsTokens(d._5)) }
      .filter(_._2.nonEmpty)
      .groupBy(_._1).toSeq.sortBy(_._1).map { case (src, docs) =>
        val nDocs = docs.size.toLong
        val nWords = docs.map(_._2.size.toLong).sum
        val nSyll = docs.map(_._2.map(t =>
          math.max(1L, syllRe.findAllIn(t.toLowerCase).size.toLong))
          .sum).sum
        val wpd = nWords.toDouble / nDocs
        val spw = nSyll.toDouble / nWords
        (src, nDocs, nWords, nSyll, wpd, spw,
         206.835 - 1.015 * wpd - 84.6 * spw)
      }
    val got = q("q_text_readability").collect().toSeq.map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
       r.getDouble(4), r.getDouble(5), r.getDouble(6)))
    assert(got.size == expected.size && got.nonEmpty)
    got.zip(expected).foreach { case (g, e) =>
      assert(g._1 == e._1 && g._2 == e._2 && g._3 == e._3 &&
             g._4 == e._4, s"readability ints: $g vs $e")
      assert(math.abs(g._5 - e._5) < TOL && math.abs(g._6 - e._6) < TOL &&
             math.abs(g._7 - e._7) < TOL,
        s"readability ${e._1}: got $g expected $e")
    }
  }

  // ---- round-11 batch 7: the derandomized-resampling pair (bootstrap,
  // permutation), chisq, and the rolling/argmax integer-algebra pair
  // (bollinger, changepoint). The bootstrap audit DERIVES the
  // Poisson(1) CDF grid from math.exp — this replay found the original
  // thresholds (24112/48225/60282/64291) off the true CDF by up to
  // 9/65536 and drove the round-11 plan+oracle fix to
  // 24109/48219/60273/64292/65296.

  test("audit: q_stats_bootstrap — Poisson(1) grid re-derived, ladder " +
       "replayed") {
    val thresholds = {
      var cdf = 0.0
      (0 to 4).map { k =>
        cdf += math.exp(-1.0) / (1 to k).product.max(1)
        math.round(cdf * 65536)
      }
    }
    assert(thresholds == Seq(24109L, 48219L, 60273L, 64292L, 65296L),
      s"Poisson(1) grid drifted: $thresholds")
    val reps = 10
    val perRep = (0 until reps).map { rep =>
      var ne = BigInt(0); var ts = BigInt(0)
      docRows.foreach { case (id, _, _, nChars, _) =>
        val u = u16(s"$id:$rep")
        val w = thresholds.indexWhere(u < _) match {
          case -1 => 5L
          case i  => i.toLong
        }
        ne += w; ts += BigInt(w) * nChars
      }
      halfUp(ts * 10000, ne)
    }
    val n = reps.toLong
    val sa = perRep.sum
    val ssa = perRep.map(a => a * a).sum
    val mean = sa.toDouble / (n * 10000.0)
    val sd = math.sqrt((BigInt(n) * ssa - sa * sa).toDouble /
                       (n.toDouble * (n - 1))) / 10000.0
    val row = q("q_stats_bootstrap").head()
    assert(row.getLong(0) == n)
    assert(math.abs(row.getDouble(1) - mean) < TOL &&
           math.abs(row.getDouble(2) - sd) < TOL,
      s"bootstrap: got $row expected ($mean, $sd)")
  }

  test("audit: q_stats_permutation — md5-bit reassignment nulls and p") {
    val seg = Tables.customer(spark, sfDir)
      .select(col("c_custkey"), col("c_mktsegment"))
      .collect().toSeq.map(r => (r.getLong(0), r.getString(1)))
      .filter(r => r._2 == "BUILDING" || r._2 == "MACHINERY").toMap
    val pool = ordersRows.flatMap { o =>
      seg.get(o._2).map(s =>
        (o._1, if (s == "BUILDING") 1L else 0L, o._5))
    }
    def stats(assign: ((Long, Long, Long)) => Long)
        : (BigInt, BigInt, Long, Long) = {
      var s1 = BigInt(0); var s0 = BigInt(0); var n1 = 0L; var n0 = 0L
      pool.foreach { r =>
        if (assign(r) == 1L) { s1 += r._3; n1 += 1 }
        else { s0 += r._3; n0 += 1 }
      }
      (s1, s0, n1, n0)
    }
    val (s1o, s0o, n1o, n0o) = stats(_._2)
    val ao = (s1o * n0o - s0o * n1o).abs
    val bo = BigInt(n1o) * n0o
    val bits = pool.map { r =>
      val hh = md5hex(s"${r._1}:0") + md5hex(s"${r._1}:1")
      r._1 -> hh.map(c => "0123456789abcdef".indexOf(c))
    }.toMap
    val nExtreme = (0 until 200).count { rep =>
      val (s1, s0, n1, n0) = stats(r =>
        ((bits(r._1)(rep / 4) >> (rep % 4)) & 1).toLong)
      (s1 * n0 - s0 * n1).abs * bo >= ao * (BigInt(n1) * n0)
    }
    val absdiff4 = halfUp(ao * 100, bo).toDouble / 10000.0
    val p4 = halfUp(BigInt(nExtreme + 1) * 10000,
                    BigInt(201)).toDouble / 10000.0
    val row = q("q_stats_permutation").head()
    assert(row.getLong(0) == n1o && row.getLong(1) == n0o &&
           row.getLong(3) == nExtreme.toLong,
      s"permutation ints: got $row expected ($n1o, $n0o, $nExtreme)")
    assert(math.abs(row.getDouble(2) - absdiff4) < 1e-9 &&
           math.abs(row.getDouble(4) - p4) < 1e-9,
      s"permutation: got $row expected ($absdiff4, $p4)")
  }

  test("audit: q_stats_chisq — independence χ² over the full " +
       "lang×source grid") {
    val obs = docRows.map(d => (d._2, d._3))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val rS = docRows.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val cS = docRows.groupBy(_._3).view.mapValues(_.size.toLong).toMap
    val n = docRows.size.toLong
    // .toSeq: a for over two key SETS would yield a Set and silently
    // collapse equal per-cell quantized terms
    val sq = (for (l <- rS.keys.toSeq; s <- cS.keys.toSeq) yield {
      val o = obs.getOrElse((l, s), 0L)
      val e = rS(l).toDouble * cS(s) / n
      math.round((o - e) * (o - e) / e * 1000000)
    }).sum
    val row = q("q_stats_chisq").head()
    assert(row.getLong(0) == n && row.getLong(1) == rS.size.toLong &&
           row.getLong(2) == cS.size.toLong &&
           row.getLong(3) == (rS.size - 1).toLong * (cS.size - 1),
      s"chisq ints: got $row")
    assert(math.abs(row.getDouble(4) - sq / 1e6) < 1e-9,
      s"chi2: got ${row.getDouble(4)} expected ${sq / 1e6}")
  }

  test("audit: q_win_bollinger — 2σ breaches by exact integer " +
       "cross-multiplication") {
    val daily = dailyRev.toSeq.sortBy(_._1)
    val expected = daily.indices.drop(19).flatMap { i =>
      val win = daily.slice(i - 19, i + 1).map(_._2)
      val n = win.size.toLong
      val s = win.map(BigInt(_)).sum
      val qq = win.map(v => BigInt(v) * v).sum
      val x = BigInt(daily(i)._2)
      val dev = x * n - s
      if (dev * dev * (n - 1) > BigInt(4) * n * (n * qq - s * s))
        Some((daily(i)._1, daily(i)._2 / 100.0,
              if (x * n > s) "hi" else "lo"))
      else None
    }
    val got = q("q_win_bollinger").collect().toSeq.map(r =>
      (r.getLong(0), r.getDouble(1), r.getString(2)))
    assert(got == expected,
      s"bollinger: got ${got.size} rows expected ${expected.size};" +
        s" first got ${got.headOption} expected ${expected.headOption}")
  }

  test("audit: q_ts_changepoint — argmax between-segment gain on the " +
       "exact scale-4 ladder") {
    val daily = dailyRev.toSeq.sortBy(_._1)
    val tn = ordersRows.size.toLong
    val counts = ordersRows.groupBy(_._4).view.mapValues(_.size.toLong)
      .toMap
    val ts = daily.map(d => BigInt(d._2)).sum
    val tssq = ordersRows.map(o => BigInt(o._5) * o._5).sum
    // NOTE: daily sums are per-day revenue; ssq is per-ORDER cents²
    var cn = 0L
    var cs = BigInt(0)
    var best: (BigInt, Long, Long, BigInt) = null // (gain, day, cn, cs)
    daily.foreach { case (day, rev) =>
      cn += counts(day); cs += rev
      if (cn < tn) {
        val gain = halfUp(cs * cs, BigInt(cn)) +
          halfUp((ts - cs) * (ts - cs), BigInt(tn - cn)) -
          halfUp(ts * ts, BigInt(tn))
        if (best == null || gain > best._1) best = (gain, day, cn, cs)
      }
    }
    val (bgain, day, bcn, bcs) = (best._1, best._2, best._3, best._4)
    val denom = tssq - halfUp(ts * ts, BigInt(tn))
    val row = q("q_ts_changepoint").head()
    assert(row.getLong(0) == tn && row.getLong(1) == day &&
           row.getLong(2) == bcn && row.getLong(3) == tn - bcn,
      s"changepoint ints: got $row expected ($tn, $day, $bcn)")
    assert(math.abs(row.getDouble(4) -
             halfUp(bcs * 100, BigInt(bcn)).toDouble / 1e4) < 1e-9 &&
           math.abs(row.getDouble(5) -
             halfUp((ts - bcs) * 100, BigInt(tn - bcn)).toDouble / 1e4)
             < 1e-9,
      s"changepoint means: got $row")
    assert(math.abs(row.getDouble(6) -
             halfUp(bgain * 10000, denom).toDouble / 1e4) < 1e-9,
      s"gain share: got ${row.getDouble(6)}")
  }

  // ---- round-11 batch 8: text_entropy, win_drawdown.

  test("audit: q_text_entropy — per-doc token entropy per lang") {
    val perDoc = docRows.flatMap { case (_, lang, _, _, text) =>
      val cnts = wsTokens(text).groupBy(identity).values.map(_.size)
      if (cnts.isEmpty) None else {
        val n = cnts.sum.toDouble
        Some((lang,
          math.log(n) - cnts.map(c => c * math.log(c.toDouble)).sum / n))
      }
    }
    val expected = perDoc.groupBy(_._1).toSeq.sortBy(_._1).map {
      case (lang, hs) =>
        (lang, hs.size.toLong, hs.map(_._2).sum / hs.size,
         hs.map(_._2).min, hs.map(_._2).max)
    }
    val got = q("q_text_entropy").collect().toSeq.map(r =>
      (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
       r.getDouble(4)))
    assert(got.size == expected.size && got.nonEmpty)
    got.zip(expected).foreach { case (g, e) =>
      assert(g._1 == e._1 && g._2 == e._2, s"entropy ints: $g vs $e")
      assert(math.abs(g._3 - e._3) < TOL && math.abs(g._4 - e._4) < TOL &&
             math.abs(g._5 - e._5) < TOL, s"entropy ${e._1}: $g vs $e")
    }
  }

  test("audit: q_win_drawdown — deepest fall from the running peak") {
    val daily = dailyRev.toSeq.sortBy(_._1)
    var peak = Long.MinValue
    var best: (Long, Long, Long, Long) = null // (dd, day, peak, rev)
    daily.foreach { case (day, rev) =>
      peak = math.max(peak, rev)
      val dd = peak - rev
      if (best == null || dd > best._1) best = (dd, day, peak, rev)
    }
    val (dd, day, pk, rev) = best
    val row = q("q_win_drawdown").head()
    assert(row.getLong(0) == day, s"trough day: got $row expected $day")
    assert(math.abs(row.getDouble(1) - dd / 100.0) < 1e-9 &&
           math.abs(row.getDouble(2) - pk / 100.0) < 1e-9 &&
           math.abs(row.getDouble(3) - rev / 100.0) < 1e-9,
      s"drawdown values: got $row expected ($dd, $pk, $rev)")
    assert(math.abs(row.getDouble(4) -
             halfUp(BigInt(dd) * 10000, BigInt(pk)).toDouble / 1e4)
           < 1e-9, s"dd_frac: got ${row.getDouble(4)}")
  }

  // ====================================== engine-independent golden pins
  //
  // The two r7/r8 plan+oracle edits (MACD kernel scale, eval_lift grid
  // key) were LOCKSTEP edits — the exact failure mode the mirrored-
  // oracle audit exists for. These literals freeze the sf0.001 results
  // as verified by the independent replays above on 2026-08-15: a
  // future lockstep edit of plan AND oracle AND replay cannot silently
  // change semantics without tripping one of these rows.

  test("golden: q_ts_macd sf0.001 — pinned literal rows (micents)") {
    val rows = q("q_ts_macd").collect()
    assert(rows.length == 1094)
    val pin = Map(
      9131L -> (142449310000L, 142449310000L, 0L, 0L, 0L),
      9134L -> (123212096530L, 125228290501L, -2016193971L,
                -682732350L, -1333461621L),
      9135L -> (163875048576L, 160515836519L, 3359212057L,
                2568907531L, 790304526L),
      11534L -> (385192523839L, 406499431216L, -21306907377L,
                 -15219770112L, -6087137265L),
      11535L -> (402728595113L, 414056097480L, -11327502367L,
                 -3934000267L, -7393502100L))
    rows.filter(r => pin.contains(r.getLong(0))).foreach { r =>
      val e = pin(r.getLong(0))
      assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
              r.getLong(5)) == e,
        s"macd golden row ${r.getLong(0)} drifted: got $r expected $e")
    }
  }

  // r9 (VERDICT r8 #5): extend the pins from 2 to one per audited
  // family. Each literal below was produced by the operator at
  // sf0.001 AND cross-checked by this spec's independent textbook
  // replay on 2026-08-15; a lockstep plan+oracle+replay edit now has
  // to tamper with a frozen constant to stay green. Values compare
  // typed (exact integers, bit-exact doubles — the same doubles the
  // DuckDB hash gate already matches).
  private def pinned(name: String, expect: Seq[Seq[Any]],
                     keep: Row => Boolean = _ => true): Unit = {
    val got = q(name).collect().toSeq.filter(keep).map(_.toSeq)
    assert(got == expect,
      s"$name golden rows drifted:\n got $got\n exp $expect")
  }

  test("golden: q_ts_ewma sf0.001 — pinned click rows") {
    pinned("q_ts_ewma",
      Seq(Seq("click", 11L, 0.6), Seq("click", 23L, 14.726666666666667),
          Seq("click", 25L, 171.47714285714287)),
      r => r.getString(0) == "click" && Set(11L, 23L, 25L)(r.getLong(1)))
  }

  test("golden: q_agg_decayed_sum sf0.001 — pinned segment table") {
    pinned("q_agg_decayed_sum", Seq(
      Seq("AUTOMOBILE", 226L, 56846345.81, 9514862.61),
      Seq("BUILDING", 342L, 80389802.88, 10720961.22),
      Seq("FURNITURE", 403L, 101849260.91, 14952157.26),
      Seq("HOUSEHOLD", 224L, 60582938.79, 9906988.89),
      Seq("MACHINERY", 305L, 74778443.22, 8992198.72)))
  }

  test("golden: q_win_rsi sf0.001 — pinned first days") {
    pinned("q_win_rsi",
      Seq(Seq(9164L, 62.6943), Seq(9165L, 56.3255),
          Seq(9169L, 54.2792), Seq(9170L, 56.7114)),
      r => r.getLong(0) <= 9170L)
  }

  test("golden: q_events_mannwhitney sf0.001 — pinned U and z") {
    pinned("q_events_mannwhitney",
      Seq(Seq(210L, 188L, 37822L, -0.7236)))
  }

  test("golden: q_stats_mann_kendall sf0.001 — pinned S/var/z") {
    pinned("q_stats_mann_kendall",
      Seq(Seq(30L, -80L, 56292L, -1.4127)))
  }

  test("golden: q_stats_runs_test sf0.001 — pinned runs and z") {
    pinned("q_stats_runs_test", Seq(Seq(17L, 12L, 15L, -0.0269)))
  }

  test("golden: q_stats_spearman sf0.001 — pinned rho") {
    pinned("q_stats_spearman", Seq(Seq(6000L, -0.0098)))
  }

  test("golden: q_eval_auc sf0.001 — pinned source rows") {
    pinned("q_eval_auc",
      Seq(Seq("src0", 6L, 19L, 0.7544), Seq("src11", 8L, 17L, 0.25),
          Seq("src19", 10L, 15L, 0.48)),
      r => Set("src0", "src11", "src19")(r.getString(0)))
  }

  test("golden: q_events_ab_ttest sf0.001 — pinned Welch t") {
    pinned("q_events_ab_ttest",
      Seq(Seq(210L, 188L, 49.0986, 50.8006, -0.3505)))
  }

  test("golden: q_stats_jarque_bera sf0.001 — pinned JB table") {
    pinned("q_stats_jarque_bera", Seq(
      Seq("click", 210L, 629.7048), Seq("error", 201L, 105.8346),
      Seq("purchase", 202L, 171.739), Seq("signup", 199L, 114.7259),
      Seq("view", 188L, 382.9822)))
  }

  test("golden: q_stats_linreg sf0.001 — pinned OLS table") {
    pinned("q_stats_linreg", Seq(
      Seq("A", 1962L, -4256.1751, 5290676.046),
      Seq("N", 2070L, -2112.0325, 5389011.5298),
      Seq("R", 1968L, 65.978, 5345494.9302)))
  }

  test("golden: q_stats_mcnemar sf0.001 — pinned discordant chi2") {
    pinned("q_stats_mcnemar", Seq(Seq(150L, 2L, 5L, 1.2857)))
  }

  test("golden: q_stats_gini sf0.001 — pinned coefficient") {
    pinned("q_stats_gini", Seq(Seq(150L, 0.2154)))
  }

  test("golden: q_mix_kl sf0.001 — pinned divergence") {
    pinned("q_mix_kl", Seq(Seq(500L, 0.0237)))
  }

  test("golden: q_stats_benford sf0.001 — pinned digit rows") {
    pinned("q_stats_benford",
      Seq(Seq(1, 323L, 0.2153, 0.301), Seq(5, 32L, 0.0213, 0.0792),
          Seq(9, 32L, 0.0213, 0.0458)),
      r => Set(1, 5, 9)(r.getInt(0)))
  }

  test("golden: q_stats_wilson sf0.001 — pinned interval") {
    pinned("q_stats_wilson", Seq(Seq(15L, 15L, 1.0, 0.7961, 1.0)))
  }

  test("golden: q_stats_2prop sf0.001 — pinned pooled z") {
    pinned("q_stats_2prop",
      Seq(Seq(219L, 74L, 246L, 78L, 0.3379, 0.3171, 0.4779)))
  }

  test("golden: q_stats_power sf0.001 — pinned n_required") {
    pinned("q_stats_power",
      Seq(Seq(210L, 188L, 1.702, 12712L, false)))
  }

  test("golden: q_stats_tukey_hsd sf0.001 — pinned pair rows") {
    pinned("q_stats_tukey_hsd",
      Seq(Seq("de", "en", 71L, 193L, 18.9766, 48.9808, false),
          Seq("en", "fr", 193L, 82L, 36.3371, 46.5171, false),
          Seq("fr", "zh", 82L, 74L, 27.2933, 56.5811, false)),
      r => Set(("de", "en"), ("en", "fr"), ("fr", "zh"))(
        (r.getString(0), r.getString(1))))
  }

  test("golden: q_privacy_dp_counts sf0.001 — pinned noisy table") {
    pinned("q_privacy_dp_counts", Seq(
      Seq("AUTOMOBILE", 23L, -7.7705, 15.2295, 0.05),
      Seq("BUILDING", 34L, -6.2467, 27.7533, 0.05),
      Seq("FURNITURE", 40L, 6.1469, 46.1469, 0.05),
      Seq("HOUSEHOLD", 23L, 84.4476, 107.4476, 0.05),
      Seq("MACHINERY", 30L, -21.9671, 8.0329, 0.05)))
  }

  test("golden: q_graph_pagerank sf0.001 — pinned fixed-point ranks") {
    pinned("q_graph_pagerank", Seq(
      Seq(8L, 1638502418148L), Seq(4L, 1095118370000L),
      Seq(7L, 1095118370000L), Seq(2L, 944780944405L),
      Seq(3L, 944780944405L), Seq(6L, 944780944405L),
      Seq(9L, 944780944405L), Seq(0L, 794827726400L),
      Seq(1L, 597309337796L)))
  }

  // r10: one pin per newly-replayed inferential operator (each row
  // produced by the operator at sf0.001 and cross-checked by the
  // textbook replays above on 2026-08-15)

  test("golden: q_ts_granger sf0.001 — pinned F and partial R²") {
    pinned("q_ts_granger", Seq(Seq(500L, 0.4421, 9.0e-4)))
  }

  test("golden: q_ts_ljung_box sf0.001 — pinned ρ₁..₅ and Q") {
    pinned("q_ts_ljung_box",
      Seq(Seq(1094L, 0.0026, 0.0165, -0.0021, -0.0348, -0.0205,
              2.1083)))
  }

  test("golden: q_stats_cochran_armitage sf0.001 — pinned trend z") {
    pinned("q_stats_cochran_armitage", Seq(Seq(1500L, 493L, 0.5331)))
  }

  test("golden: q_stats_seasonal_mk sf0.001 — pinned S/var18/z") {
    pinned("q_stats_seasonal_mk",
      Seq(Seq(1094L, 12L, 695L, 18793530L, 0.6792)))
  }

  test("golden: q_stats_page_trend sf0.001 — pinned L2 and z") {
    pinned("q_stats_page_trend", Seq(Seq(69L, 6274L, 0.7705)))
  }

  test("golden: q_stats_fdr_bh sf0.001 — pinned head + tail of the " +
       "BH-ranked table") {
    pinned("q_stats_fdr_bh", Seq(
      Seq("NATION_3", 40L, 6L, -2.4056, 16145L, 1L, 0L),
      Seq("NATION_5", 51L, 24L, 2.1577, 30953L, 2L, 0L),
      Seq("NATION_11", 118L, 49L, 2.0024, 45242L, 3L, 0L),
      Seq("NATION_13", 83L, 28L, 0.1684, 866267L, 25L, 0L)),
      r => Set(1L, 2L, 3L, 25L)(r.getLong(5)))
  }

  test("golden: q_events_survival sf0.001 — pinned KM table") {
    pinned("q_events_survival", Seq(
      Seq(0L, 15L, 8L, 0.4667), Seq(1L, 7L, 3L, 0.2667),
      Seq(2L, 4L, 1L, 0.2), Seq(3L, 3L, 1L, 0.1333),
      Seq(4L, 2L, 1L, 0.0667), Seq(9L, 1L, 1L, 0.0)))
  }

  test("golden: q_stats_isotonic sf0.001 — pinned bins and monotone fit") {
    pinned("q_stats_isotonic", Seq(
      Seq(4, 19L, 8L, 0.4211, 0.386), Seq(5, 106L, 44L, 0.4151, 0.386),
      Seq(6, 122L, 50L, 0.4098, 0.386), Seq(7, 127L, 46L, 0.3622, 0.386),
      Seq(8, 126L, 45L, 0.3571, 0.386)))
  }

  test("golden: q_events_hill_tail sf0.001 — pinned k/x_kp1/sum_ln9/α") {
    pinned("q_events_hill_tail",
      Seq(Seq(14L, 51L, 3887291155L, 3.6015)))
  }

  test("golden: q_ts_theil_sen sf0.001 — pinned slope/intercept") {
    pinned("q_ts_theil_sen", Seq(Seq(30L, 435L, -0.2, 3980.4)))
  }

  test("golden: q_events_ks sf0.001 — pinned D") {
    pinned("q_events_ks", Seq(Seq(210L, 188L, 0.0646)))
  }

  test("golden: q_stats_wmedian sf0.001 — pinned per-flag medians") {
    pinned("q_stats_wmedian", Seq(
      Seq("A", 5049252L, 49341L), Seq("N", 5350643L, 53170L),
      Seq("R", 5254597L, 49746L)))
  }

  test("golden: q_stats_grubbs sf0.001 — pinned extreme day and G") {
    pinned("q_stats_grubbs", Seq(Seq(9300L, 1094L, 1430317.79, 4.7506)))
  }

  test("golden: q_stats_sign_test sf0.001 — pinned signs and z") {
    pinned("q_stats_sign_test", Seq(Seq(538L, 549L, -0.3336)))
  }

  test("golden: q_stats_circular_hour sf0.001 — pinned directions") {
    pinned("q_stats_circular_hour", Seq(
      Seq("click", 210L, 2.0453, 0.0187),
      Seq("error", 201L, 21.6672, 0.0746),
      Seq("purchase", 202L, 11.7528, 0.0866),
      Seq("signup", 199L, 17.7207, 0.036),
      Seq("view", 188L, 19.4503, 0.0421)))
  }

  test("golden: q_events_kruskal sf0.001 — pinned N/groups/ties/H") {
    pinned("q_events_kruskal", Seq(Seq(1000L, 5L, 288L, 1.0646)))
  }

  test("golden: q_stats_cramers_v sf0.001 — pinned χ² and V") {
    pinned("q_stats_cramers_v", Seq(Seq(1500L, 3L, 5L, 9.4116, 0.056)))
  }

  test("golden: q_events_cusum sf0.001 — pinned changepoints") {
    pinned("q_events_cusum", Seq(
      Seq("click", 210L, 65L, 1704881048690753L, 873.3498, "hi"),
      Seq("error", 201L, 129L, 1705549433886808L, 525.7945, "hi"),
      Seq("purchase", 202L, 44L, 1704595184327101L, 488.8846, "lo"),
      Seq("signup", 199L, 45L, 1704559575525092L, 648.159, "hi"),
      Seq("view", 188L, 100L, 1705438894078324L, 591.2738, "lo")))
  }

  test("golden: q_stats_levene sf0.001 — pinned BF stat") {
    pinned("q_stats_levene", Seq(Seq(5L, 1000L, 0.5503)))
  }

  test("golden: q_events_anova sf0.001 — pinned SS and F") {
    pinned("q_events_anova",
      Seq(Seq(5L, 1000L, 34741161.8422, 22553846226.7968, 0.3832)))
  }

  test("golden: q_stats_theil_u sf0.001 — pinned entropies and U") {
    pinned("q_stats_theil_u", Seq(Seq(1.6078, 1.0984, 0.0019, 0.0029)))
  }

  test("golden: q_stats_median_ci sf0.001 — pinned ranks and interval") {
    pinned("q_stats_median_ci", Seq(
      Seq(1500L, 712L, 750L, 789L, 241971.01, 253481.78, 267145.94)))
  }

  test("golden: q_agg_skew_kurtosis sf0.001 — pinned per-type moments") {
    pinned("q_agg_skew_kurtosis", Seq(
      Seq("click", 210L, 2.2113, 7.2393),
      Seq("error", 201L, 1.445, 2.0701),
      Seq("purchase", 202L, 1.6263, 3.1345),
      Seq("signup", 199L, 1.4417, 2.3499),
      Seq("view", 188L, 1.9316, 5.8281)))
  }

  test("golden: q_events_markov_entropy sf0.001 — pinned chain entropy") {
    pinned("q_events_markov_entropy", Seq(Seq(985L, 25L, 1.6013)))
  }

  test("golden: q_stats_friedman sf0.001 — pinned blocked-rank χ²") {
    pinned("q_stats_friedman", Seq(Seq(69L, 5L, 860140L, 4.5797)))
  }

  test("golden: q_events_fano sf0.001 — pinned dispersion per type") {
    pinned("q_events_fano", Seq(
      Seq("click", 181L, 210L, 0.135), Seq("error", 175L, 201L, 0.1201),
      Seq("purchase", 170L, 202L, 0.1682),
      Seq("signup", 176L, 199L, 0.1306),
      Seq("view", 166L, 188L, 0.1122)))
  }

  test("golden: q_eval_kappa sf0.001 — pinned κ") {
    pinned("q_eval_kappa", Seq(Seq(500L, 0L, 117L, 0.0399)))
  }

  test("golden: q_eval_mcc sf0.001 — pinned 2×2 and MCC") {
    pinned("q_eval_mcc", Seq(Seq(47L, 240L, 67L, 146L, 0.0293)))
  }

  test("golden: q_eval_brier sf0.001 — pinned score and reference") {
    pinned("q_eval_brier", Seq(Seq(500L, 193L, 0.3537, 0.237)))
  }

  test("golden: q_eval_calibration sf0.001 — pinned reliability table") {
    pinned("q_eval_calibration", Seq(
      Seq(4, 19L, 8L, 0.45, 0.4211, 0.311),
      Seq(5, 106L, 44L, 0.55, 0.4151, 0.311),
      Seq(6, 122L, 50L, 0.65, 0.4098, 0.311),
      Seq(7, 127L, 46L, 0.75, 0.3622, 0.311),
      Seq(8, 126L, 45L, 0.85, 0.3571, 0.311)))
  }

  test("golden: q_eval_ranking sf0.001 — pinned head + nonzero rows") {
    pinned("q_eval_ranking", Seq(
      Seq(0L, 50L, 2L, 0.2, 0.0393, 0.1428),
      Seq(2L, 62L, 1L, 0.1, 0.0125, 0.0694),
      Seq(6L, 42L, 3L, 0.3, 0.1067, 0.2614),
      Seq(8L, 49L, 2L, 0.2, 0.0472, 0.161)),
      r => Set(0L, 2L, 6L, 8L)(r.getLong(0)))
  }

  test("golden: q_eval_prf sf0.001 — pinned per-class P/R/F1") {
    pinned("q_eval_prf", Seq(
      Seq("de", 71L, 254L, 40L, 0.1575, 0.5634, 0.2462),
      Seq("en", 193L, 114L, 47L, 0.4123, 0.2435, 0.3062),
      Seq("es", 80L, 55L, 11L, 0.2, 0.1375, 0.163),
      Seq("fr", 82L, 51L, 13L, 0.2549, 0.1585, 0.1955),
      Seq("zh", 74L, 26L, 6L, 0.2308, 0.0811, 0.12)))
  }

  test("golden: q_ts_autocorr sf0.001 — pinned lag-1 r per type") {
    pinned("q_ts_autocorr", Seq(
      Seq("click", 57L, 0.3086), Seq("error", 45L, -0.144),
      Seq("purchase", 42L, -0.2708), Seq("signup", 47L, -0.1249),
      Seq("view", 41L, -0.0516)))
  }

  test("golden: q_stats_sketch_quantile sf0.001 — pinned est/exact") {
    pinned("q_stats_sketch_quantile", Seq(
      Seq("click", 210L, 3379L, 3319L, 14899L, 14812L, 25395L, 25394L),
      Seq("error", 201L, 3417L, 3355L, 12502L, 12460L, 18585L, 18557L),
      Seq("purchase", 202L, 3588L, 3562L, 14116L, 14064L, 21396L,
          21310L),
      Seq("signup", 199L, 3887L, 3790L, 15647L, 15601L, 23102L, 23025L),
      Seq("view", 188L, 3756L, 3711L, 12796L, 12711L, 28616L, 28520L)))
  }

  test("golden: q_agg_countmin sf0.001 — pinned top-10 estimates") {
    pinned("q_agg_countmin", Seq(
      Seq("scan", 984L, 1958L, 974L), Seq("column", 978L, 978L, 0L),
      Seq("window", 976L, 1879L, 903L), Seq("order", 975L, 1885L, 910L),
      Seq("sort", 974L, 1910L, 936L), Seq("part", 963L, 992L, 29L),
      Seq("agg", 953L, 953L, 0L), Seq("value", 950L, 1895L, 945L),
      Seq("line", 946L, 946L, 0L), Seq("key", 945L, 945L, 0L)))
  }

  test("golden: q_distinct_kmv sf0.001 — pinned small-side estimates") {
    pinned("q_distinct_kmv", Seq(
      Seq("click", 15L, 15.0), Seq("error", 15L, 15.0),
      Seq("purchase", 15L, 15.0), Seq("signup", 15L, 15.0),
      Seq("view", 15L, 15.0)))
  }

  test("golden: q_privacy_dp_sum sf0.001 — pinned clipped sums + noise") {
    pinned("q_privacy_dp_sum", Seq(
      Seq("AUTOMOBILE", 23L, 76508.26, -18410.5742, 58097.6858, 0.1),
      Seq("BUILDING", 34L, 108050.36, -36145.6609, 71904.6991, 0.1),
      Seq("FURNITURE", 40L, 123454.54, -21038.5892, 102415.9508, 0.1),
      Seq("HOUSEHOLD", 23L, 84983.94, -5206.5198, 79777.4202, 0.1),
      Seq("MACHINERY", 30L, 103088.95, -8880.7317, 94208.2183, 0.1)))
  }

  test("golden: q_ts_kendall sf0.001 — pinned concordance and τ") {
    pinned("q_ts_kendall",
      Seq(Seq(1094L, 597871L, 232131L, 37481L, 0.4848)))
  }

  test("golden: q_ts_hodges_lehmann sf0.001 — pinned HL shift") {
    pinned("q_ts_hodges_lehmann", Seq(Seq(37026L, -17828.25)))
  }

  test("golden: q_ts_mase sf0.001 — pinned error ratio") {
    pinned("q_ts_mase", Seq(Seq(1093L, 1087L, 255897.7330558097,
                                250927.36270469183, 0.9806)))
  }

  test("golden: q_text_jsd sf0.001 — pinned head sources") {
    pinned("q_text_jsd",
      Seq(Seq("src0", 31L, 0.0031), Seq("src1", 31L, 0.0018),
          Seq("src18", 30L, 0.0054), Seq("src19", 31L, 0.0023)),
      r => Set("src0", "src1", "src18", "src19")(r.getString(0)))
  }

  test("golden: q_text_readability sf0.001 — pinned head sources") {
    pinned("q_text_readability", Seq(
      Seq("src0", 25L, 1533L, 2188L, 61.32, 1.4273, 23.8484),
      Seq("src1", 25L, 1441L, 2062L, 57.64, 1.431, 27.272),
      Seq("src19", 25L, 1369L, 1993L, 54.76, 1.4558, 28.0923)),
      r => Set("src0", "src1", "src19")(r.getString(0)))
  }

  test("golden: q_stats_bootstrap sf0.001 — pinned CI (post-grid-fix)") {
    pinned("q_stats_bootstrap", Seq(Seq(10L, 304.7614, 3.8268)))
  }

  test("golden: q_stats_permutation sf0.001 — pinned null count and p") {
    pinned("q_stats_permutation",
      Seq(Seq(342L, 305L, 10117.3205, 78L, 0.393)))
  }

  test("golden: q_stats_chisq sf0.001 — pinned independence χ²") {
    pinned("q_stats_chisq", Seq(Seq(500L, 5L, 20L, 76L, 77.688457)))
  }

  test("golden: q_win_bollinger sf0.001 — pinned breach count + edges") {
    val got = q("q_win_bollinger").collect().toSeq.map(r =>
      (r.getLong(0), r.getDouble(1), r.getString(2)))
    assert(got.size == 47, s"breach count drifted: ${got.size}")
    assert(got.head == ((9279L, 875609.76, "hi")) &&
           got(1) == ((9298L, 935666.78, "hi")) &&
           got.last == ((11527L, 866249.75, "hi")),
      s"bollinger edges drifted: ${got.head} .. ${got.last}")
  }

  test("golden: q_ts_changepoint sf0.001 — pinned split") {
    pinned("q_ts_changepoint", Seq(
      Seq(1500L, 9329L, 126L, 1374L, 275363.3542, 247271.4767, 0.0029)))
  }

  test("golden: q_text_entropy sf0.001 — pinned per-lang entropy") {
    pinned("q_text_entropy", Seq(
      Seq("de", 71L, 3.0176, 2.246, 3.3028),
      Seq("en", 193L, 2.9731, 1.8938, 3.3014),
      Seq("es", 80L, 3.0068, 2.2539, 3.3048),
      Seq("fr", 82L, 3.0537, 2.2048, 3.2863),
      Seq("zh", 74L, 2.9965, 2.0947, 3.3083)))
  }

  test("golden: q_win_drawdown sf0.001 — pinned trough") {
    pinned("q_win_drawdown",
      Seq(Seq(11235L, 1428997.28, 1430317.79, 1320.51, 0.9991)))
  }

  test("golden: q_eval_lift sf0.001 — pinned literal decile table") {
    val expected = Seq(
      (0L, 50L, 21L, 1.0881, 0.1088), (1L, 50L, 15L, 0.7772, 0.1865),
      (2L, 50L, 13L, 0.6736, 0.2539), (3L, 50L, 19L, 0.9845, 0.3523),
      (4L, 50L, 21L, 1.0881, 0.4611), (5L, 50L, 19L, 0.9845, 0.5596),
      (6L, 50L, 22L, 1.1399, 0.6736), (7L, 50L, 20L, 1.0363, 0.7772),
      (8L, 50L, 23L, 1.1917, 0.8964), (9L, 50L, 20L, 1.0363, 1.0))
    val got = q("q_eval_lift").collect().toSeq.map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
       r.getDouble(4)))
    assert(got == expected,
      s"eval_lift golden table drifted:\n got $got\n exp $expected")
  }
}
