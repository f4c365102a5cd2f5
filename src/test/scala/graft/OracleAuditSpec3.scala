package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.io.Tables

/** MIRRORED-ORACLE AUDIT, batch 10 (round 12, extending VERDICT r11
  * #5 past the named families).
  *
  * Same contract as [[OracleAuditSpec]] / [[OracleAuditSpec2]]: every
  * test recomputes a declared query INDEPENDENTLY in plain Scala on
  * the collected sf0.001 fixture, from the textbook definition —
  * never through the Determinism/api helpers the plans use. This
  * batch targets the remaining hash-gate-only operators whose plan
  * and oracle mirror a NON-TRIVIAL derivation (the class where a
  * lockstep bug could freeze both sides wrong):
  *
  *  - q_embed_pca_power — the exact-integer matrix-free power
  *    iteration, replayed as three BigInt Xᵀ(Xv) passes;
  *  - q_embed_silhouette — simplified silhouette on integer L2;
  *  - q_sim_knn_classify — int8 quantization + integer-dot kNN vote;
  *  - q_text_bigram_lm — add-one-smoothed bigram NLL;
  *  - q_curate_dsir — hashed-bucket importance log-weights;
  *  - q_mix_waterfill — the exact max-min-fairness water level;
  *  - q_layout_zvalue — the Morton bit interleave;
  *  - q_events_mad — interpolated median / MAD outlier gate;
  *  - q_macro_seasonal_index — ratio-to-average months;
  *  - q_stats_kish — the (Σw)²/Σw² effective sample size;
  *  - q_udaf_geomean — grades the custom Aggregator against ln/exp.
  *
  * Integer outputs must match exactly; scale-4 doubles within TOL
  * (half a 1e-4 grid step + float headroom).
  */
class OracleAuditSpec3 extends SparkSpec {

  private val TOL = 6e-5

  private def q(name: String) = SparkEntry.queries(name)(spark, sfDir)

  // ------------------------------------------------ replay primitives

  private def md5Hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    d.map(b => f"$b%02x").mkString
  }
  private def u16(s: String): Long =
    java.lang.Long.parseLong(md5Hex(s).substring(0, 4), 16)

  /** Textbook half-up division (positive den), half-away-from-zero on
    * negative numerators — the intRatio4/halfUpDivWide contract. */
  private def halfUp(num: BigInt, den: BigInt): BigInt = {
    require(den > 0)
    if (num >= 0) (num * 2 + den) / (den * 2)
    else -((-num * 2 + den) / (den * 2))
  }

  /** Exact cents of a money double (DECIMAL(18,2) half-up). */
  private def cents(v: Double): Long =
    BigDecimal(java.lang.Double.toString(v).toDouble)
      .setScale(2, BigDecimal.RoundingMode.HALF_UP)
      .*(100).toLongExact

  /** Spark's round(x, p) for doubles: decimal HALF_UP on the shortest
    * decimal representation. */
  private def roundAt(v: Double, p: Int): Double =
    BigDecimal(java.lang.Double.toString(v).toDouble)
      .setScale(p, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Spark's round(f, 0) for a FLOAT input (Round on FloatType works
    * on the float's shortest decimal representation) — the grid64
    * quantizer runs its multiply IN float, so the replay must too. */
  private def roundF0(f: Float): Long =
    BigDecimal(java.lang.Float.toString(f))
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLongExact

  /** The one tokenizer (Dedup.tokens / toksSql). */
  private def toks(text: String): Array[String] =
    text.split("[ \\t\\n\\r\\f\\x0B]+").filter(_.nonEmpty)

  /** Interpolated quantile_cont(…, 0.5) over longs — the exact
    * median both engines compute (sorted, rank (n−1)/2, linear
    * interpolation between the straddling values). */
  private def medianCont(xs: Seq[Long]): Double = {
    val s = xs.sorted
    val n = s.size
    require(n > 0)
    if (n % 2 == 1) s(n / 2).toDouble
    else (s(n / 2 - 1) + s(n / 2)) / 2.0
  }

  private def approxEq(a: Double, b: Double): Boolean =
    (a.isNaN && b.isNaN) || math.abs(a - b) <= TOL

  // ------------------------------------------------ fixture collections

  /** (doc_id, lang, source, text, n_chars) */
  private lazy val docRows: Seq[(Long, String, String, String, Long)] =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), col("source"), col("text"),
              col("n_chars"))
      .collect().toSeq.map { r =>
        (r.getLong(0), r.getString(1), r.getString(2), r.getString(3),
         r.getLong(4))
      }

  /** (event_type, event_id, value_cents) */
  private lazy val evRows: Seq[(String, Long, Long)] =
    Tables.events(spark, sfDir)
      .select(col("event_type"), col("event_id"), col("value"))
      .collect().toSeq.map(r =>
        (r.getString(0), r.getLong(1), cents(r.getDouble(2))))

  /** (o_orderkey, orderdate, o_custkey, totalprice_double) */
  private lazy val orderRows: Seq[(Long, java.time.LocalDate, Long, Double)] =
    Tables.orders(spark, sfDir)
      .select(col("o_orderkey"),
              expr("unix_micros(cast(o_orderdate as timestamp))"),
              col("o_custkey"), col("o_totalprice"))
      .collect().toSeq.map { r =>
        (r.getLong(0),
         java.time.LocalDate.ofEpochDay(r.getLong(1) / 86400000000L),
         r.getLong(2), r.getDouble(3))
      }

  /** (vec_id, label, embedding floats), nulls excluded. */
  private lazy val embRows: Seq[(Long, Int, Array[Float])] =
    Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("label"), col("embedding"))
      .collect().toSeq.flatMap { r =>
        if (r.isNullAt(2)) None
        else Some((r.getLong(0), r.getInt(1),
                   r.getSeq[Float](2).toArray))
      }

  /** (l_returnflag, l_quantity) */
  private lazy val lineQty: Seq[(String, Double)] =
    Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag"), col("l_quantity"))
      .collect().toSeq.map(r => (r.getString(0), r.getDouble(1)))

  // =============================================== embedding family

  test("audit: q_embed_pca_power — BigInt matrix-free power iteration") {
    // quantize exactly as the plan: round(double(x) · 1e6) half-up
    val vecs = embRows.filter(_._3.length == 64)
      .map { case (_, _, e) =>
        e.map(x => BigInt(roundAt(x.toDouble * 1e6, 0).toLong))
      }
    def rescale(raw: Array[BigInt]): Array[BigInt] = {
      val m = raw.map(_.abs).max
      raw.map(r => halfUp(r * 10000, m))
    }
    def xtx(v: Array[BigInt]): Array[BigInt] = {
      // w_i = Σ_j q_ij·v_j ; raw_j = Σ_i w_i·q_ij — never a d×d matrix
      val raw = Array.fill(64)(BigInt(0))
      for (q <- vecs) {
        val w = (0 until 64).map(j => q(j) * v(j)).sum
        for (j <- 0 until 64) raw(j) += w * q(j)
      }
      raw
    }
    val w0raw = Array.tabulate(64) { j =>
      vecs.map(q => q.sum * q(j)).sum
    }
    val v1 = rescale(w0raw)
    val v3 = rescale(xtx(rescale(xtx(v1))))
    val sw2 = vecs.map { q =>
      val w = (0 until 64).map(j => q(j) * v3(j)).sum; w * w
    }.sum
    val sv2 = v3.map(u => u * u).sum
    val jm = (0 until 64).find(j => v3(j).abs == 10000).get
    val sg = if (v3(jm) >= 0) 1 else -1
    val expLoad = v3.map(u => (u * sg).toDouble / 10000.0)
    val expEig =
      roundAt(sw2.toDouble / sv2.toDouble / 1e12, 4)
    val got = q("q_embed_pca_power").collect()
    assert(got.length == 64)
    for (r <- got) {
      val dim = r.getLong(0).toInt
      assert(r.getDouble(1) == expLoad(dim),
        s"loading4 at dim $dim: got ${r.getDouble(1)}, exp ${expLoad(dim)}")
      assert(approxEq(r.getDouble(2), expEig),
        s"eigval4: got ${r.getDouble(2)}, exp $expEig")
    }
  }

  test("audit: q_embed_silhouette — integer-L2 nearest vs runner-up") {
    // grid64 multiplies IN FLOAT: q = round(x·10000f) on the float
    def g64(e: Array[Float]): Array[Long] = e.map(x => roundF0(x * 10000f))
    val cells = embRows.filter(_._1 < 8)
      .map { case (id, _, e) => (id, g64(e)) }
    val per = embRows.map { case (_, _, e) =>
      val qv = g64(e)
      val ds = cells.map { case (cell, c) =>
        val dd = qv.indices.map { i =>
          val df = BigInt(qv(i) - c(i)); df * df
        }.sum
        (dd, cell)
      }.sortBy(t => (t._1, t._2))
      (ds(0)._2, ds(0)._1, ds(1)._1) // (cell, a2, b2)
    }
    val expected = per.groupBy(_._1).toSeq.map { case (cell, rs) =>
      val ss = rs.map { case (_, a2, b2) =>
        if (b2 > 0) halfUp((b2 - a2) * 10000, b2) else BigInt(0)
      }.sum
      (cell, rs.size.toLong, halfUp(ss, rs.size).toDouble / 10000.0)
    }.sortBy(_._1)
    val got = q("q_embed_silhouette").collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.map(t => (t._1, t._2)) == expected.map(t => (t._1, t._2)),
      s"silhouette cells/counts:\n got $got\n exp $expected")
    for ((g, e) <- got.zip(expected))
      assert(approxEq(g._3, e._3), s"avg_sil4 at cell ${g._1}: $g vs $e")
  }

  test("audit: q_sim_knn_classify — int8 dot kNN majority vote") {
    val quant = embRows.flatMap { case (id, lbl, e) =>
      val amax = e.map(math.abs).max // float max, as array_max(|x|)
      if (amax <= 0) None
      else {
        val scale = 127.0 / amax.toDouble
        Some((id, lbl,
              e.map(x => roundAt(x.toDouble * scale, 0).toInt)))
      }
    }
    val preds = quant.filter(_._1 < 30).map { case (qid, qlbl, qv) =>
      val ranked = quant.filter(_._1 != qid).map { case (cid, clbl, cv) =>
        val dot = qv.indices.map(i => qv(i).toLong * cv(i)).sum
        (dot, cid, clbl)
      }.sortBy(t => (-t._1, t._2)).take(5)
      val vote = ranked.groupBy(_._3).toSeq
        .map { case (l, rs) => (l, rs.size) }
        .sortBy { case (l, n) => (-n, l) }.head._1
      (qlbl, vote)
    }
    val expected = preds.groupBy(_._1).toSeq.map { case (lbl, ps) =>
      val nc = ps.count(p => p._2 == p._1).toLong
      (lbl, ps.size.toLong, nc,
       halfUp(BigInt(nc) * 10000, ps.size).toDouble / 10000.0)
    }.sortBy(_._1)
    val got = q("q_sim_knn_classify").collect().toSeq
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
                 r.getDouble(3)))
    assert(got == expected,
      s"knn_classify:\n got $got\n exp $expected")
  }

  // =============================================== text / curation

  test("audit: q_text_bigram_lm — add-one-smoothed bigram NLL") {
    val docToks = docRows.map { case (id, lang, src, text, _) =>
      (id, lang, src, toks(text))
    }
    val vocab = docToks.iterator.flatMap(_._4).toSet.size
    val allBg = docToks.flatMap { case (id, _, _, w) =>
      if (w.length < 2) Nil
      else w.sliding(2).map(p => (id, p(0), p(1))).toSeq
    }
    val c2 = allBg.groupBy(b => (b._2, b._3)).map { case (k, v) =>
      k -> v.size
    }
    val c1 = allBg.groupBy(_._2).map { case (k, v) => k -> v.size }
    val nll = allBg.groupBy(_._1).map { case (id, bs) =>
      val s = bs.map { case (_, w1, w2) =>
        math.log(c1(w1).toDouble + vocab) -
          math.log(c2((w1, w2)).toDouble + 1)
      }.sum
      id -> (bs.size.toLong, s / bs.size)
    }
    val expected = docToks.flatMap { case (id, lang, src, _) =>
      nll.get(id).map { case (nb, v) => (lang, src, nb, v) }
    }.groupBy(t => (t._1, t._2)).toSeq.map { case ((lang, src), rs) =>
      (lang, src, rs.size.toLong, rs.map(_._3).sum,
       roundAt(rs.map(_._4).sum / rs.size, 4),
       roundAt(rs.map(_._4).min, 4), roundAt(rs.map(_._4).max, 4))
    }.sortBy(t => (t._1, t._2))
    val got = q("q_text_bigram_lm").collect().toSeq.map(r =>
      (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
       r.getDouble(4), r.getDouble(5), r.getDouble(6)))
    assert(got.map(t => (t._1, t._2, t._3, t._4)) ==
             expected.map(t => (t._1, t._2, t._3, t._4)),
      s"bigram_lm keys/counts:\n got $got\n exp $expected")
    for ((g, e) <- got.zip(expected)) {
      assert(approxEq(g._5, e._5) && approxEq(g._6, e._6) &&
               approxEq(g._7, e._7),
        s"bigram_lm nll at (${g._1},${g._2}): $g vs $e")
    }
  }

  test("audit: q_curate_dsir — hashed-bucket importance log-weights") {
    val perDoc = docRows.map { case (id, lang, src, text, _) =>
      val bc = toks(text).map(w => (u16(w) % 256).toInt)
        .groupBy(identity).map { case (b, ws) => b -> ws.length.toLong }
      (id, lang, src, bc)
    }
    val statsR = scala.collection.mutable.Map[Int, Long]()
    val statsT = scala.collection.mutable.Map[Int, Long]()
    for ((_, lang, _, bc) <- perDoc; (b, c) <- bc) {
      statsR(b) = statsR.getOrElse(b, 0L) + c
      if (lang == "en") statsT(b) = statsT.getOrElse(b, 0L) + c
    }
    val rr = statsR.values.sum.toDouble
    val tt = statsT.values.sum.toDouble
    val lw = statsR.keys.map { b =>
      b -> (math.log(statsT.getOrElse(b, 0L).toDouble + 1.0) -
            math.log(tt + 256.0) -
            math.log(statsR(b).toDouble + 1.0) + math.log(rr + 256.0))
    }.toMap
    val docW = perDoc.map { case (id, _, src, bc) =>
      (src, bc.map { case (b, c) => c.toDouble * lw(b) }.sum)
    }
    val expected = docW.groupBy(_._1).toSeq.map { case (src, rs) =>
      val ws = rs.map(_._2)
      (src, rs.size.toLong, roundAt(ws.sum / ws.size, 4),
       roundAt(ws.min, 4), roundAt(ws.max, 4))
    }.sortBy(_._1)
    val got = q("q_curate_dsir").collect().toSeq.map(r =>
      (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
       r.getDouble(4)))
    assert(got.map(t => (t._1, t._2)) == expected.map(t => (t._1, t._2)),
      s"dsir sources:\n got $got\n exp $expected")
    for ((g, e) <- got.zip(expected))
      assert(approxEq(g._3, e._3) && approxEq(g._4, e._4) &&
               approxEq(g._5, e._5), s"dsir weights: $g vs $e")
  }

  // =============================================== allocation / layout

  test("audit: q_mix_waterfill — exact max-min-fair char budget") {
    val avail = docRows.groupBy(_._3).map { case (src, rs) =>
      src -> rs.map(_._5).sum
    }.toSeq
    val n = avail.size
    val tott = avail.map(_._2).sum
    val t = tott / 2
    val byAvail = avail.sortBy { case (s, a) => (a, s) } // k = 1-based
    val cum = byAvail.scanLeft(0L)(_ + _._2).tail
    val kstar = (1 until n).filter { k =>
      byAvail(k - 1)._2 <= (t - cum(k - 1)) / (n - k)
    }.lastOption.getOrElse(0)
    val cumk = if (kstar == 0) 0L else cum(kstar - 1)
    val lam = Math.floorDiv(t - cumk, (n - kstar).toLong)
    val rem = Math.floorMod(t - cumk, (n - kstar).toLong)
    val kOf = byAvail.zipWithIndex.map { case ((s, _), i) =>
      s -> (i + 1)
    }.toMap
    var urank = 0L
    val expected = avail.sortBy(_._1).map { case (src, av) =>
      if (kOf(src) > kstar) urank += 1
      val alloc =
        if (kOf(src) <= kstar) av
        else lam + (if (urank <= rem) 1L else 0L)
      (src, av, alloc,
       halfUp(BigInt(alloc) * 10000, av).toDouble / 10000.0)
    }
    // the allocation must spend the budget to the char
    assert(expected.map(_._3).sum == t, "waterfill replay: Σalloc ≠ T")
    val got = q("q_mix_waterfill").collect().toSeq.map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got == expected, s"waterfill:\n got $got\n exp $expected")
  }

  test("audit: q_layout_zvalue — Morton interleave replayed bitwise") {
    val expected = orderRows.map { case (ok, _, ck, tp) =>
      val x = ck % 256
      val y = math.min(math.floor(tp / 2000.0).toLong, 255L)
      var zv = 0L
      for (i <- 0 until 8) {
        zv |= ((x >> i) & 1L) << (2 * i)
        zv |= ((y >> i) & 1L) << (2 * i + 1)
      }
      (ok, zv)
    }.sortBy(_._1)
    val got = q("q_layout_zvalue").collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got == expected,
      s"zvalue: first diff ${got.zip(expected).find(p => p._1 != p._2)}")
  }

  // =============================================== events / macro / stats

  test("audit: q_events_mad — interpolated median/MAD outlier gate") {
    val byType = evRows.groupBy(_._1)
    val expected = byType.toSeq.flatMap { case (t, rs) =>
      val med = medianCont(rs.map(_._3))
      val mad = medianCont(
        // deviations land on x.0/x.5 cents — ×2 keeps them integral
        rs.map(r => (math.abs(r._3 - med) * 2).toLong)) / 2.0
      rs.filter(r => math.abs(r._3 - med) > 3 * mad).map { r =>
        (t, r._2, r._3.toDouble / 100.0,
         (math.abs(r._3 - med) * 10).toLong,
         if (r._3 > med) "hi" else "lo")
      }
    }.sortBy(t => (t._1, t._2))
    val got = q("q_events_mad").collect().toSeq.map(r =>
      (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3),
       r.getString(4)))
    assert(got == expected,
      s"mad: ${got.size} vs ${expected.size} rows; " +
        s"first diff ${got.zip(expected).find(p => p._1 != p._2)}")
  }

  test("audit: q_macro_seasonal_index — ratio-to-average months") {
    val mrev = orderRows.groupBy(r => (r._2.getYear, r._2.getMonthValue))
      .map { case (ym, rs) => ym -> rs.map(r => cents(r._4)).sum }
    val ytot = mrev.groupBy(_._1._1).map { case (y, ms) =>
      y -> (ms.values.sum, ms.size)
    }
    val expected = mrev.toSeq.map { case ((y, m), rev) =>
      val (tot, nmo) = ytot(y)
      (y, m, rev.toDouble / 100.0,
       halfUp(BigInt(rev) * nmo * 10000, tot).toDouble / 10000.0)
    }.sortBy(t => (t._1, t._2))
    val got = q("q_macro_seasonal_index").collect().toSeq.map(r =>
      (r.getInt(0), r.getInt(1), r.getDouble(2), r.getDouble(3)))
    assert(got == expected,
      s"seasonal: first diff ${got.zip(expected).find(p => p._1 != p._2)}")
  }

  test("audit: q_stats_kish — (Σw)²/Σw² effective sample size") {
    val expected = docRows.groupBy(_._3).toSeq.map { case (src, rs) =>
      val sw = rs.map(r => BigInt(r._5)).sum
      val sw2 = rs.map(r => BigInt(r._5) * r._5).sum
      (src, rs.size.toLong,
       halfUp(sw * sw * 10000, sw2).toDouble / 10000.0,
       halfUp(sw * sw * 10000, sw2 * rs.size).toDouble / 10000.0)
    }.sortBy(_._1)
    val got = q("q_stats_kish").collect().toSeq.map(r =>
      (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(got.map(t => (t._1, t._2)) == expected.map(t => (t._1, t._2)),
      s"kish keys:\n got $got\n exp $expected")
    for ((g, e) <- got.zip(expected))
      assert(approxEq(g._3, e._3) && approxEq(g._4, e._4),
        s"kish ess at ${g._1}: $g vs $e")
    // sanity the statistic itself: 1/n ≤ efficiency ≤ 1 always
    for ((_, nn, _, eff) <- expected)
      assert(eff >= 1.0 / nn - TOL && eff <= 1.0 + TOL)
  }

  test("audit: q_udaf_geomean — custom Aggregator vs exp(mean(ln))") {
    val expected = lineQty.groupBy(_._1).toSeq.map { case (rf, rs) =>
      val pos = rs.map(_._2).filter(_ > 0.0)
      (rf, roundAt(math.exp(pos.map(math.log).sum / pos.size), 4),
       rs.size.toLong)
    }.sortBy(_._1)
    val got = q("q_udaf_geomean").collect().toSeq.map(r =>
      (r.getString(0), r.getDouble(1), r.getLong(2)))
    assert(got.map(t => (t._1, t._3)) == expected.map(t => (t._1, t._3)),
      s"geomean keys:\n got $got\n exp $expected")
    for ((g, e) <- got.zip(expected))
      assert(approxEq(g._2, e._2), s"geomean at ${g._1}: $g vs $e")
  }

  // ====================================== engine-independent golden pins
  //
  // One pin per audit above (the r9 rule: a lockstep plan+oracle+replay
  // edit must tamper with a frozen literal to stay green). Every row
  // below was produced by the operator on 2026-08-16 AND cross-checked
  // by this spec's independent replay in the same run.

  private def pinned(name: String, expect: Seq[Seq[Any]],
                     prefix: Int = -1): Unit = {
    val all = q(name).collect().toSeq
    val rows = if (prefix >= 0) all.take(prefix) else all
    val got = rows.map(_.toSeq)
    assert(got == expect,
      s"$name golden rows drifted:\n got $got\n exp $expect")
  }

  test("golden: q_embed_pca_power sf0.001 — head loadings + eigval") {
    pinned("q_embed_pca_power", Seq(
      Seq(0L, 0.3354, 11.7611), Seq(1L, 0.0542, 11.7611),
      Seq(2L, 0.2129, 11.7611), Seq(3L, 0.1038, 11.7611)), prefix = 4)
  }

  test("golden: q_embed_silhouette sf0.001 — full 8-cell table") {
    pinned("q_embed_silhouette", Seq(
      Seq(0L, 68L, 0.0932), Seq(1L, 53L, 0.088),
      Seq(2L, 63L, 0.0792), Seq(3L, 71L, 0.0745),
      Seq(4L, 62L, 0.0966), Seq(5L, 64L, 0.0863),
      Seq(6L, 60L, 0.0944), Seq(7L, 59L, 0.0917)))
  }

  test("golden: q_sim_knn_classify sf0.001 — full accuracy table") {
    pinned("q_sim_knn_classify", Seq(
      Seq(0, 1L, 0L, 0.0), Seq(1, 4L, 1L, 0.25),
      Seq(2, 2L, 0L, 0.0), Seq(3, 3L, 1L, 0.3333),
      Seq(4, 1L, 0L, 0.0), Seq(5, 4L, 1L, 0.25),
      Seq(6, 3L, 0L, 0.0), Seq(7, 7L, 1L, 0.1429),
      Seq(9, 5L, 2L, 0.4)))
  }

  test("golden: q_text_bigram_lm sf0.001 — pinned head rows") {
    pinned("q_text_bigram_lm", Seq(
      Seq("de", "src0", 3L, 123L, 3.3651, 3.3401, 3.4021),
      Seq("de", "src1", 2L, 138L, 3.3851, 3.3649, 3.4053),
      Seq("de", "src10", 4L, 265L, 3.379, 3.3381, 3.4082),
      Seq("de", "src11", 1L, 88L, 3.4123, 3.4123, 3.4123)), prefix = 4)
  }

  test("golden: q_curate_dsir sf0.001 — pinned head rows") {
    pinned("q_curate_dsir", Seq(
      Seq("src0", 25L, -0.8706, -1.5935, -0.0617),
      Seq("src1", 25L, -0.8379, -1.6384, -0.1594),
      Seq("src10", 25L, -0.7761, -1.8327, -0.1088),
      Seq("src11", 25L, -0.7507, -1.3651, -0.0191)), prefix = 4)
  }

  test("golden: q_mix_waterfill sf0.001 — pinned head rows") {
    pinned("q_mix_waterfill", Seq(
      Seq("src0", 8364L, 3829L, 0.4578),
      Seq("src1", 7899L, 3829L, 0.4847),
      Seq("src10", 7497L, 3829L, 0.5107),
      Seq("src11", 7753L, 3829L, 0.4939),
      Seq("src12", 8127L, 3829L, 0.4711)), prefix = 5)
  }

  test("golden: q_layout_zvalue sf0.001 — pinned head rows") {
    pinned("q_layout_zvalue", Seq(
      Seq(0L, 12689L), Seq(1L, 18612L), Seq(2L, 35579L),
      Seq(3L, 27312L), Seq(4L, 44406L)), prefix = 5)
  }

  test("golden: q_events_mad sf0.001 — pinned head rows") {
    pinned("q_events_mad", Seq(
      Seq("click", 25L, 289.04, 255645L, "hi"),
      Seq("click", 88L, 253.94, 220545L, "hi"),
      Seq("click", 130L, 148.12, 114725L, "hi"),
      Seq("click", 138L, 134.38, 100985L, "hi")), prefix = 4)
  }

  test("golden: q_macro_seasonal_index sf0.001 — pinned head rows") {
    pinned("q_macro_seasonal_index", Seq(
      Seq(1995, 1, 4227319.74, 0.8277),
      Seq(1995, 2, 5787714.69, 1.1333),
      Seq(1995, 3, 6086542.25, 1.1918),
      Seq(1995, 4, 4742654.02, 0.9286)), prefix = 4)
  }

  test("golden: q_stats_kish sf0.001 — pinned head rows") {
    pinned("q_stats_kish", Seq(
      Seq("src0", 25L, 21.062, 0.8425),
      Seq("src1", 25L, 20.5798, 0.8232),
      Seq("src10", 25L, 19.4702, 0.7788),
      Seq("src11", 25L, 21.1834, 0.8473)), prefix = 4)
  }

  test("golden: q_udaf_geomean sf0.001 — full table") {
    pinned("q_udaf_geomean", Seq(
      Seq("A", 18.9732, 1962L), Seq("N", 19.4701, 2070L),
      Seq("R", 19.037, 1968L)))
  }
}
