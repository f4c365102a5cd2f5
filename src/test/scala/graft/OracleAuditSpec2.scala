package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.io.Tables

/** MIRRORED-ORACLE AUDIT, batch 2 (round 12, VERDICT r11 #1 + #5).
  *
  * Same contract as [[OracleAuditSpec]]: every test recomputes a
  * declared query INDEPENDENTLY in plain Scala on the collected
  * sf0.001 fixture, from the textbook definition — never through the
  * Determinism/api helpers the plans use. This batch closes two
  * verdict items:
  *
  *  - the remaining frozen-constant operators (VERDICT r11 #1): the
  *    HT inclusion-probability threshold (49152/65536), the KMV
  *    set-algebra estimator ((k−1)·2³²/kth), the Merkle checksum
  *    algebra (Σ hex15(md5) mod 2⁶¹−1), the PSI log formula, the
  *    quality-gate thresholds, PMI lift, the Heaps first-occurrence
  *    curve, and the equi-depth quantile boundary rule;
  *  - the hash-gate-only families (VERDICT r11 #5): session paths,
  *    strict sequence patterns, both attribution kernels, link
  *    prediction, deterministic random walks, LPA modularity, and
  *    reciprocal-rank fusion.
  *
  * Hash replays recompute md5 via the JDK (MessageDigest), never via
  * Catalyst; integer outputs must match exactly; scale-4 doubles
  * within TOL (half a 1e-4 grid step + float headroom).
  */
class OracleAuditSpec2 extends SparkSpec {

  private val TOL = 6e-5

  private def q(name: String) = SparkEntry.queries(name)(spark, sfDir)

  // ------------------------------------------------ replay primitives

  /** Lowercase md5 hex of the UTF-8 bytes — the JDK recompute of the
    * engines' md5(), shared ONLY by tests. */
  private def md5Hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    d.map(b => f"$b%02x").mkString
  }
  private def u16(s: String): Long =
    java.lang.Long.parseLong(md5Hex(s).substring(0, 4), 16)
  private def u32(s: String): Long =
    java.lang.Long.parseLong(md5Hex(s).substring(0, 8), 16)
  private def hex15(s: String): BigInt =
    BigInt(md5Hex(s).substring(0, 15), 16)

  /** Textbook half-up division (positive den), half-away-from-zero on
    * negative numerators — the intRatio4/halfUpDivWide contract,
    * recomputed from the definition. */
  private def halfUp(num: BigInt, den: BigInt): BigInt = {
    require(den > 0)
    if (num >= 0) (num * 2 + den) / (den * 2)
    else -((-num * 2 + den) / (den * 2))
  }

  /** Exact cents of a money double (DECIMAL(18,2) half-up), via the
    * JDK — not Catalyst. */
  private def cents(v: Double): Long =
    BigDecimal(java.lang.Double.toString(v).toDouble)
      .setScale(2, BigDecimal.RoundingMode.HALF_UP)
      .*(100).toLongExact

  /** Spark's round(x, p) for doubles: decimal HALF_UP on the shortest
    * decimal representation. */
  private def roundAt(v: Double, p: Int): Double =
    BigDecimal(java.lang.Double.toString(v).toDouble)
      .setScale(p, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** The one tokenizer (Dedup.tokens / toksSql): split on ASCII
    * whitespace runs, drop empties — replayed as a plain Java regex. */
  private def toks(text: String): Array[String] =
    text.split("[ \\t\\n\\r\\f\\x0B]+").filter(_.nonEmpty)

  private def epochDayUs(y: Int, m: Int, d: Int): Long =
    java.time.LocalDate.of(y, m, d).toEpochDay * 86400000000L

  // ------------------------------------------------ fixture collections

  /** (user_id, event_id, ts_us, event_type, value_cents) */
  private lazy val evRows: Seq[(Long, Long, Long, String, Long)] =
    Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("ts_us"),
              col("event_type"), col("value"))
      .collect().toSeq.map { r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
         cents(r.getDouble(4)))
      }

  /** (doc_id, lang, source, text) */
  private lazy val docRows: Seq[(Long, String, String, String)] =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), col("source"), col("text"))
      .collect().toSeq.map { r =>
        (r.getLong(0), r.getString(1), r.getString(2), r.getString(3))
      }

  /** (o_orderkey, date_us, totalprice_double, totalprice_cents) */
  private lazy val orderRows: Seq[(Long, Long, Double, Long)] =
    Tables.orders(spark, sfDir)
      .select(col("o_orderkey"),
              expr("unix_micros(cast(o_orderdate as timestamp))"),
              col("o_totalprice"))
      .collect().toSeq.map { r =>
        (r.getLong(0), r.getLong(1), r.getDouble(2),
         cents(r.getDouble(2)))
      }

  /** (l_orderkey, l_suppkey, l_linenumber, extprice_cents, returnflag) */
  private lazy val lineRows: Seq[(Long, Long, Int, Long, String)] =
    Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_suppkey"), col("l_linenumber"),
              col("l_extendedprice"), col("l_returnflag"))
      .collect().toSeq.map { r =>
        (r.getLong(0), r.getLong(1), r.getInt(2), cents(r.getDouble(3)),
         r.getString(4))
      }

  /** (vec_id, embedding floats) — zero/null-embedding rows excluded the
    * way the cosine family excludes them. */
  private lazy val embRows: Seq[(Long, Array[Float])] =
    Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
      .collect().toSeq.flatMap { r =>
        if (r.isNullAt(1)) None
        else Some((r.getLong(0), r.getSeq[Float](1).toArray))
      }

  // ------------------------------------------------ session machinery

  /** 8h-gap sessions per user, events as (ts_us, event_id, type) in
    * (ts, id) order — the sessionize definition replayed from the
    * lag-gap rule. */
  private def sessionsOf(gapUs: Long,
                         rows: Seq[(Long, Long, Long, String, Long)])
      : Map[Long, Vector[Vector[(Long, Long, String)]]] =
    rows.groupBy(_._1).map { case (u, rs) =>
      val sorted = rs.map(r => (r._3, r._2, r._4)).sortBy(t => (t._1, t._2))
      val out = Vector.newBuilder[Vector[(Long, Long, String)]]
      var cur = Vector.newBuilder[(Long, Long, String)]
      var prev = Long.MinValue
      var open = false
      for (e <- sorted) {
        if (open && e._1 - prev > gapUs) {
          out += cur.result(); cur = Vector.newBuilder
        }
        cur += e; prev = e._1; open = true
      }
      if (open) out += cur.result()
      u -> out.result()
    }

  // =============================================== events family (#5)

  test("audit: q_events_paths — 8h sessions, first-4 path census") {
    val sess = sessionsOf(28800000000L, evRows)
    val perPath = sess.toSeq.flatMap { case (u, ss) =>
      ss.map(s => (s.take(4).map(_._3).mkString(">"), u))
    }
    val expected = perPath.groupBy(_._1).toSeq.map { case (p, rows) =>
      (p, rows.size.toLong, rows.map(_._2).distinct.size.toLong)
    }.sortBy(r => (-r._2, r._1)).take(10)
    val got = q("q_events_paths").collect().toSeq.map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got == expected, s"paths mismatch:\n got $got\n exp $expected")
  }

  test("audit: q_events_seq_pattern — strict view>click>purchase runs") {
    // sf0.001 has ZERO strict view>click>purchase runs (verified: the
    // plan and this replay both return an empty frame, which would be
    // a vacuous audit) — this one runs at sf0.01, where 23 matches
    // exercise the pattern, the session bound, and the min/max times
    val sf01 = "/root/testdata/sf0.01"
    val ev01 = Tables.events(spark, sf01)
      .select(col("user_id"), col("event_id"), col("ts_us"),
              col("event_type"), col("value"))
      .collect().toSeq.map { r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
         cents(r.getDouble(4)))
      }
    val sess = sessionsOf(28800000000L, ev01)
    val matches = sess.toSeq.flatMap { case (u, ss) =>
      ss.flatMap { s =>
        s.sliding(3).collect {
          case Seq(a, b, c)
              if a._3 == "view" && b._3 == "click" && c._3 == "purchase" =>
            (u, a._1)
        }
      }
    }
    val expected = matches.groupBy(_._1).toSeq.map { case (u, ms) =>
      (u, ms.size.toLong, ms.map(_._2).min, ms.map(_._2).max)
    }.sortBy(_._1)
    val got = SparkEntry.queries("q_events_seq_pattern")(spark, sf01)
      .collect().toSeq.map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.nonEmpty && got.map(_._2).sum == 23L,
      s"seq_pattern expected 23 matches at sf0.01, got $got")
    assert(got == expected,
      s"seq_pattern mismatch:\n got $got\n exp $expected")
  }

  test("audit: q_events_attribution — last strictly-preceding touch") {
    val credits = evRows.groupBy(_._1).toSeq.flatMap { case (_, rs) =>
      val sorted = rs.sortBy(r => (r._3, r._2))
      var last: Option[String] = None
      val out = Vector.newBuilder[(String, Long)]
      for (e <- sorted) {
        if (e._4 == "purchase") out += ((last.getOrElse("none"), e._5))
        if (e._4 == "click" || e._4 == "view") last = Some(e._4)
      }
      out.result()
    }
    val expected = credits.groupBy(_._1).toSeq.map { case (ch, cs) =>
      (ch, cs.size.toLong, cs.map(_._2).sum.toDouble / 100.0)
    }.sortBy(_._1)
    val got = q("q_events_attribution").collect().toSeq.map(r =>
      (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(got == expected,
      s"attribution mismatch:\n got $got\n exp $expected")
  }

  test("audit: q_events_attribution_linear — equal split per journey") {
    // journeys segmented by the count of strictly-preceding purchases
    case class J(var pv: Long = 0L, var nT: Long = 0L, var nP: Long = 0L,
                 chan: scala.collection.mutable.Map[String, Long] =
                   scala.collection.mutable.Map())
    val js = scala.collection.mutable.Map[(Long, Long), J]()
    for ((_, rs) <- evRows.groupBy(_._1)) {
      val sorted = rs.sortBy(r => (r._3, r._2))
      var grp = 0L
      for (e <- sorted) {
        val j = js.getOrElseUpdate((e._1, grp), J())
        e._4 match {
          case "purchase" => j.pv += e._5; j.nP += 1
          case t @ ("click" | "view") =>
            j.nT += 1; j.chan(t) = j.chan.getOrElse(t, 0L) + 1
          case _ => ()
        }
        if (e._4 == "purchase") grp += 1
      }
    }
    val agg = scala.collection.mutable.Map[String, (Long, BigInt)]()
    for (j <- js.values if j.nP > 0) {
      if (j.nT > 0) {
        val share = halfUp(BigInt(j.pv) * 100, BigInt(j.nT))
        for ((ch, c) <- j.chan) {
          val (n0, u0) = agg.getOrElse(ch, (0L, BigInt(0)))
          agg(ch) = (n0 + c, u0 + share * c)
        }
      } else {
        val (n0, u0) = agg.getOrElse("none", (0L, BigInt(0)))
        agg("none") = (n0 + j.nP, u0 + BigInt(j.pv) * 100)
      }
    }
    val expected = agg.toSeq.map { case (ch, (n, u4)) =>
      (ch, n, u4.toDouble / 10000.0)
    }.sortBy(_._1)
    val got = q("q_events_attribution_linear").collect().toSeq.map(r =>
      (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(got.map(g => (g._1, g._2)) == expected.map(e => (e._1, e._2)),
      s"attribution_linear counts mismatch:\n got $got\n exp $expected")
    got.zip(expected).foreach { case (g, e) =>
      assert(math.abs(g._3 - e._3) < 1e-9,
        s"attribution_linear credit mismatch: got $g expected $e")
    }
  }

  // =============================================== graph family (#5)

  /** The shared co-supply graph replayed from its definition: suppliers
    * linked iff they co-appear in an order of the 1997-01-01 week. */
  private lazy val coEdges: Set[(Long, Long)] = {
    val lo = epochDayUs(1997, 1, 1); val hi = epochDayUs(1997, 1, 8)
    val wk = orderRows.filter(o => o._2 >= lo && o._2 < hi).map(_._1).toSet
    val ls = lineRows.filter(l => wk(l._1)).map(l => (l._1, l._2)).distinct
    ls.groupBy(_._1).values.flatMap { g =>
      val ss = g.map(_._2).distinct
      for (a <- ss; b <- ss if a != b) yield (a, b)
    }.toSet
  }
  private lazy val adjOf: Map[Long, Vector[Long]] =
    coEdges.groupBy(_._1).map { case (s, es) =>
      s -> es.map(_._2).toVector.sorted
    }
  private lazy val degOf: Map[Long, Long] = adjOf.map { case (s, a) =>
    s -> a.size.toLong
  }

  test("audit: q_graph_linkpred — common-neighbour Jaccard on non-edges") {
    val cn = scala.collection.mutable.Map[(Long, Long), Long]()
    for ((a, m) <- coEdges; b <- adjOf(m) if a < b)
      cn((a, b)) = cn.getOrElse((a, b), 0L) + 1
    val expected = cn.toSeq
      .filterNot { case ((a, b), _) => coEdges((a, b)) }
      .map { case ((a, b), c) =>
        val da = degOf(a); val db = degOf(b)
        (a, b, c, da, db,
         halfUp(BigInt(c) * 10000, BigInt(da + db - c)).toDouble / 10000.0,
         da * db)
      }
      .sortBy(r => (-r._3, r._1, r._2)).take(30)
    val got = q("q_graph_linkpred").collect().toSeq.map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
       r.getLong(4), r.getDouble(5), r.getLong(6)))
    assert(got == expected,
      s"linkpred mismatch:\n got $got\n exp $expected")
  }

  test("audit: q_graph_random_walk — md5-indexed 3-hop walks") {
    val expected = adjOf.keys.toSeq.sorted.map { start =>
      var v = start
      val sb = new StringBuilder(start.toString)
      for (t <- 1 to 3) {
        val idx = (u16(s"w:$start:$t") % degOf(v)).toInt
        v = adjOf(v)(idx)
        sb.append("->").append(v)
      }
      (start, sb.toString)
    }
    val got = q("q_graph_random_walk").collect().toSeq.map(r =>
      (r.getLong(0), r.getString(1)))
    assert(got == expected,
      s"random_walk mismatch:\n got ${got.take(5)}…\n exp ${expected.take(5)}…")
  }

  test("audit: q_graph_modularity — Newman Q over 2-round LPA labels") {
    // deterministic LPA: adopt the most frequent neighbour label,
    // ties to the smallest label; nodes keep labels with no votes
    var lab: Map[Long, Long] =
      (coEdges.map(_._1) ++ coEdges.map(_._2)).map(n => n -> n).toMap
    for (_ <- 1 to 2) {
      val votes = coEdges.toSeq.groupBy(_._1).map { case (s, es) =>
        val counted = es.map(e => lab(e._2))
          .groupBy(identity).map { case (l, ls) => (l, ls.size) }
        s -> counted.toSeq.minBy { case (l, c) => (-c, l) }._1
      }
      lab = lab.map { case (n, l) => n -> votes.getOrElse(n, l) }
    }
    val within = coEdges.toSeq.filter(e => lab(e._1) == lab(e._2))
      .groupBy(e => lab(e._1)).map { case (l, es) => l -> es.size.toLong }
    val degC = degOf.toSeq.groupBy { case (n, _) => lab(n) }
      .map { case (l, ds) => l -> ds.map(_._2).sum }
    val m2 = coEdges.size.toLong
    val sw = degC.keys.map(l => within.getOrElse(l, 0L)).sum
    val sd2 = degC.values.map(d => BigInt(d) * d).sum
    val qv = (BigInt(m2) * sw - sd2).toDouble / (m2.toDouble * m2)
    val got = q("q_graph_modularity").collect().head
    assert(got.getLong(0) == degC.size.toLong &&
           got.getLong(1) == m2 / 2 &&
           math.abs(got.getDouble(2) - qv) < TOL,
      s"modularity mismatch: got $got expected " +
        s"(${degC.size}, ${m2 / 2}, $qv)")
  }

  test("audit: q_graph_clustering_coeff — 2·tri/(d(d−1)) from raw wedges") {
    // independent triangle count: for each node, neighbours from the
    // symmetric edge set; tri(v) = |{(a,b) ⊂ N(v) : a<b, (a,b)∈E}|
    val tri = adjOf.map { case (v, nb) =>
      v -> (for {
        i <- nb.indices; j <- (i + 1) until nb.size
        if coEdges((nb(i), nb(j)))
      } yield 1).size.toLong
    }
    val expected = degOf.toSeq.filter(_._2 >= 2).map { case (v, d) =>
      val t = tri.getOrElse(v, 0L)
      (v, d, t,
       halfUp(BigInt(t) * 20000, BigInt(d) * (d - 1)).toDouble / 10000.0)
    }.sortBy(_._1)
    val got = q("q_graph_clustering_coeff").collect().toSeq.map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got == expected,
      s"clustering_coeff mismatch:\n got $got\n exp $expected")
    // the frozen 20000 IS the textbook 2 in 2T/(d(d−1)), on the 1e-4
    // grid: a node of a complete neighbourhood must score exactly 1
    assert(expected.forall(_._4 <= 1.0))
  }

  // =============================================== retrieval fusion (#5)

  test("audit: q_sim_rrf_fusion — BM25 + cosine lists fused on ⌊10⁶/(60+r)⌋") {
    // lexical: BM25(k1=1.2, b=0.75) for {spark, query}, idf from the
    // textbook ln(1 + (N − df + .5)/(df + .5)); single-space tokens
    val terms = Set("spark", "query")
    val docs = docRows.map(d => (d._1, d._4.split(" ", -1)))
    val n = docs.size
    val sumDl = docs.map(_._2.length.toLong).sum
    val avgdl = sumDl.toDouble / n
    val tf = docs.flatMap { case (id, w) =>
      w.filter(terms).groupBy(identity).map { case (t, ts) =>
        ((id, t), (w.length, ts.length))
      }
    }.toMap
    val dfreq = tf.keys.toSeq.groupBy(_._2).map { case (t, ks) =>
      t -> ks.size
    }
    val scores = tf.toSeq.groupBy(_._1._1).map { case (id, parts) =>
      val s = parts.map { case ((_, t), (dl, f)) =>
        val idf = math.log(1.0 + (n - dfreq(t) + 0.5) / (dfreq(t) + 0.5))
        idf * (f * (1.2 + 1.0)) /
          (f + 1.2 * ((1.0 - 0.75) + 0.75 * dl / avgdl))
      }.sum
      id -> roundAt(s, 4)
    }
    val lex = scores.toSeq.sortBy { case (id, s) => (-s, id) }.take(20)
      .zipWithIndex.map { case ((id, _), i) => id -> (i + 1) }.toMap

    // semantic: query vec 0 vs all, cosine on sequential f32→f64 dot,
    // ranked on the half-up 1e-4 grid like the heap does
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      val m = math.min(a.length, b.length)
      while (i < m) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      s
    }
    val withN = embRows.map { case (id, e) =>
      (id, e, math.sqrt(dot(e, e)))
    }.filter(_._3 > 0)
    val qv = withN.find(_._1 == 0L).get
    val scored = withN.filter(_._1 != 0L).map { case (id, e, nm) =>
      val c = roundAt(dot(qv._2, e) / (qv._3 * nm), 4)
      (id, math.round(c * 10000))
    }
    val sem = scored.sortBy { case (id, o) => (-o, id) }.take(20)
      .zipWithIndex.map { case ((id, _), i) => id -> (i + 1) }.toMap

    val fused = (lex.toSeq.map { case (id, r) =>
      (id, 1000000L / (60 + r))
    } ++ sem.toSeq.map { case (id, r) => (id, 1000000L / (60 + r)) })
      .groupBy(_._1).map { case (id, cs) => (id, cs.map(_._2).sum) }
      .toSeq.sortBy { case (id, s) => (-s, id) }.take(10)
    val expected = fused.map { case (id, s) =>
      (id, s, lex.getOrElse(id, 0).toLong, sem.getOrElse(id, 0).toLong)
    }
    val got = q("q_sim_rrf_fusion").collect().toSeq.map(r =>
      (r.getLong(0), r.getLong(1), r.getInt(2).toLong, r.getInt(3).toLong))
    assert(got == expected,
      s"rrf_fusion mismatch:\n got $got\n exp $expected")
  }

  // =============================================== frozen constants (#1)

  test("audit: q_distinct_kmv_setops — merged k-min sets and (k−1)·2³²/kth") {
    // at sf0.001 every type has < 64 distinct users, so the estimator
    // would stay on the trivial n<k branch — this one audit runs on
    // sf0.01 (150 users/type) so the frozen 2³² scale constant and the
    // (k−1)/kth formula are actually exercised
    val sf01 = "/root/testdata/sf0.01"
    val K = 64
    val ev01 = Tables.events(spark, sf01)
      .select(col("event_type"), col("user_id"))
      .collect().toSeq.map(r => (r.getString(0), r.getLong(1)))
    val hv = ev01.map(r => (r._1, u32(r._2.toString))).distinct
    val byT = hv.groupBy(_._1).map { case (t, rs) =>
      t -> rs.map(_._2).distinct.sorted
    }
    def sk(t: String) = byT(t).take(K)
    def est(nS: Int, kth: Long): Double =
      if (nS < K) nS.toDouble
      else roundAt((K - 1).toDouble / (kth.toDouble / 4294967296.0), 4)
    val types = byT.keys.toSeq.sorted
    val expected = for {
      ta <- types; tb <- types if ta < tb
    } yield {
      val a = sk(ta); val b = sk(tb)
      val merged = (a ++ b).distinct.sorted.take(K)
      val exact = (byT(ta).toSet & byT(tb).toSet).size.toLong
      val ea = est(a.size, a.last); val eb = est(b.size, b.last)
      val eu = est(merged.size, merged.last)
      (ta, tb, exact, ea, eb, eu, roundAt(ea + eb - eu, 4))
    }
    val got = SparkEntry.queries("q_distinct_kmv_setops")(spark, sf01)
      .collect().toSeq.map(r =>
      (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3),
       r.getDouble(4), r.getDouble(5), r.getDouble(6)))
    assert(got.size == expected.size && got.nonEmpty)
    got.zip(expected).foreach { case (g, e) =>
      assert(g._1 == e._1 && g._2 == e._2 && g._3 == e._3 &&
             math.abs(g._4 - e._4) < TOL && math.abs(g._5 - e._5) < TOL &&
             math.abs(g._6 - e._6) < TOL && math.abs(g._7 - e._7) < TOL,
        s"kmv_setops mismatch: got $g expected $e")
    }
  }

  test("audit: q_sample_ht_estimate — π = thr/65536 inverse-probability blow-up") {
    val perDoc = docRows.map { d =>
      val nBpe = d._4.split(" ", -1)
        .map(w => math.ceil(w.length / 4.0).toLong).sum
      (d._2, d._1, nBpe)
    }
    val thrOf = (lang: String) => if (lang == "en") 16384L else 49152L
    val expected = perDoc.groupBy(_._1).toSeq.map { case (lang, ds) =>
      val actual = ds.map(_._3).sum
      val kept = ds.filter(d => u16(d._2.toString) < thrOf(lang))
      val ks = kept.map(_._3).sum
      val est =
        if (kept.isEmpty) 0L
        else halfUp(BigInt(ks) * 65536, BigInt(thrOf(lang))).toLong
      (lang, actual, kept.size.toLong, est,
       halfUp(BigInt(math.abs(est - actual)) * 10000,
              BigInt(actual)).toDouble / 10000.0)
    }.sortBy(_._1)
    val got = q("q_sample_ht_estimate").collect().toSeq.map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
       r.getDouble(4)))
    assert(got == expected,
      s"ht_estimate mismatch:\n got $got\n exp $expected")
  }

  test("audit: q_sample_stratified — 16384/49152 keep thresholds") {
    val expected = docRows.groupBy(_._2).toSeq.map { case (lang, ds) =>
      val thr = if (lang == "en") 16384L else 49152L
      val kept = ds.count(d => u16(d._1.toString) < thr).toLong
      (lang, ds.size.toLong, kept,
       roundAt(kept.toDouble / ds.size, 4))
    }.sortBy(_._1)
    val got = q("q_sample_stratified").collect().toSeq.map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.size == expected.size && got.nonEmpty)
    got.zip(expected).foreach { case (g, e) =>
      assert(g._1 == e._1 && g._2 == e._2 && g._3 == e._3 &&
             math.abs(g._4 - e._4) < TOL,
        s"stratified mismatch: got $g expected $e")
    }
  }

  /** The checksum algebra replayed once, shared by the two Merkle
    * tests: Σ hex15(md5(row)) mod 2⁶¹−1 per group. */
  private def checksum(rows: Seq[(Any, String)]): Map[Any, (Long, Long)] = {
    val MOD = BigInt(2305843009213693951L)
    rows.groupBy(_._1).map { case (g, rs) =>
      g -> (rs.size.toLong,
            (rs.map(r => hex15(r._2)).sum mod MOD).toLong)
    }
  }

  test("audit: q_etl_table_checksum — Σ hex15(md5) mod 2⁶¹−1 per flag") {
    val expected = checksum(lineRows.map { l =>
      (l._5: Any, s"${l._1}|${l._3}|${l._4}|${l._5}")
    }).toSeq.map { case (g, (n, ck)) => (g.asInstanceOf[String], n, ck) }
      .sortBy(_._1)
    val got = q("q_etl_table_checksum").collect().toSeq.map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got == expected,
      s"table_checksum mismatch:\n got $got\n exp $expected")
  }

  test("audit: q_etl_anti_entropy — corrupted blocks surface, clean ones don't") {
    val a = checksum(orderRows.map { o =>
      ((o._1 / 512): Any, s"${o._1}|${o._4}")
    })
    val b = checksum(orderRows.map { o =>
      val c = if (o._1 % 1009 == 0) cents(o._3 * 2) else o._4
      ((o._1 / 512): Any, s"${o._1}|$c")
    })
    val expected = (a.keySet ++ b.keySet).toSeq
      .filter(k => a.get(k).map(_._2) != b.get(k).map(_._2))
      .map { k =>
        (k.asInstanceOf[Long], a(k)._1, b(k)._1)
      }.sortBy(_._1)
    val got = q("q_etl_anti_entropy").collect().toSeq.map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got == expected,
      s"anti_entropy mismatch:\n got $got\n exp $expected")
    // and the corruption model itself: every differing block contains
    // a multiple of 1009; blocks without one never differ
    assert(expected.forall { case (blk, _, _) =>
      orderRows.exists(o => o._1 / 512 == blk && o._1 % 1009 == 0)
    })
  }

  test("audit: q_etl_drift_psi — add-one smoothed (pc−pr)·ln(pc/pr)") {
    val cut = epochDayUs(1998, 1, 1)
    val byB = orderRows.groupBy(o => math.floor(o._3 / 25000.0).toInt)
    val buckets = byB.keys.toSeq.sorted
    val nRef = byB.map { case (b, os) => b -> os.count(_._2 < cut).toLong }
    val nCur = byB.map { case (b, os) => b -> os.count(_._2 >= cut).toLong }
    val sumR = nRef.values.sum.toDouble + buckets.size
    val sumC = nCur.values.sum.toDouble + buckets.size
    val terms = buckets.map { b =>
      val pr = (nRef(b) + 1) / sumR; val pc = (nCur(b) + 1) / sumC
      b -> roundAt((pc - pr) * math.log(pc / pr), 6)
    }.toMap
    val psi = roundAt(terms.values.sum, 4)
    val got = q("q_etl_drift_psi").collect().toSeq
    assert(got.map(_.getInt(0)) == buckets)
    got.foreach { r =>
      val b = r.getInt(0)
      assert(r.getLong(1) == nRef(b) && r.getLong(2) == nCur(b),
        s"psi counts mismatch at bucket $b: $r")
      assert(math.abs(r.getDouble(3) - terms(b)) < 2e-6,
        s"psi term mismatch at bucket $b: got ${r.getDouble(3)} " +
          s"expected ${terms(b)}")
      assert(math.abs(r.getDouble(4) - psi) < TOL,
        s"psi total mismatch: got ${r.getDouble(4)} expected $psi")
    }
  }

  test("audit: q_text_quality_gate — the four Gopher rules from raw text") {
    val perDoc = docRows.map { d =>
      val w = toks(d._4)
      val nW = w.length.toLong
      val meanWl = w.map(_.length.toLong).sum.toDouble / nW
      val stopFrac = w.count(t => t == "the" || t == "a").toDouble / nW
      val dup2 =
        if (nW >= 2)
          1.0 - w.sliding(2).map(_.mkString(" ")).toSet.size.toDouble /
            (nW - 1)
        else 0.0
      val pLen = nW >= 20 && nW <= 90
      val pWl = meanWl >= 4.0 && meanWl <= 5.0
      val pStop = stopFrac >= 0.01
      val pRep = dup2 <= 0.06
      (d._3, pLen, pWl, pStop, pRep, pLen && pWl && pStop && pRep)
    }
    val expected = perDoc.groupBy(_._1).toSeq.map { case (src, ds) =>
      (src, ds.size.toLong, ds.count(_._6).toLong,
       ds.count(!_._2).toLong, ds.count(!_._3).toLong,
       ds.count(!_._4).toLong, ds.count(!_._5).toLong)
    }.sortBy(_._1)
    val got = q("q_text_quality_gate").collect().toSeq.map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
       r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(got == expected,
      s"quality_gate mismatch:\n got $got\n exp $expected")
    // non-vacuous: every rule fails somewhere and passes somewhere
    assert(perDoc.exists(_._6) && (2 to 5).forall(i =>
      perDoc.exists(d => !d.productElement(i).asInstanceOf[Boolean])))
  }

  test("audit: q_text_collocations — skip-bigram lift on the exact grid") {
    val posToks = docRows.map(d => (d._1, toks(d._4)))
    val nTot = posToks.map(_._2.length.toLong).sum
    val uni = scala.collection.mutable.Map[String, Long]()
    for ((_, w) <- posToks; t <- w) uni(t) = uni.getOrElse(t, 0L) + 1
    val pair = scala.collection.mutable.Map[(String, String), Long]()
    for ((_, w) <- posToks; off <- Seq(1, 2); i <- 0 until w.length - off)
      pair((w(i), w(i + off))) =
        pair.getOrElse((w(i), w(i + off)), 0L) + 1
    val expected = pair.toSeq.filter(_._2 >= 5).map { case ((a, b), c) =>
      val lift = halfUp(BigInt(c) * nTot * 10000,
                        BigInt(uni(a)) * uni(b))
      (a, b, c, uni(a), uni(b), lift)
    }.sortBy(r => (-r._6, r._1, r._2)).take(30)
      .map(r => (r._1, r._2, r._3, r._4, r._5, r._6.toDouble / 10000.0))
    val got = q("q_text_collocations").collect().toSeq.map(r =>
      (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
       r.getLong(4), r.getDouble(5)))
    assert(got == expected,
      s"collocations mismatch:\n got $got\n exp $expected")
  }

  test("audit: q_text_heaps — vocabulary growth from first-occurrence docs") {
    val firstDoc = scala.collection.mutable.Map[String, Long]()
    for ((id, _, _, text) <- docRows.sortBy(_._1)) {
      val w = toks(text)
      if (w.length >= 3)
        for (i <- 0 to w.length - 3) {
          val g = s"${w(i)} ${w(i + 1)} ${w(i + 2)}"
          if (!firstDoc.contains(g)) firstDoc(g) = id
        }
    }
    val expected = Seq(25L, 50L, 100L, 200L, 400L, 800L, 1600L).map { k =>
      (k, firstDoc.values.count(_ <= k).toLong)
    }
    val got = q("q_text_heaps").collect().toSeq.map(r =>
      (r.getLong(0), r.getLong(1)))
    assert(got == expected, s"heaps mismatch:\n got $got\n exp $expected")
    // the curve must be non-decreasing and non-vacuous
    assert(expected.sliding(2).forall(p => p(0)._2 <= p(1)._2) &&
           expected.last._2 > expected.head._2)
  }

  test("audit: q_agg_histogram_eqdepth — prefix-quantile boundary rule") {
    val vs = lineRows.map(_._4).sorted
    val tot = vs.size.toLong
    val cum = scala.collection.mutable.LinkedHashMap[Long, Long]()
    var c = 0L
    for (v <- vs) { c += 1; cum(v) = c } // last write = cum through v
    val bounds = (1 to 7).map { i =>
      cum.collectFirst { case (v, cc) if cc * 8 >= tot * i => v }.get
    }
    val expected = vs.groupBy(v => bounds.count(v > _)).toSeq.map {
      case (b, g) => (b, g.size.toLong, g.min, g.max)
    }.sortBy(_._1)
    val got = q("q_agg_histogram_eqdepth").collect().toSeq.map(r =>
      (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got == expected,
      s"eqdepth mismatch:\n got $got\n exp $expected")
    // equal-depth sanity: no bucket more than 2× the ideal depth
    assert(expected.forall(_._2 <= 2 * (tot / 8 + 1)))
  }

  // ====================================== engine-independent golden pins
  //
  // One pin per audit above (the r9 rule: a lockstep plan+oracle+replay
  // edit must tamper with a frozen literal to stay green). Every row
  // below was produced by the operator on 2026-08-16 AND cross-checked
  // by this spec's independent replay in the same run. seq_pattern and
  // kmv_setops pin sf0.01 rows — the SF where their audits are
  // non-vacuous (see the audit comments).

  private def pinned(name: String, expect: Seq[Seq[Any]],
                     keep: Row => Boolean = _ => true,
                     dir: String = sfDir, prefix: Int = -1): Unit = {
    val all = SparkEntry.queries(name)(spark, dir).collect().toSeq
    val rows = if (prefix >= 0) all.take(prefix) else all
    val got = rows.filter(keep).map(_.toSeq)
    assert(got == expect,
      s"$name golden rows drifted:\n got $got\n exp $expect")
  }

  test("golden: q_events_paths sf0.001 — full top-10 table") {
    pinned("q_events_paths", Seq(
      Seq("click", 47L, 15L), Seq("signup", 47L, 13L),
      Seq("error", 46L, 15L), Seq("purchase", 44L, 15L),
      Seq("view", 43L, 14L), Seq("click>purchase", 10L, 9L),
      Seq("error>click", 9L, 6L), Seq("view>error", 9L, 7L),
      Seq("click>click", 7L, 6L), Seq("purchase>error", 7L, 7L)))
  }

  test("golden: q_events_seq_pattern sf0.01 — pinned first users") {
    pinned("q_events_seq_pattern", Seq(
      Seq(9L, 1L, 1706210124286478L, 1706210124286478L),
      Seq(10L, 2L, 1704761442819213L, 1705077592201489L),
      Seq(11L, 2L, 1704562725807442L, 1705863389315959L),
      Seq(145L, 1L, 1704362986016639L, 1704362986016639L)),
      keep = r => Set(9L, 10L, 11L, 145L)(r.getLong(0)),
      dir = "/root/testdata/sf0.01")
  }

  test("golden: q_events_attribution sf0.001 — full channel table") {
    pinned("q_events_attribution", Seq(
      Seq("click", 99L, 5277.22), Seq("none", 11L, 461.51),
      Seq("view", 92L, 4685.96)))
  }

  test("golden: q_events_attribution_linear sf0.001 — full table") {
    pinned("q_events_attribution_linear", Seq(
      Seq("click", 194L, 3401.4694), Seq("none", 70L, 3840.8),
      Seq("view", 178L, 3182.4191)))
  }

  test("golden: q_graph_linkpred sf0.001 — pinned head rows") {
    pinned("q_graph_linkpred", Seq(
      Seq(0L, 1L, 2L, 3L, 2L, 0.6667, 6L),
      Seq(1L, 8L, 2L, 2L, 7L, 0.2857, 14L),
      Seq(0L, 2L, 1L, 3L, 4L, 0.1667, 12L)), prefix = 3)
  }

  test("golden: q_graph_random_walk sf0.001 — full walk table") {
    pinned("q_graph_random_walk", Seq(
      Seq(0L, "0->8->4->0"), Seq(1L, "1->4->7->4"),
      Seq(2L, "2->6->3->8"), Seq(3L, "3->9->6->3"),
      Seq(4L, "4->1->4->1"), Seq(6L, "6->2->6->8"),
      Seq(7L, "7->1->7->8"), Seq(8L, "8->0->7->1"),
      Seq(9L, "9->2->3->8")))
  }

  test("golden: q_graph_clustering_coeff sf0.001 — full LCC table") {
    pinned("q_graph_clustering_coeff", Seq(
      Seq(0L, 3L, 3L, 1.0), Seq(1L, 2L, 1L, 1.0),
      Seq(2L, 4L, 6L, 1.0), Seq(3L, 4L, 6L, 1.0),
      Seq(4L, 4L, 4L, 0.6667), Seq(6L, 4L, 6L, 1.0),
      Seq(7L, 4L, 4L, 0.6667), Seq(8L, 7L, 9L, 0.4286),
      Seq(9L, 4L, 6L, 1.0)))
  }

  test("golden: q_graph_modularity sf0.001 — pinned Q") {
    pinned("q_graph_modularity", Seq(Seq(2L, 18L, 0.2948)))
  }

  test("golden: q_sim_rrf_fusion sf0.001 — full fused top-10") {
    pinned("q_sim_rrf_fusion", Seq(
      Seq(59L, 28218L, 8, 14), Seq(17L, 16393L, 0, 1),
      Seq(340L, 16393L, 1, 0), Seq(225L, 16129L, 0, 2),
      Seq(313L, 16129L, 2, 0), Seq(12L, 15873L, 0, 3),
      Seq(151L, 15873L, 3, 0), Seq(466L, 15625L, 4, 0),
      Seq(483L, 15625L, 0, 4), Seq(260L, 15384L, 0, 5)))
  }

  test("golden: q_distinct_kmv_setops sf0.01 — full pair table") {
    val types = Seq("click", "error", "purchase", "signup", "view")
    val expect = for {
      i <- types.indices; j <- (i + 1) until types.size
    } yield Seq[Any](types(i), types(j), 150L,
                     144.9243, 144.9243, 144.9243, 144.9243)
    pinned("q_distinct_kmv_setops", expect,
           dir = "/root/testdata/sf0.01")
  }

  test("golden: q_sample_ht_estimate sf0.001 — full lang table") {
    pinned("q_sample_ht_estimate", Seq(
      Seq("de", 6069L, 52L, 6125L, 0.0092),
      Seq("en", 15502L, 55L, 19316L, 0.246),
      Seq("es", 6779L, 54L, 5992L, 0.1161),
      Seq("fr", 7395L, 58L, 6928L, 0.0632),
      Seq("zh", 6153L, 60L, 6672L, 0.0843)))
  }

  test("golden: q_sample_stratified sf0.001 — full lang table") {
    pinned("q_sample_stratified", Seq(
      Seq("de", 71L, 52L, 0.7324), Seq("en", 193L, 55L, 0.285),
      Seq("es", 80L, 54L, 0.675), Seq("fr", 82L, 58L, 0.7073),
      Seq("zh", 74L, 60L, 0.8108)))
  }

  test("golden: q_etl_table_checksum sf0.001 — full digest table") {
    pinned("q_etl_table_checksum", Seq(
      Seq("A", 1962L, 1194695944554832697L),
      Seq("N", 2070L, 993246307283465681L),
      Seq("R", 1968L, 2061590796721400925L)))
  }

  test("golden: q_etl_anti_entropy sf0.001 — full diff worklist") {
    pinned("q_etl_anti_entropy",
           Seq(Seq(0L, 512L, 512L), Seq(1L, 512L, 512L)))
  }

  test("golden: q_etl_drift_psi sf0.001 — pinned buckets and total") {
    pinned("q_etl_drift_psi", Seq(
      Seq(0, 35L, 38L, 5.38e-4, 0.0312),
      Seq(1, 36L, 51L, 0.001383, 0.0312),
      Seq(19, 34L, 39L, 1.29e-4, 0.0312)),
      keep = r => Set(0, 1, 19)(r.getInt(0)))
  }

  test("golden: q_text_quality_gate sf0.001 — pinned sources") {
    pinned("q_text_quality_gate", Seq(
      Seq("src0", 25L, 19L, 4L, 1L, 2L, 0L),
      Seq("src1", 25L, 17L, 6L, 0L, 0L, 4L),
      Seq("src9", 25L, 18L, 6L, 0L, 1L, 1L)),
      keep = r => Set("src0", "src1", "src9")(r.getString(0)))
  }

  test("golden: q_text_collocations sf0.001 — pinned head rows") {
    pinned("q_text_collocations", Seq(
      Seq("dup", "dup", 5L, 29L, 29L, 166.1058),
      Seq("agg", "dup", 7L, 953L, 29L, 7.0765),
      Seq("window", "dup", 7L, 976L, 29L, 6.9097),
      Seq("table", "dup", 5L, 903L, 29L, 5.3345)), prefix = 4)
  }

  test("golden: q_text_heaps sf0.001 — full growth curve") {
    pinned("q_text_heaps", Seq(
      Seq(25L, 1298L), Seq(50L, 2523L), Seq(100L, 4676L),
      Seq(200L, 8464L), Seq(400L, 14549L), Seq(800L, 16506L),
      Seq(1600L, 16506L)))
  }

  test("golden: q_agg_histogram_eqdepth sf0.001 — full bucket table") {
    pinned("q_agg_histogram_eqdepth", Seq(
      Seq(0, 750L, 91444L, 1360660L), Seq(1, 750L, 1362206L, 2664823L),
      Seq(2, 750L, 2666325L, 3974555L), Seq(3, 750L, 3977257L, 5273875L),
      Seq(4, 750L, 5275848L, 6602550L), Seq(5, 750L, 6603503L, 7983759L),
      Seq(6, 750L, 7984731L, 9155798L), Seq(7, 750L, 9158749L, 10499818L)))
  }
}
