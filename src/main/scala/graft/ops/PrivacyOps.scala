package graft.ops

import org.apache.spark.sql.functions._

import graft.Determinism._
import graft.api.Privacy
import graft.io.Tables

/** SURVEY §2.6 extension — privacy auditing before corpus release
  * (the structured-data counterpart of ScrubOps' PII redaction):
  * k-anonymity equivalence classes, l-diversity of a sensitive
  * attribute, and the generalization ladder. All three are thin
  * wrappers over the parameterized `graft.api.Privacy` so the oracle
  * gate verifies the reusable library.
  *
  * Banding determinism: acctbal goes to exact cents via
  * FLOOR(x·100 + 0.5) (identical IEEE ops both engines), is shifted
  * non-negative (+10⁷ — min cents is −99 999), and bands via TRUE
  * integral division (Determinism.ldiv; Spark truncates toward zero
  * but DuckDB floors, so only the non-negative domain is portable).
  */
object PrivacyOps extends OpGroup {

  /** Shifted, exact, non-negative account-balance cents. */
  private def shiftedCents = (floor(col("c_acctbal") * 100 + 0.5)
    .cast("long") + 10000000L)
  private val shiftedCentsSql =
    "(CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT) + 10000000)"

  def qs: Seq[Q] = Seq(
    Q(
      // k-anonymity audit, k=5, QI = (nation, segment, $1000 balance
      // band), rolled up per nation: how many equivalence classes, how
      // many are re-identifiable (< k members), how many ROWS sit in
      // them, and the risk share. One class-key hash-agg (the shuffle
      // carries one row per class, bounded by the QI domain) + a tiny
      // per-nation rollup — no windows, no self-joins, corpus-linear.
      "q_privacy_kanon",
      (s, d) => {
        val qi = Seq(col("c_nationkey"), col("c_mktsegment"),
                     ldiv(shiftedCents, lit(100000L)).as("band"))
        Privacy.kAnonAudit(Tables.customer(s, d), qi, "c_nationkey", k = 5)
          .select(col("c_nationkey"), col("n_classes"),
                  col("n_risky_classes"), col("n_risky_rows"),
                  col("n_rows"), col("min_class"),
                  intRatio4(col("n_risky_rows") * 10000, col("n_rows"))
                    .as("risk4"))
          .orderBy(col("c_nationkey"))
      },
      s"""WITH c AS (
        |  SELECT c_nationkey, c_mktsegment,
        |    $shiftedCentsSql // 100000 AS band
        |  FROM customer),
        |cls AS (
        |  SELECT c_nationkey, c_mktsegment, band, COUNT(*) AS n
        |  FROM c GROUP BY 1, 2, 3),
        |a AS (
        |  SELECT c_nationkey,
        |    COUNT(*) AS n_classes,
        |    CAST(SUM(CASE WHEN n < 5 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_risky_classes,
        |    CAST(SUM(CASE WHEN n < 5 THEN n ELSE 0 END) AS BIGINT)
        |      AS n_risky_rows,
        |    CAST(SUM(n) AS BIGINT) AS n_rows,
        |    MIN(n) AS min_class
        |  FROM cls GROUP BY c_nationkey)
        |SELECT c_nationkey, n_classes, n_risky_classes, n_risky_rows,
        |  n_rows, min_class,
        |  CAST((2 * n_risky_rows * 10000 + n_rows) // (2 * n_rows)
        |       AS DOUBLE) / 10000.0 AS risk4
        |FROM a ORDER BY c_nationkey""".stripMargin),

    Q(
      // distinct-l l-diversity of the market segment inside coarser
      // (nation, band) classes, profiled by l: a class with l = 1
      // leaks its segment to anyone who can place a customer in it
      // even when the class passes k — the attack k-anonymity alone
      // misses. Grouped distinct count (per-class domain, never
      // global), then a 5-row profile.
      "q_privacy_ldiversity",
      (s, d) => {
        val qi = Seq(col("c_nationkey"),
                     ldiv(shiftedCents, lit(100000L)).as("band"))
        Privacy.lDiversity(Tables.customer(s, d), qi, col("c_mktsegment"))
          .groupBy(col("l"))
          .agg(count(lit(1)).as("n_classes"),
               sum(col("class_size")).as("n_rows"),
               min(col("class_size")).as("min_class"),
               max(col("class_size")).as("max_class"))
          .orderBy(col("l"))
      },
      s"""WITH cls AS (
        |  SELECT c_nationkey, $shiftedCentsSql // 100000 AS band,
        |    COUNT(*) AS class_size,
        |    COUNT(DISTINCT c_mktsegment) AS l
        |  FROM customer GROUP BY 1, 2)
        |SELECT l, COUNT(*) AS n_classes,
        |  CAST(SUM(class_size) AS BIGINT) AS n_rows,
        |  MIN(class_size) AS min_class, MAX(class_size) AS max_class
        |FROM cls GROUP BY l ORDER BY l""".stripMargin),

    Q(
      // t-closeness: TVD between each (nation, band) class's segment
      // distribution and the global one — the leak l-diversity misses
      // (a class can hold all 5 segments yet be 90% BUILDING vs 20%
      // globally). Exact rational: Σ|cnt·N − g·n_c| accumulates in
      // DECIMAL(38,0) (cnt·N reaches N², past int64 at cluster SF) and
      // the scale-4 ratio emerges once through intRatio4Wide. Missing
      // segments pay their global mass via the class×domain cross join
      // (tiny, broadcast). One corpus aggregate; everything after is
      // class-domain-sized.
      "q_privacy_tcloseness",
      (s, d) => {
        Privacy.tCloseness(
            Tables.customer(s, d),
            qi = Seq(col("c_nationkey"),
                     ldiv(shiftedCents, lit(100000L)).as("band")),
            sensitive = col("c_mktsegment"))
          .orderBy(col("c_nationkey"), col("band"))
      },
      s"""WITH b AS (
        |  SELECT c_nationkey, $shiftedCentsSql // 100000 AS band,
        |    c_mktsegment AS s
        |  FROM customer),
        |cells AS (
        |  SELECT c_nationkey, band, s, COUNT(*) AS c
        |  FROM b GROUP BY 1, 2, 3),
        |csz AS (
        |  SELECT c_nationkey, band, CAST(SUM(c) AS BIGINT) AS n_c
        |  FROM cells GROUP BY 1, 2),
        |g AS (SELECT s, COUNT(*) AS gc FROM b GROUP BY s),
        |tot AS (SELECT COUNT(*) AS nn FROM b),
        |f AS (
        |  SELECT csz.c_nationkey, csz.band, csz.n_c, tot.nn, g.s,
        |    COALESCE(cells.c, 0) AS c, g.gc
        |  FROM csz CROSS JOIN g CROSS JOIN tot
        |  LEFT JOIN cells ON cells.c_nationkey = csz.c_nationkey
        |    AND cells.band = csz.band AND cells.s = g.s),
        |t AS (
        |  SELECT c_nationkey, band, n_c, nn,
        |    SUM(abs(CAST(c AS HUGEINT) * nn - CAST(gc AS HUGEINT) * n_c))
        |      AS tvd
        |  FROM f GROUP BY 1, 2, 3, 4)
        |SELECT c_nationkey, band, n_c AS class_size,
        |  CAST((2 * (tvd * 10000) + (2 * CAST(n_c AS HUGEINT) * nn))
        |       // (2 * (2 * CAST(n_c AS HUGEINT) * nn)) AS DOUBLE)
        |    / 10000.0 AS tvd4
        |FROM t ORDER BY c_nationkey, band""".stripMargin),

    Q(
      // generalization ladder: how coarse must the balance band get
      // before k=5 holds over (nation, segment, band)? One row per
      // candidate width ($500/$1000/$2000/$4000) with the class count,
      // smallest class, and rows still at risk. The corpus expands
      // |widths|× MAP-SIDE (explode before the aggregate) and shuffles
      // once on (width, class) — levels never rescan the input.
      "q_privacy_generalize",
      (s, d) => {
        Privacy.generalizeLadder(
            Tables.customer(s, d),
            staticQi = Seq(col("c_nationkey"), col("c_mktsegment")),
            units = shiftedCents,
            widths = Seq(50000L, 100000L, 200000L, 400000L), k = 5)
          .select(col("band_w"), col("n_classes"), col("min_class"),
                  col("n_risky_rows"), col("n_rows"),
                  intRatio4(col("n_risky_rows") * 10000, col("n_rows"))
                    .as("risk4"))
          .orderBy(col("band_w"))
      },
      s"""WITH w AS (SELECT * FROM (VALUES (50000), (100000), (200000),
        |    (400000)) AS t(band_w)),
        |cls AS (
        |  SELECT w.band_w, c_nationkey, c_mktsegment,
        |    $shiftedCentsSql // w.band_w AS band, COUNT(*) AS n
        |  FROM customer CROSS JOIN w GROUP BY 1, 2, 3, 4),
        |a AS (
        |  SELECT band_w, COUNT(*) AS n_classes, MIN(n) AS min_class,
        |    CAST(SUM(CASE WHEN n < 5 THEN n ELSE 0 END) AS BIGINT)
        |      AS n_risky_rows,
        |    CAST(SUM(n) AS BIGINT) AS n_rows
        |  FROM cls GROUP BY band_w)
        |SELECT CAST(band_w AS BIGINT) AS band_w, n_classes, min_class,
        |  n_risky_rows, n_rows,
        |  CAST((2 * n_risky_rows * 10000 + n_rows) // (2 * n_rows)
        |       AS DOUBLE) / 10000.0 AS risk4
        |FROM a ORDER BY band_w""".stripMargin),

    Q(
      // SUPPRESSION-COST sweep: rows lost to k-anonymous suppression
      // at k ∈ {2, 5, 10, 20} in ONE pass — the privacy-vs-utility
      // operating curve a data owner reads before picking k (the
      // q_privacy_kanon audit fixes k=5; the POLICY decision needs
      // the whole curve). Classes come from the SAME QI definition
      // (nation, segment, $1000 balance band — one definition, no
      // drift), and all four k thresholds ride the one class-size
      // aggregation as conditional sums + a constant-size stack (the
      // q_sim_threshold_sweep no-join discipline).
      // Scale shape: one class-key hash-agg bounded by the QI
      // domain; the sweep adds zero passes and zero joins.
      "q_privacy_k_sweep",
      (s, d) => {
        val cls = Privacy.classSizes(
          Tables.customer(s, d),
          Seq(col("c_nationkey"), col("c_mktsegment"),
              ldiv(shiftedCents, lit(100000L)).as("band")))
        val ks = Seq(2L, 5L, 10L, 20L)
        val aggs = ks.zipWithIndex.flatMap { case (k, i) => Seq(
          sum(when(col("class_size") < k, col("class_size"))
            .otherwise(0L)).as(s"_r$i"),
          sum(when(col("class_size") < k, 1L).otherwise(0L))
            .as(s"_c$i")) } :+
          sum(col("class_size")).as("_n")
        val stackArgs = ks.zipWithIndex
          .map { case (k, i) => s"${k}L, _r$i, _c$i" }.mkString(", ")
        cls.agg(aggs.head, aggs.tail: _*)
          .select(expr(s"stack(${ks.size}, $stackArgs) AS " +
                       "(k, suppressed_rows, suppressed_classes)"),
                  col("_n"))
          .select(col("k"), col("suppressed_rows"),
                  col("suppressed_classes"),
                  intRatio4(col("suppressed_rows") * 10000L,
                            col("_n")).as("loss4"))
          .orderBy(col("k"))
      },
      s"""WITH c AS (
        |  SELECT c_nationkey, c_mktsegment,
        |    $shiftedCentsSql // 100000 AS band
        |  FROM customer),
        |cls AS (
        |  SELECT c_nationkey, c_mktsegment, band, COUNT(*) AS n
        |  FROM c GROUP BY 1, 2, 3),
        |t AS (SELECT CAST(SUM(n) AS BIGINT) AS tot FROM cls),
        |k(k) AS (VALUES (2), (5), (10), (20))
        |SELECT CAST(k.k AS BIGINT) AS k,
        |  CAST(SUM(CASE WHEN n < k.k THEN n ELSE 0 END) AS BIGINT)
        |    AS suppressed_rows,
        |  CAST(SUM(CASE WHEN n < k.k THEN 1 ELSE 0 END) AS BIGINT)
        |    AS suppressed_classes,
        |  CAST((2 * (SUM(CASE WHEN n < k.k THEN n ELSE 0 END) * 10000)
        |        + t.tot) // (2 * t.tot) AS DOUBLE) / 10000.0 AS loss4
        |FROM k CROSS JOIN cls CROSS JOIN t
        |GROUP BY k.k, t.tot ORDER BY k""".stripMargin),

    Q(
      // Differential-privacy-style noisy release of the per-segment
      // customer counts — the Laplace mechanism (sensitivity 1, scale
      // b = 20 ⇒ ε = 1/b = 0.05 per released count) with the noise
      // draw DERANDOMIZED through the shared hash16 uniform: u =
      // (hash16(segment‖':dp') + 0.5)/65536 ∈ (0,1) strictly (the
      // +0.5 offset means u ≠ 0.5 exactly, so the inverse-CDF
      // noise −b·sign(u−½)·ln(1−2|u−½|) is always finite), making the
      // released values reproducible run-to-run and engine-to-engine —
      // the property a privacy AUDIT of the mechanism needs (a
      // production release would swap hash16 for a real RNG at this
      // one seam). Work: one hash-agg to the 5-segment grid; the noise
      // math runs on 5 rows. True n is emitted alongside for the
      // oracle gate — this query audits the mechanism, it is not
      // itself the private release.
      "q_privacy_dp_counts",
      (s, d) => {
        val g = Tables.customer(s, d)
          .groupBy(col("c_mktsegment").as("segment"))
          .agg(count(lit(1)).as("n"))
        val u = (graft.api.Pipeline.hash16(
          concat(col("segment"), lit(":dp"))).cast("double") + 0.5) /
          65536.0
        val noise = -lit(20.0) * signum(u - 0.5) *
          log(lit(1.0) - lit(2.0) * abs(u - 0.5))
        g.select(col("segment"), col("n"),
                 r4(noise).as("noise4"),
                 r4(col("n") + noise).as("noisy4"),
                 lit(0.05).as("epsilon"))
          .orderBy(col("segment"))
      },
      s"""WITH g AS (
        |  SELECT c_mktsegment AS segment, COUNT(*) AS n
        |  FROM customer GROUP BY 1),
        |u AS (
        |  SELECT segment, n,
        |    ((${u16Sql("segment || ':dp'")}) + 0.5) / 65536.0 AS u
        |  FROM g)
        |SELECT segment, n,
        |  round(-20.0 * sign(u - 0.5)
        |        * ln(1.0 - 2.0 * abs(u - 0.5)), 4) + 0 AS noise4,
        |  round(n + (-20.0 * sign(u - 0.5)
        |             * ln(1.0 - 2.0 * abs(u - 0.5))), 4) + 0 AS noisy4,
        |  CAST(0.05 AS DOUBLE) AS epsilon
        |FROM u ORDER BY segment""".stripMargin),

    Q(
      // DP clipped-sum release (the Laplace mechanism's SUM form, the
      // practice dp_counts' count form omits): each customer's
      // balance contribution is CLIPPED to [0, $5000] — bounding the
      // sensitivity is what makes the ε-accounting honest, and the
      // clipped total is released with Laplace(C/ε) noise (ε = 0.1 ⇒
      // scale $50,000), derandomized through the same hash16 inverse-
      // CDF as q_privacy_dp_counts. Clipping runs in exact cents in
      // the scan projection (map-side, no extra pass); the clipped
      // sum is an exact integer; the released value is the one
      // double. True sums ride along for the audit — the query
      // certifies the mechanism, it is not itself the release.
      "q_privacy_dp_sum",
      (s, d) => {
        val cents = (floor(col("c_acctbal") * 100 + 0.5)).cast("long")
        val clip = least(greatest(cents, lit(0L)), lit(500000L))
        val g = Tables.customer(s, d)
          .groupBy(col("c_mktsegment").as("segment"))
          .agg(count(lit(1)).as("n"), sum(clip).as("clipc"))
        val u = (graft.api.Pipeline.hash16(
          concat(col("segment"), lit(":dpsum"))).cast("double") + 0.5) /
          65536.0
        val noise = -lit(50000.0) * signum(u - 0.5) *
          log(lit(1.0) - lit(2.0) * abs(u - 0.5))
        g.select(col("segment"), col("n"),
                 (col("clipc").cast("double") / 100.0)
                   .as("clipped_sum_usd"),
                 r4(noise).as("noise4"),
                 r4(col("clipc").cast("double") / 100.0 + noise)
                   .as("noisy4"),
                 lit(0.1).as("epsilon"))
          .orderBy(col("segment"))
      },
      s"""WITH g AS (
        |  SELECT c_mktsegment AS segment, COUNT(*) AS n,
        |    SUM(LEAST(GREATEST(
        |      CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT), 0),
        |      500000)) AS clipc
        |  FROM customer GROUP BY 1),
        |u AS (
        |  SELECT segment, n, clipc,
        |    ((${u16Sql("segment || ':dpsum'")}) + 0.5) / 65536.0 AS u
        |  FROM g)
        |SELECT segment, n,
        |  CAST(clipc AS DOUBLE) / 100.0 AS clipped_sum_usd,
        |  round(-50000.0 * sign(u - 0.5)
        |        * ln(1.0 - 2.0 * abs(u - 0.5)), 4) + 0 AS noise4,
        |  round(CAST(clipc AS DOUBLE) / 100.0
        |        + (-50000.0 * sign(u - 0.5)
        |           * ln(1.0 - 2.0 * abs(u - 0.5))), 4) + 0 AS noisy4,
        |  CAST(0.1 AS DOUBLE) AS epsilon
        |FROM u ORDER BY segment""".stripMargin)
  )
}
