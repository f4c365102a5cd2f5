package graft

import org.scalatest.funsuite.AnyFunSuite

/** Independent verification of the FROZEN statistical constants the
  * declared stats queries carry as literals (ADVICE r4: the DuckDB
  * oracles mirror the same literals, so the oracle gate proves
  * cross-engine determinism but could not catch a wrong frozen value —
  * both sides would agree on the same mistake). Here each constant is
  * RE-DERIVED numerically from first principles (erf-based normal CDF,
  * quantiles by bisection, the studentized-range integral, brute-force
  * permutation enumeration) — no copied table, no shared formula tree
  * with the implementations. */
class StatsConstantsSpec extends AnyFunSuite {

  /** Φ(z) via the error function (JDK has no erf; Abramowitz–Stegun
    * 7.1.26, |ε| ≤ 1.5e-7 — orders below the 1e-3 tolerances here). */
  private def phi(z: Double): Double = {
    val x = z / math.sqrt(2.0)
    val t = 1.0 / (1.0 + 0.3275911 * math.abs(x))
    val y = 1.0 - (((((1.061405429 * t - 1.453152027) * t) + 1.421413741)
      * t - 0.284496736) * t + 0.254829592) * t * math.exp(-x * x)
    val erf = if (x >= 0) y else -y
    0.5 * (1.0 + erf)
  }

  private def invPhi(p: Double): Double = {
    var lo = -10.0; var hi = 10.0
    for (_ <- 0 until 200) {
      val m = (lo + hi) / 2
      if (phi(m) < p) lo = m else hi = m
    }
    (lo + hi) / 2
  }

  test("power planner's 7.849 == (z_{0.975} + z_{0.80})^2 re-derived") {
    // q_stats_power freezes (1.960 + 0.842)^2 = 7.849 for 95% conf /
    // 80% power; derive both quantiles from the CDF instead
    val z1 = invPhi(0.975)
    val z2 = invPhi(0.80)
    assert(math.abs(z1 - 1.95996) < 1e-3, s"z_0.975 = $z1")
    assert(math.abs(z2 - 0.84162) < 1e-3, s"z_0.80 = $z2")
    val zsum2 = (z1 + z2) * (z1 + z2)
    assert(math.abs(zsum2 - 7.849) < 2e-3,
      s"(z1+z2)^2 = $zsum2, frozen literal is 7.849")
  }

  test("Tukey HSD's q(k=5, df=inf, alpha=0.10) = 3.478 re-derived") {
    // at df=∞ the studentized range reduces to the range of k iid
    // N(0,1): P(R ≤ q) = k ∫ φ(z) [Φ(z) − Φ(z−q)]^{k−1} dz — evaluate
    // the integral numerically and check the frozen 3.478 sits at the
    // 0.90 quantile
    def pRange(q: Double, k: Int): Double = {
      val step = 0.001
      var z = -10.0
      var s = 0.0
      while (z < 10.0) {
        val dens = math.exp(-z * z / 2) / math.sqrt(2 * math.Pi)
        s += dens * math.pow(phi(z) - phi(z - q), k - 1) * step
        z += step
      }
      k * s
    }
    val p = pRange(3.478, 5)
    assert(math.abs(p - 0.90) < 1e-3,
      s"P(range_5 <= 3.478) = $p, expected 0.90")
    // and it is the quantile, not merely near it: ±1% in q moves p
    assert(pRange(3.43, 5) < 0.8975 && pRange(3.53, 5) > 0.9025)
  }

  test("Mann-Kendall null variance n(n-1)(2n+5)/18 == brute force") {
    // enumerate ALL 720 orderings of 6 distinct values, compute S for
    // each, and match the exact permutation-null variance against the
    // closed form the query freezes (no-ties case)
    val n = 6
    val perms = (0 until n).permutations.toSeq
    val ss = perms.map { p =>
      var s = 0
      for (i <- 0 until n; j <- i + 1 until n)
        s += (if (p(j) > p(i)) 1 else -1)
      s.toDouble
    }
    val mean = ss.sum / ss.size
    val varS = ss.map(x => (x - mean) * (x - mean)).sum / ss.size
    val formula = n * (n - 1) * (2 * n + 5) / 18.0
    assert(math.abs(mean) < 1e-12, s"E[S] = $mean, expected 0")
    assert(math.abs(varS - formula) < 1e-9,
      s"Var(S) brute force $varS vs formula $formula")
  }

  test("tie-corrected MK variance matches brute force with ties") {
    // 6 values with one tied pair and one tied triple: subtract
    // Σ t(t−1)(2t+5)/18 — enumerate multiset permutations exactly
    val vals = Seq(0, 0, 1, 2, 2, 2)
    val perms = vals.permutations.toSeq
    val ss = perms.map { p =>
      var s = 0
      for (i <- 0 until p.size; j <- i + 1 until p.size)
        s += (if (p(j) > p(i)) 1 else if (p(j) < p(i)) -1 else 0)
      s.toDouble
    }
    val mean = ss.sum / ss.size
    val varS = ss.map(x => (x - mean) * (x - mean)).sum / ss.size
    val n = 6
    val base = n * (n - 1) * (2 * n + 5) / 18.0
    val tieTerm = Seq(2, 3).map(t => t * (t - 1) * (2 * t + 5) / 18.0).sum
    assert(math.abs(mean) < 1e-12)
    assert(math.abs(varS - (base - tieTerm)) < 1e-9,
      s"tie-corrected Var(S) $varS vs ${base - tieTerm}")
  }
}
