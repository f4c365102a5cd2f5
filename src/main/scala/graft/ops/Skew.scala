package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation helper (north star: "salting for skew"). AQE's skew
  * handling covers sort-merge joins at runtime; explicit salting remains
  * the tool when a single join key dominates so badly that even split
  * partitions of it overwhelm a task, or when the build side must stay a
  * shuffled hash join.
  *
  * Shape: the probe side gets a salt in [0, n) that is DETERMINISTIC per
  * row (hash of the whole row, not rand() — keeps retries and the
  * double-run determinism test stable); the build side is replicated n×
  * with every salt value. The join key becomes (key, salt), fanning one
  * hot key across n tasks.
  *
  * Limitation of determinism-by-content: BYTE-IDENTICAL probe rows all
  * hash to the same salt, so a hot key whose rows are exact duplicates
  * is not spread (results stay correct; the skew remains). If that is
  * your shape, add a distinguishing column (an event id) before salting —
  * a rand()/monotonic salt would spread them but breaks replay-stable
  * results under task retries, which this engine refuses to do.
  */
object Skew {

  def saltedEquiJoin(
      probe: DataFrame,
      build: DataFrame,
      probeKey: Column,
      buildKey: Column,
      buckets: Int): DataFrame = {
    require(buckets >= 1,
      s"saltedEquiJoin: buckets must be >= 1, got $buckets " +
      "(0 would pmod-by-zero; under non-ANSI that silently returns 0 rows)")
    // reserved internal name, asserted absent: a caller's own column
    // must neither be overwritten nor dropped from the output
    val salt = "__graft_salt__"
    require(!probe.columns.contains(salt) && !build.columns.contains(salt),
      s"saltedEquiJoin: input already has a '$salt' column")
    val salted = probe.withColumn(salt,
      pmod(hash(probe.columns.map(col).toSeq: _*), lit(buckets)))
    val replicated = build.withColumn(salt,
      explode(expr(s"sequence(0, ${buckets - 1})")))
    salted.join(replicated,
        probeKey === buildKey && salted(salt) === replicated(salt))
      .drop(salt)
  }
}
