package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation helper (north star: "salting for skew"). AQE's skew
  * handling covers sort-merge joins at runtime; explicit salting remains
  * the tool when a single join key dominates so badly that even split
  * partitions of it overwhelm a task, or when the build side must stay a
  * shuffled hash join.
  *
  * Shape: the probe side gets a uniform random-ish salt in [0, n) that is
  * DETERMINISTIC per row (hash of the whole row, not rand() — keeps
  * retries and the double-run determinism test stable); the build side is
  * replicated n× with every salt value. The join key becomes
  * (key, salt), fanning one hot key across n tasks.
  */
object Skew {

  def saltedEquiJoin(
      probe: DataFrame,
      build: DataFrame,
      probeKey: Column,
      buildKey: Column,
      buckets: Int): DataFrame = {
    val salted = probe.withColumn("_salt",
      pmod(hash(probe.columns.map(col).toSeq: _*), lit(buckets)))
    val replicated = build.withColumn("_salt",
      explode(expr(s"sequence(0, ${buckets - 1})")))
    salted.join(replicated,
        probeKey === buildKey && salted("_salt") === replicated("_salt"))
      .drop("_salt")
  }
}
