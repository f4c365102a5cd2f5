package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Iterative graph traversal over edge-list DataFrames — the BFS
  * companion to [[Dedup.connectedComponents]]'s fixpoint. Where CC labels
  * every node of every component, `shortestHops` answers the *local*
  * question — what is reachable from a seed within k hops, and how far —
  * which is the building block for contamination blast-radius checks
  * ("every doc within 2 dedup-links of a benchmark doc"), lineage
  * spidering, and bounded graph features.
  *
  * Scale design (100 TB):
  *  - The edge list is hash-partitioned on `src` ONCE and cached; every
  *    hop joins on that same key, so iterations reuse the partitioning
  *    instead of re-shuffling the (big) edge side each round.
  *  - The frontier is the only thing that moves: hop h joins the hop-h-1
  *    frontier (typically ≪ edges) against the edges, then anti-joins
  *    the visited set to drop already-reached nodes. Everything stays
  *    distributed — the driver never collects a frontier; each hop's
  *    frontier and visited set are truncated with an eager
  *    localCheckpoint (maxHops is single-digit in every intended use, so
  *    the CC-style rolling reliable-checkpoint machinery is not needed;
  *    borrow it from connectedComponents if you must traverse hundreds
  *    of hops on a lossy cluster).
  *  - AQE picks a broadcast join for the frontier side automatically
  *    once its materialized size is known and small.
  */
object Graph {

  /** Minimum-hop distance from `source` to every node reachable within
    * `maxHops` directed edges. `edges` must have `src` and `dst` columns
    * (pass both directions for an undirected graph). Returns
    * `(node, dist)` with one row per reachable node, including the
    * source at dist 0 — exactly `min(d)` over the recursive path
    * enumeration a SQL `WITH RECURSIVE` oracle performs.
    */
  def shortestHops(
      spark: SparkSession,
      edges: DataFrame,
      source: Long,
      maxHops: Int): DataFrame = {
    import spark.implicits._
    require(maxHops >= 0, s"maxHops must be >= 0, got $maxHops")
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .repartition(col("src")).persist()
    try {
      var visited = Seq((source, 0)).toDF("node", "dist")
      var frontier = visited
      var h = 1
      while (h <= maxHops && !frontier.isEmpty) {
        frontier = e
          .join(frontier.select(col("node")), col("src") === col("node"))
          .select(col("dst").as("node")).distinct()
          .join(visited.select(col("node")), Seq("node"), "left_anti")
          .withColumn("dist", lit(h))
          .localCheckpoint(true)
        visited = visited.union(frontier).localCheckpoint(true)
        h += 1
      }
      visited
    } finally { e.unpersist(); () }
  }
}
