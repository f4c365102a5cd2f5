package graft

import org.apache.spark.sql.DataFrame

/** The per-invocation materialization seam (r12's "materialize once"
  * pattern, guide §3.3): a frame consumed by several plan branches is
  * materialized once so Spark does not re-plan — and re-run — the
  * whole upstream subtree per consumer. NOT caching: the default mode
  * never registers with the CacheManager, construction runs inside the
  * caller's timed region, and every invocation recomputes from source.
  *
  * `spark.graft.seam.mode` (session conf, read per call) picks the
  * mechanism — the reliability knob the r12 advisory asked for:
  *
  *  - `"local"` (default): `localCheckpoint(eager = true)`. Fast (no
  *    filesystem roundtrip) but the blocks live in EXECUTOR storage:
  *    on a multi-executor cluster, losing an executor mid-query makes
  *    the truncated lineage unrecoverable and fails the job (the
  *    caller's retry recomputes from source). Eager also means
  *    upstream work and exceptions surface at DataFrame-CONSTRUCTION
  *    time, not first-action time.
  *  - `"reliable"`: `Dataset.checkpoint(eager = true)` to the
  *    directory set via `sparkContext.setCheckpointDir` — survives
  *    executor loss; the resilient choice for long multi-stage queries
  *    on real clusters (same trade [[api.Dedup.connectedComponents]]'s
  *    `reliable = true` makes for its fixpoint). Checkpoint files are
  *    reclaimed per Spark's `cleanCheckpoints` conf.
  *  - `"lazy"`: `localCheckpoint(eager = false)` — same executor-local
  *    storage, but work and exceptions defer to the first action
  *    (library-caller semantics closest to an unmaterialized frame).
  *  - `"off"`: no materialization — every consumer recomputes the
  *    subtree (the pre-r12 plan shape; useful for A/B and for callers
  *    whose downstream engine dedupes subtrees itself).
  */
object Seam {
  def apply(df: DataFrame): DataFrame =
    df.sparkSession.conf.get("spark.graft.seam.mode", "local") match {
      case "reliable" => df.checkpoint(eager = true)
      case "lazy"     => df.localCheckpoint(eager = false)
      case "off"      => df
      case _          => df.localCheckpoint(eager = true)
    }

  /** Between-query housekeeping for harness sweeps (r12 advisory):
    * localCheckpointed blocks are reclaimed only by ContextCleaner
    * after a driver GC happens to run, so a 391-query session
    * accumulates executor storage for dozens of dead seams. This drops
    * every persistent RDD still registered with the context. Safe ONLY
    * between queries: each declared query's action completes before
    * the next begins, so whatever is still pinned is dead weight —
    * operator-internal pins are released in their own `finally`
    * blocks, and callers release Determinism's CacheManager-level
    * pinned frames (releaseCumSums) before this RDD-level sweep. */
  def releaseAll(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sparkContext.getPersistentRDDs.values
      .foreach(r => { scala.util.Try(r.unpersist(blocking = false)); () })
}
