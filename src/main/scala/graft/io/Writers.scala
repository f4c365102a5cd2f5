package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions.col

/** Write-side layout API — the storage decisions that decide 100 TB read
  * cost (SCALE.md). Each writer encodes one layout discipline:
  *
  *  - `partitioned`: directory partitioning on low-cardinality keys
  *    (date, topic, lang) → static partition pruning + DPP at read time
  *    (pinned in ScaleSpec). Rule of thumb: partitions ≥ ~1 GB; never
  *    partition on high-cardinality keys (small-file explosion).
  *  - `bucketed`: pre-shuffled, pre-sorted layout on a join/agg key →
  *    exchanges (and sorts) elide entirely for joins on that key
  *    (ScaleSpec proves the zero-exchange join; the custom AsOfJoinExec
  *    benefits identically through its ClusteredDistribution).
  *  - `sortedWithin`: clusters values inside each file so parquet
  *    row-group min/max statistics skip I/O for range predicates —
  *    cheap, composable with both of the above.
  */
object Writers {

  def partitioned(
      df: DataFrame, path: String, partitionCols: Seq[String],
      mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).partitionBy(partitionCols: _*).parquet(path)

  /** Repartition on the bucket key first: without it every write task
    * emits a file into every bucket (tasks × buckets small files, and
    * >1 file per bucket means the planner cannot trust sortBy order and
    * re-sorts at read time). repartition uses the same murmur3 hash as
    * bucketBy, so each output task holds exactly one bucket → one file
    * per bucket → joins on the key elide both the exchange AND (with
    * spark.sql.legacy.bucketedTableScan.outputOrdering=true, sound
    * under the one-file-per-bucket guarantee) the sort — both pinned
    * in ScaleSpec. */
  def bucketed(
      df: DataFrame, table: String, buckets: Int, key: String,
      mode: SaveMode = SaveMode.Overwrite,
      sortCols: Seq[String] = Nil): Unit =
    df.repartition(buckets, col(key))
      .write.mode(mode)
      // secondary sortCols serve operators that need in-partition
      // (key, time) order — e.g. AsOfJoinExec's merge reads bucketed
      // (key, ts)-sorted tables with zero exchanges AND zero sorts
      // (pinned in ScaleSpec)
      .bucketBy(buckets, key).sortBy(key, sortCols: _*)
      .saveAsTable(table)

  def sortedWithin(
      df: DataFrame, path: String, sortCols: Seq[String],
      partitions: Option[Int] = None,
      mode: SaveMode = SaveMode.Overwrite): Unit = {
    val repart = partitions.map(df.repartition(_)).getOrElse(df)
    repart.sortWithinPartitions(sortCols.map(col): _*)
      .write.mode(mode).parquet(path)
  }

  /** Small-file compaction — the maintenance job every streaming sink
    * and incremental append needs: micro-batches leave a long tail of
    * tiny files, and at 100 TB the scan cost is dominated by file-open
    * overhead, not bytes. Rewrites `path` into
    * ceil(totalBytes / targetFileBytes) files (range-clustered when
    * `sortCols` is given, so row-group min/max pruning survives the
    * rewrite), then swaps directories: write to a temp sibling, rename
    * the old dir away, rename the temp in, delete the old — readers
    * never observe a half-written table for longer than the two
    * renames. Returns (filesBefore, filesAfter). */
  def compact(
      spark: org.apache.spark.sql.SparkSession, path: String,
      targetFileBytes: Long = 128L * 1024 * 1024,
      sortCols: Seq[String] = Nil): (Int, Int) = {
    require(targetFileBytes > 0, "targetFileBytes must be positive")
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val entries = fs.listStatus(hPath)
    // a Hive-partitioned layout (key=.../part-*) would be silently
    // FLATTENED by this rewrite — refuse; compact each partition dir
    require(!entries.exists(e => e.isDirectory &&
        e.getPath.getName.contains("=")),
      s"$path is partitioned — compact each partition directory, " +
      "not the root (a root rewrite would destroy the layout)")
    val parts = entries
      .filter(s => s.isFile && s.getPath.getName.startsWith("part-"))
    require(parts.nonEmpty, s"no part-* files under $path")
    val totalBytes = parts.map(_.getLen).sum
    val nOut = math.max(1L,
      (totalBytes + targetFileBytes - 1) / targetFileBytes).toInt
    val df = spark.read.parquet(path)
    val out =
      if (sortCols.nonEmpty)
        df.repartitionByRange(nOut, sortCols.map(col): _*)
          .sortWithinPartitions(sortCols.map(col): _*)
      else df.repartition(nOut)
    val tmp = new org.apache.hadoop.fs.Path(path + ".compact-tmp")
    val old = new org.apache.hadoop.fs.Path(path + ".compact-old")
    fs.delete(tmp, true); fs.delete(old, true)
    out.write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    require(fs.rename(hPath, old), s"could not move $path aside")
    if (!fs.rename(tmp, hPath)) {
      // roll the live table back before failing — without this the
      // path is simply GONE until manual recovery
      fs.rename(old, hPath)
      throw new IllegalStateException(
        s"could not move compacted dir into $path (original restored)")
    }
    fs.delete(old, true)
    val after = fs.listStatus(hPath)
      .count(s => s.isFile && s.getPath.getName.startsWith("part-"))
    (parts.length, after)
  }

  /** Z-order (Morton) curve value of N pre-bucketed dimensions: bit i
    * of dimension k lands at position i·N + k. Pure integer shifts and
    * masks (codegen'd, engine-portable — the oracle replays it with
    * `>>`/`&`/`<<`), summing disjoint bit positions (+ ≡ |). Caller
    * contract: each input is an integer in [0, 2^bits) — bucket first
    * (`value % 2^bits`, `least(floor(value / w), 2^bits − 1)`);
    * N·bits ≤ 62. */
  def zvalue(cols: Seq[org.apache.spark.sql.Column], bits: Int)
      : org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{lit, shiftleft, shiftright}
    val n = cols.size
    require(n >= 1, "zvalue needs at least one dimension")
    require(bits >= 1 && n * bits <= 62,
      s"zvalue: n·bits = ${n * bits} out of [1, 62]")
    cols.zipWithIndex.flatMap { case (c, k) =>
      val cl = c.cast("long")
      (0 until bits).map(i =>
        shiftleft(shiftright(cl, i).bitwiseAND(lit(1L)), i * n + k))
    }.reduce(_ + _)
  }

  /** Multi-dimensional clustering: range-partition + sort the table on
    * its [[zvalue]] so parquet row-group min/max stats prune scans for
    * predicates on ANY of the interleaved dimensions — where
    * `sortedWithin` on (a, b) only ever prunes on `a` (b's per-file
    * range stays global past the first sort key), the z-curve keeps
    * every file to a small hyper-rectangle of the bucket space
    * (locality measured in ScaleSpec against exactly that single-dim
    * baseline). The layout for fact tables filtered independently by
    * several dimensions — (user, time), (lang, quality-score) — where
    * directory partitioning would explode into tiny files.
    * `dims` are pre-bucketed integer columns (zvalue caller contract
    * applies); the helper column is dropped before the write. */
  def zordered(
      df: DataFrame, path: String, dims: Seq[org.apache.spark.sql.Column],
      bits: Int, files: Int,
      mode: SaveMode = SaveMode.Overwrite): Unit = {
    require(files >= 1, "files must be >= 1")
    df.withColumn("__graft_zv", zvalue(dims, bits))
      .repartitionByRange(files, col("__graft_zv"))
      .sortWithinPartitions(col("__graft_zv"))
      .drop("__graft_zv")
      .write.mode(mode).parquet(path)
  }
}
