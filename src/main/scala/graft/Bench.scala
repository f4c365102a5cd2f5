package graft
import scala.util.control.NonFatal
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JIT/codegen/session warmup outside the measured window so the first
    // measured query isn't charged ~4s of one-time JVM cost. Warm on the
    // BENCH dataset (not a hardcoded fixture path) and never let a warmup
    // failure kill the run before any JSON is emitted.
    try SparkEntry.queries("q_agg_group")(spark, sfDir).count()
    catch { case NonFatal(e) =>
      System.err.println(s"[bench] warmup failed: ${e.getMessage}")
    }
    // this box's run-to-run wall-clock variance is measured at ±60%
    // (SCALE.md) — a single run per query mostly benchmarks the noise.
    // Report the MEDIAN of `reps` runs per query, with the reps loop
    // OUTSIDE the query loop (true round-robin): rep r of every query
    // runs before rep r+1 of any, so repeats of one query are never
    // back-to-back warm-cache re-runs of the measurement just taken.
    // A malformed reps env value falls back to the default rather than
    // killing the run before any JSON is emitted.
    val reps = scala.util.Try(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").trim.toInt)
      .getOrElse(3).max(1)
    var failed = List.empty[String]
    val names = SparkEntry.queries.toSeq.sortBy(_._1)
    val times = scala.collection.mutable.Map.empty[String, List[Double]]
    for (_ <- 1 to reps; (name, fn) <- names) {
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).count()
        times(name) = ((System.nanoTime() - t0) / 1e9) ::
          times.getOrElse(name, Nil)
      } catch { case NonFatal(e) =>
        // record the failure loudly — time-to-exception must not
        // masquerade as a (suspiciously fast) clean measurement
        failed ::= name
        System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
      }
    }
    val results = names.map { case (name, _) =>
      val sorted = times.getOrElse(name, Nil).sorted
      name -> (if (sorted.isEmpty) 0.0 else sorted(sorted.size / 2))
    }
    failed = failed.distinct
    val ok = results.filterNot { case (k, _) => failed.contains(k) }
    val qs = ok.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = ok.map(_._2).sum
    val failedJson = failed.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failedJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
