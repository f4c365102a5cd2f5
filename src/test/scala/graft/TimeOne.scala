package graft

/** Dev harness: time one declared query at a given sfDir, twice (cold +
  * warm), printing the executed plan after the run.
  * sbt "Test/runMain graft.TimeOne q_dedup_ngram_jaccard /root/testdata/sf0.1" */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val spark = SparkSpec.spark
    SparkEntry.entry(spark).count() // warm the session
    for (i <- 1 to 2) {
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, sfDir)
      val n = df.count()
      println(f"run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s, $n rows")
      if (i == 2) println(df.queryExecution.executedPlan.toString.take(4000))
    }
    spark.stop()
  }
}
