package graft

import org.apache.spark.sql.functions._

/** Dev harness: measure the BitmapDistinctRule rewrite against the
  * native distinct-aggregate plan on real fixture data, with equality
  * asserted first so the numbers compare equal work. The interesting
  * regime is MANY distinct values per group (the value-rows shuffle the
  * rewrite eliminates), so the default groups lineitem by l_returnflag
  * (3 groups × ~200k l_orderkey values each at sf0.1).
  * sbt "Test/runMain graft.BenchBitmapDistinct /root/testdata/sf0.1"
  */
object BenchBitmapDistinct {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(5)
    val spark = SparkSpec.spark
    SparkEntry.entry(spark).count() // warm

    def q = graft.io.Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_orderkey")).as("cd"),
           count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"))

    def run(): Double = {
      val t0 = System.nanoTime()
      q.collect(): Unit
      (System.nanoTime() - t0) / 1e9
    }
    def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)

    val plain = q.collect().map(_.toSeq).toSeq
    val tPlain = median((1 to reps).map(_ => run()))

    spark.experimental.extraOptimizations = Seq(graft.plans.BitmapDistinctRule)
    spark.conf.set("spark.graft.bitmapDistinct.enabled", "true")
    try {
      val got = q.collect().map(_.toSeq).toSeq
      require(got == plain, s"rewrite changed results!\n$got\nvs\n$plain")
      require(q.queryExecution.optimizedPlan.toString
        .contains("bitmap_construct_agg"), "rule did not fire")
      val tBitmap = median((1 to reps).map(_ => run()))
      println(f"plain countDistinct: $tPlain%.3f s   " +
              f"bitmap rewrite: $tBitmap%.3f s   (median of $reps)")
    } finally {
      spark.conf.unset("spark.graft.bitmapDistinct.enabled")
      spark.experimental.extraOptimizations = Nil
      spark.stop()
    }
  }
}
