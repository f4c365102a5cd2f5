package graft

/** Dev harness (not a test): prints exchange/broadcast counts per
  * declared query so plan regressions are visible at a glance.
  * Run: sbt "Test/runMain graft.PlanShapeReport [sfDir]" */
object PlanShapeReport {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSpec.spark
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
      val ex = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
      val bc = plan.linesIterator.count(_.contains("BroadcastExchange"))
      val gen = plan.linesIterator.count(_.contains("Generate"))
      println(f"$name%-28s exchanges=$ex%2d broadcast=$bc%2d generate=$gen%2d")
    }
    spark.stop()
  }
}
