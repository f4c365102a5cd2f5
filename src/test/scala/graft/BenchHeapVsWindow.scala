package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev harness: measure the ANN ranking step both ways — the round-4
  * map-side heap (`topk_pairs_by_long`) vs the window idiom
  * (`row_number() OVER (PARTITION BY q_id)`) — on an inflated query set
  * so the ranked-pair volume is big enough to matter (|Q| queries ×
  * n collection ≈ millions of scored rows). Asserts the two produce
  * identical results before timing, so the numbers compare equal work.
  * sbt "Test/runMain graft.BenchHeapVsWindow 500 /root/testdata/sf0.1"
  */
object BenchHeapVsWindow {
  def main(args: Array[String]): Unit = {
    val nQ = args.lift(0).map(_.toInt).getOrElse(500)
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val spark = SparkSpec.spark
    import spark.implicits._
    graft.functions.DotF32.register(spark)
    graft.functions.TopKByLong.register(spark)

    val e = graft.io.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
      .withColumn("nrm", sqrt(expr("dot_f32(embedding, embedding)")))
      .filter(col("embedding").isNotNull && col("nrm") > 0)
    val q = e.filter(col("vec_id") < nQ)
      .select(col("vec_id").as("q_id"), col("embedding").as("qe"),
              col("nrm").as("qn"))
    def scored = broadcast(q).join(
        e.select(col("vec_id").as("cand_id"), col("embedding").as("ce"),
                 col("nrm").as("cn")),
        col("q_id") =!= col("cand_id"))
      .select(col("q_id"), col("cand_id"),
              round(expr("dot_f32(qe, ce)") / (col("qn") * col("cn")), 4)
                .as("cos"))
    val k = 10

    def heap = scored
      .withColumn("_ord", round(col("cos") * 10000).cast("long"))
      .groupBy(col("q_id"))
      .agg(expr(s"topk_pairs_by_long(cand_id, _ord, $k)").as("_t"))
      .select(col("q_id"), posexplode(col("_t")).as(Seq("_p", "_pair")))
      .select(col("q_id"), col("_pair.value").as("cand_id"),
              (col("_pair.ord") / 10000.0).as("cos"),
              (col("_p") + 1).cast("int").as("rn"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("cand_id").asc)
    def windowed = scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)

    // identical output first (same rows, same scores)
    val a = heap.as[(Long, Long, Double, Int)].collect().toSet
    val b = windowed.select("q_id", "cand_id", "cos", "rn")
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(a == b, s"heap and window disagree: ${a.diff(b).take(5)}")
    println(s"outputs identical: ${a.size} rows (|Q|=$nQ, k=$k)")

    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      heap.count()
      val t1 = System.nanoTime()
      windowed.count()
      val t2 = System.nanoTime()
      println(f"run$i: heap ${(t1 - t0) / 1e9}%.2f s, " +
        f"window ${(t2 - t1) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
