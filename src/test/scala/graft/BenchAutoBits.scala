package graft

import org.apache.spark.sql.functions._

/** Dev harness: measure the fixed-bits vs bitsFor(n) SRP candidate
  * join on a large embeddings table (SCALE.md r5 — the sweep that
  * exposed the n²/2^bits shape).
  * sbt "Test/runMain graft.BenchAutoBits /root/repo/scale-data/sf10" */
object BenchAutoBits {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/repo/scale-data/sf10")
    val spark = SparkSpec.spark
    val emb = graft.io.Tables.embeddings(spark, sfDir)
    val n = emb.count()
    val auto = graft.api.Sim.bitsFor(n)
    for (bits <- Seq(8, auto).distinct) {
      val t0 = System.nanoTime()
      val pairs = graft.api.Sim.embeddingNearDupPairs(
        emb, col("vec_id"), col("embedding"), bits = bits, minCos = 0.3)
      val np = pairs.count()
      println(f"n=$n bits=$bits (auto=$auto): $np pairs in " +
        f"${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    spark.stop()
  }
}
