package graft

import org.apache.spark.sql.functions._

/** Dev harness: 32-bit (8-bit bands, declared/oracle form) vs 64-bit
  * (16-bit bands, corpus-scale form) SimHash Hamming pairs on a large
  * docs table (SCALE.md r5).
  * sbt "Test/runMain graft.BenchSimhashWide /root/repo/scale-data/sf10" */
object BenchSimhashWide {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/repo/scale-data/sf10")
    val spark = SparkSpec.spark
    val docs = graft.io.Tables.documents(spark, sfDir)
    for ((label, df) <- Seq(
        "32-bit/8-bit bands (fastHash)" -> graft.api.Dedup
          .simhashHammingPairs(docs, col("doc_id"), col("text"),
            maxHamming = 3, fastHash = true),
        "64-bit/16-bit bands" -> graft.api.Dedup
          .simhashHammingPairs64(docs, col("doc_id"), col("text"),
            maxHamming = 3))) {
      val t0 = System.nanoTime()
      val n = df.count()
      println(f"$label: $n pairs in ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    spark.stop()
  }
}
