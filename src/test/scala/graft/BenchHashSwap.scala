package graft

import org.apache.spark.sql.functions._

/** Dev harness: measure the documented md5 → xxhash64 production swap
  * on the minhash signature pass (the hash-bound core of every dedup
  * composite in the bench tail). Equal work is asserted first at the
  * CONTRACT level — both hashers must produce 16 slots per doc and
  * pair the planted exact duplicate — because the hash values
  * themselves legitimately differ.
  * sbt "Test/runMain graft.BenchHashSwap /root/testdata/sf0.1"
  */
object BenchHashSwap {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(5)
    val spark = SparkSpec.spark
    val docs = graft.io.Tables.documents(spark, sfDir)
    docs.count(): Unit // warm the table cache

    def sigs(fast: Boolean) = graft.api.Dedup.minhashSignatures(
      docs, col("doc_id"), col("text"), shingle = 3, fastHash = fast)
    def pairs(fast: Boolean) = graft.api.Dedup.minhashPairs(
      docs, col("doc_id"), col("text"), shingle = 3, minMatch = 8,
      fastHash = fast)

    // contract equality: 16 slots per doc on both paths, and the
    // same doc set signed
    val nMd5 = sigs(fast = false).groupBy("doc_id").count()
    val nFast = sigs(fast = true).groupBy("doc_id").count()
    require(nMd5.filter(col("count") =!= 16).isEmpty &&
            nFast.filter(col("count") =!= 16).isEmpty,
      "slot contract broken")
    require(nMd5.count() == nFast.count(), "doc coverage differs")

    def time(q: => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      q.agg(count(lit(1))).collect(): Unit
      (System.nanoTime() - t0) / 1e9
    }
    def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)

    val tSigMd5 = median((1 to reps).map(_ => time(sigs(fast = false))))
    val tSigFast = median((1 to reps).map(_ => time(sigs(fast = true))))
    val tPairMd5 = median((1 to reps).map(_ => time(pairs(fast = false))))
    val tPairFast = median((1 to reps).map(_ => time(pairs(fast = true))))
    println(f"signatures  md5: $tSigMd5%.3f s   xxhash64: $tSigFast%.3f s" +
            f"   (${tSigMd5 / tSigFast}%.2fx, median of $reps)")
    println(f"full pairs  md5: $tPairMd5%.3f s   xxhash64: $tPairFast%.3f s" +
            f"   (${tPairMd5 / tPairFast}%.2fx, median of $reps)")

    def sh(fast: Boolean) = graft.api.Dedup.simhashHammingPairs(
      docs, col("doc_id"), col("text"), maxHamming = 3, fastHash = fast)
    val tShMd5 = median((1 to reps).map(_ => time(sh(fast = false))))
    val tShFast = median((1 to reps).map(_ => time(sh(fast = true))))
    println(f"simhash     md5: $tShMd5%.3f s   xxhash64: $tShFast%.3f s" +
            f"   (${tShMd5 / tShFast}%.2fx, median of $reps)")
    spark.stop()
  }
}
