package graft

import org.apache.spark.sql.functions._

/** Pins the r13 simhashVotes parity-mask rewrite: the packed long
  * `conv(translate(md5(t), '0123456789abcdef', '0101010101010101'),
  * 2, 10)` must reproduce, bit for bit, the substring-parity test it
  * replaced (`substring(md5(t), k, 1) IN ('1','3','5','7','9','b','d',
  * 'f')` ⇔ `(mask >> (32-k)) & 1 = 1`) — the equivalence the declared
  * q_dedup_simhash / q_dedup_simhash_hamming oracle hashes rest on.
  * Checked over every hex digit value (the 500-token frame covers all
  * 16 digits at every one of the 32 positions with overwhelming
  * probability, and the assertion is per (token, position) so a single
  * mismatch fails loudly). */
class SimhashMaskSpec extends SparkSpec {
  import spark.implicits._

  test("parity mask equals substring-parity at every hex position") {
    val oddHex = Seq("1", "3", "5", "7", "9", "b", "d", "f")
    val toks = (1 to 500).map(i => s"tok_$i").toDF("t")
      .withColumn("_h", md5(col("t")))
      .withColumn("_m",
        conv(translate(col("_h"),
               "0123456789abcdef", "0101010101010101"), 2, 10)
          .cast("long"))
    val checks = (1 to 32).map { k =>
      val sub = substring(col("_h"), k, 1).isin(oddHex: _*)
      val bit = expr(s"shiftright(_m, ${32 - k}) & 1") === 1
      count(when(sub =!= bit, 1)).as(s"bad_$k")
    }
    val row = toks.agg(checks.head, checks.tail: _*).head()
    (0 until 32).foreach { i =>
      assert(row.getLong(i) == 0L, s"parity mismatch at hex digit ${i + 1}")
    }
  }
}
