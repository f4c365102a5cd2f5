package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-factor multiplier for the driver fixtures: replicates every
  * table `factor`× with disjoint key spaces, producing an sf×factor
  * dataset for SCALING-CURVE measurement (TESTDATA.md ships sf ≤ 0.1;
  * the 100 TB narrative needs a measured growth curve, so we
  * manufacture sf1.0 from sf0.1 — VERDICT r4 "next round" #1).
  *
  * Replication rules (replica 0 is the untouched original):
  *  - facts & dims (customer/supplier/part/orders/lineitem/events):
  *    key columns get a per-replica offset, so FK joins stay 1:1 and
  *    per-key fanouts keep their sf0.1 shape; dates/timestamps are
  *    KEPT (10× rows per day — the honest way volume grows: a bigger
  *    business on the same calendar, not a longer one).
  *  - region/nation: fixed domain tables, copied once (as TPC-H does).
  *  - documents: every word of replica k>0 gets an `_rk` suffix, so
  *    shingle/minhash/simhash spaces are DISJOINT across replicas —
  *    within-replica duplicate structure is preserved exactly and the
  *    near-dup pair count scales ×factor. Naive identical copies would
  *    make every doc a 10-way duplicate (pair count ×factor², CC
  *    clusters bridging replicas) — a different, denser corpus, not a
  *    scaled one. n_chars is recomputed from the rewritten text.
  *  - embeddings: replica k applies a deterministic per-(k, dim) sign
  *    flip. Within a replica, every dot product / cosine / L2 is
  *    EXACTLY preserved (the same flip hits both sides); across
  *    replicas, vectors decorrelate (random-sign inner products ≈ 0),
  *    so threshold families (semantic dedup, radius search) also grow
  *    ×factor, not ×factor². Query-slice predicates (vec_id < 60,
  *    doc_id < N) keep their original size — the query set does not
  *    scale with the corpus, exactly like production ANN serving.
  */
object ScaleUp {

  /** Replica-k word suffixing for documents. Suffixes only NON-EMPTY
    * tokens: split on " " turns runs of consecutive spaces into empty
    * tokens, and suffixing those would inject bare "_rk" words replica
    * 0 doesn't have — breaking the "within-replica duplicate structure
    * preserved exactly" invariant for texts that aren't single-space
    * normalized (ScaleUpSpec pins the doubled-space case). */
  private[graft] def suffixWords(text: org.apache.spark.sql.Column, k: Int)
      : org.apache.spark.sql.Column =
    array_join(
      transform(split(text, " "),
        w => when(w === "", w).otherwise(concat(w, lit(s"_r$k")))),
      " ")

  /** DIVERSITY mode's replica-k text rewrite (round 8, VERDICT r7
    * "next round" #3): deterministic per-token word-DROP (~1/17) and
    * word-DUPLICATION (~1/17) keyed on (doc_id, k, token index), so
    * per-doc (n_tok, n_stop, n_chars) — and every value domain derived
    * from them (quality scores, token ratios, readability) — GROWS
    * with the corpus instead of saturating at replica-0's domain.
    * Pure-replication scaling hid the r6 eval_lift weakness precisely
    * because 10× data added ZERO new score values; under diversity the
    * distinct-score curve bends up and corpus-growing-domain bugs
    * become visible. Empty tokens pass through untouched (the suffix
    * rule's space-structure contract). Trade-off, documented: within-
    * replica EXACT-duplicate structure is destroyed for k>0 (drops are
    * keyed by doc_id), so dedup-family sweeps keep using classic mode;
    * diversity mode exists for the window/rank/domain sweeps. */
  private[graft] def diversifyWords(text: org.apache.spark.sql.Column,
                                    k: Int)
      : org.apache.spark.sql.Column =
    array_join(
      flatten(transform(split(text, " "),
        (w, i) => when(w === "", array(w))
          .when(pmod(xxhash64(col("doc_id"), lit(k), i), lit(17)) === 0,
                array().cast("array<string>"))
          .when(pmod(xxhash64(col("doc_id"), lit(k), i), lit(17)) === 1,
                array(w, w))
          .otherwise(array(w)))),
      " ")

  /** DIVERSITY mode's money jitter: replica k>0 shifts a cents value
    * by a deterministic 0–99 sub-dollar offset keyed on (ids…, k), so
    * distinct-cent domains (the mannwhitney/median_ci/ks "price book"
    * frames) grow ~min(100, replicas)× instead of saturating. Exact
    * DECIMAL(18,2) arithmetic — the money-cast contract is preserved
    * bit-for-bit. */
  private[graft] def jitterMoney(v: org.apache.spark.sql.Column, k: Int,
                                 keys: org.apache.spark.sql.Column*)
      : org.apache.spark.sql.Column =
    (v.cast(org.apache.spark.sql.types.DecimalType(18, 2)) +
     (pmod(xxhash64((keys :+ lit(k)): _*), lit(100))
        .cast(org.apache.spark.sql.types.DecimalType(18, 2)) / 100))
      .cast("double")

  def main(args: Array[String]): Unit = {
    val (src, out, fStr, mode, tables) = args match {
      case Array(s, o, f)    => (s, o, f, "classic", None)
      case Array(s, o, f, m) => (s, o, f, m, None)
      // targeted projections (e.g. the PayoffBench sf100-diversity
      // point needs ONLY lineitem — writing all ten tables at ×1000
      // would burn disk and hours for columns nothing reads)
      case Array(s, o, f, m, ts) =>
        (s, o, f, m, Some(ts.split(",").map(_.trim).toSet))
      case _ => sys.error(
        "usage: ScaleUp <src> <out> <factor> [diversity] [tables-csv]")
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    run(spark, src, out, fStr.toInt, diversity = mode == "diversity",
        only = tables)
    spark.stop()
  }

  def run(spark: SparkSession, src: String, out: String, factor: Int)
      : Unit = run(spark, src, out, factor, diversity = false)

  def run(spark: SparkSession, src: String, out: String, factor: Int,
          diversity: Boolean): Unit =
    run(spark, src, out, factor, diversity, only = None)

  def run(spark: SparkSession, src: String, out: String, factor: Int,
          diversity: Boolean, only: Option[Set[String]]): Unit = {
    require(factor >= 1, s"factor must be >= 1, got $factor")
    def wanted(table: String): Boolean = only.forall(_.contains(table))

    val K = 10000000L // per-replica key offset (dims/docs/vectors)
    val KO = 100000000L // orders/lineitem orderkey offset
    val KE = 1000000000L // event id offset

    def scaled(table: String)(per: (DataFrame, Int) => DataFrame): Unit = {
      if (!wanted(table)) return
      val base = spark.read.parquet(s"$src/$table.parquet")
      val all = (0 until factor).map(k => per(base, k))
        .reduce(_ unionByName _)
      all.write.mode("overwrite").parquet(s"$out/$table.parquet")
      println(s"[scaleup] $table x$factor written")
    }

    for (t <- Seq("region", "nation") if wanted(t))
      spark.read.parquet(s"$src/$t.parquet")
        .write.mode("overwrite").parquet(s"$out/$t.parquet")

    scaled("customer") { (df, k) =>
      df.withColumn("c_custkey", col("c_custkey") + lit(k * K))
    }
    scaled("supplier") { (df, k) =>
      df.withColumn("s_suppkey", col("s_suppkey") + lit(k * K))
    }
    scaled("part") { (df, k) =>
      df.withColumn("p_partkey", col("p_partkey") + lit(k * K))
    }
    scaled("orders") { (df, k) =>
      val base0 =
        if (!diversity || k == 0) df
        else df.withColumn("o_totalprice",
          jitterMoney(col("o_totalprice"), k, col("o_orderkey")))
      base0.withColumn("o_orderkey", col("o_orderkey") + lit(k * KO))
        .withColumn("o_custkey", col("o_custkey") + lit(k * K))
    }
    scaled("lineitem") { (df, k) =>
      val base0 =
        if (!diversity || k == 0) df
        else df
          .withColumn("l_extendedprice",
            jitterMoney(col("l_extendedprice"), k,
                        col("l_orderkey"), col("l_partkey")))
          .withColumn("l_quantity",
            jitterMoney(col("l_quantity"), k,
                        col("l_partkey"), col("l_suppkey")))
      base0.withColumn("l_orderkey", col("l_orderkey") + lit(k * KO))
        .withColumn("l_partkey", col("l_partkey") + lit(k * K))
        .withColumn("l_suppkey", col("l_suppkey") + lit(k * K))
    }
    scaled("events") { (df, k) =>
      val base0 =
        if (!diversity || k == 0) df
        else df.withColumn("value",
          jitterMoney(col("value"), k, col("event_id")))
      base0.withColumn("event_id", col("event_id") + lit(k * KE))
        .withColumn("user_id", col("user_id") + lit(k * K))
    }
    scaled("documents") { (df, k) =>
      val moved =
        if (k == 0) df
        else if (diversity)
          df.withColumn("text",
            suffixWords(diversifyWords(col("text"), k), k))
        else df.withColumn("text", suffixWords(col("text"), k))
      moved.withColumn("doc_id", col("doc_id") + lit(k * K))
        .withColumn("n_chars", length(col("text")).cast("long"))
    }
    scaled("embeddings") { (df, k) =>
      val moved =
        if (k == 0) df
        else df.withColumn("embedding", expr(
          s"transform(embedding, (x, i) -> " +
          s"IF(pmod(xxhash64(i, $k), 2) = 0, x, CAST(-x AS FLOAT)))"))
      moved.withColumn("vec_id", col("vec_id") + lit(k * K))
    }
  }
}
