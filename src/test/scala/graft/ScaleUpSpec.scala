package graft

import org.apache.spark.sql.functions._

/** The sf-multiplier's replication invariants (SCALE.md round 5): the
  * manufactured sf×N data must be a SCALED corpus, not a denser one —
  * disjoint key spaces, disjoint shingle spaces, exactly-preserved
  * within-replica similarity, decorrelated cross-replica vectors. A
  * violation here silently turns the scaling sweep into a different
  * workload (identical doc copies = ×N² pair counts). */
class ScaleUpSpec extends SparkSpec {
  import spark.implicits._

  private lazy val out: String = {
    val dir = tmpDir("scaleup") + "/sf3"
    ScaleUp.run(spark, "/root/testdata/sf0.001", dir, 3)
    dir
  }

  test("row counts: facts x3, fixed domain tables x1, FK joins stay 1:1") {
    val docs = spark.read.parquet(s"$out/documents.parquet")
    val base = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    assert(docs.count() == 3 * base.count())
    assert(spark.read.parquet(s"$out/region.parquet").count() == 5)
    val li = spark.read.parquet(s"$out/lineitem.parquet")
    val ord = spark.read.parquet(s"$out/orders.parquet")
    // every lineitem still has exactly one order (offsets consistent)
    assert(li.join(ord, col("l_orderkey") === col("o_orderkey"), "left_anti")
      .count() == 0)
  }

  test("document replicas have disjoint shingle spaces, honest n_chars") {
    val docs = spark.read.parquet(s"$out/documents.parquet")
    // replica 1 words carry the _r1 suffix -> no trigram can collide
    // with replica 0 (which is the untouched original)
    val r1 = docs.filter(col("doc_id") >= 10000000L &&
                         col("doc_id") < 20000000L)
    assert(r1.filter(!col("text").contains("_r1")).count() == 0)
    val r0 = docs.filter(col("doc_id") < 10000000L)
    assert(r0.filter(col("text").contains("_r1")).count() == 0)
    // n_chars recomputed from the rewritten text, not copied
    assert(docs.filter(length(col("text")).cast("long") =!= col("n_chars"))
      .count() == 0)
  }

  test("word suffixing survives doubled spaces: no bare _rk tokens") {
    // "a  b" splits to ["a", "", "b"] — the empty token must stay
    // empty, so replica k's token/shingle structure is exactly replica
    // 0's with the _rk suffix, whatever the whitespace normalization
    val got = Seq("a  b", " lead", "trail ", "x").toDF("text")
      .select(ScaleUp.suffixWords(col("text"), 2).as("t"))
      .as[String].collect().toSeq
    assert(got == Seq("a_r2  b_r2", " lead_r2", "trail_r2 ", "x_r2"),
      s"empty split tokens must not become bare _rk words: $got")
  }

  test("embedding sign-flip preserves within-replica dot products exactly") {
    val emb = spark.read.parquet(s"$out/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).as[(Long, Array[Float])]
      .collect().toMap
    val base = emb.keys.filter(_ < 10000000L).toSeq.sorted.take(4)
    def dot(a: Array[Float], b: Array[Float]): Double =
      a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
    for (Seq(i, j) <- base.combinations(2)) {
      val d0 = dot(emb(i), emb(j))
      // replica 2: both sides flipped by the SAME per-dim pattern ->
      // s_d^2 = 1 -> the product is bit-identical, similarity EXACT
      val d2 = dot(emb(i + 20000000L), emb(j + 20000000L))
      assert(d0 == d2, s"within-replica dot drifted: $d0 vs $d2 ($i,$j)")
    }
    // cross-replica: the flip decorrelates (|cos| well under the
    // within-replica self-similarity of 1)
    val self = base.head
    val dSelf = dot(emb(self), emb(self))
    val dCross = math.abs(dot(emb(self), emb(self + 20000000L)))
    assert(dCross < dSelf * 0.8,
      s"cross-replica vectors should decorrelate: |$dCross| vs $dSelf")
  }
}
