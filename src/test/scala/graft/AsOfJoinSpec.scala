package graft

import org.apache.spark.sql.functions._

import graft.io.Tables
import graft.plans.AsOf

/** The custom as-of join operator (LogicalPlan + Strategy + SparkPlan):
  * exact semantics on a handcrafted case, full equivalence with the
  * window-emulated q_join_asof on the events fixture, and the plan shape
  * that justifies its existence (merge exec, no window, no join node). */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  test("strictly-prior semantics, per key, nulls when no match") {
    val trades = Seq((1L, 10L, "T1"), (1L, 20L, "T2"), (2L, 5L, "T3"))
      .toDF("k", "t", "trade")
    val quotes = Seq((1L, 5L, "a"), (1L, 10L, "b"), (1L, 15L, "c"),
                     (3L, 1L, "d"))
      .toDF("qk", "qt", "quote")
    val got = AsOf.join(trades, quotes,
        Seq(trades("k")), Seq(quotes("qk")), trades("t"), quotes("qt"))
      .select(col("trade"), col("quote"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    // t=10 matches only the STRICTLY prior quote (t=5), not the t=10 one
    assert(got == Map("T1" -> "a", "T2" -> "c", "T3" -> null))
  }

  test("matches the window-emulated q_join_asof on the events fixture") {
    val e = Tables.events(spark, sfDir)
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
              col("ts_us"))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
              col("ts_us").as("click_us"))
    val custom = AsOf.join(purchases, clicks,
        Seq(purchases("user_id")), Seq(clicks("c_user")),
        purchases("ts_us"), clicks("click_us"))
      .select(col("purchase_id"),
              coalesce(col("click_us"), lit(-1L)).as("prev_click_us"))
      .orderBy(col("purchase_id"))
      .collect().toSeq
    val emulated = SparkEntry.queries("q_join_asof")(spark, sfDir)
      .select(col("purchase_id"), col("prev_click_us"))
      .collect().toSeq
    assert(custom == emulated)
  }

  test("plans as one merge exec: no Join, no Window, one exchange per side") {
    val e = Tables.events(spark, sfDir)
    val l = e.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts_us"))
    val r = e.filter(col("event_type") === "click")
      .select(col("event_id").as("rid"), col("user_id").as("ruser"),
              col("ts_us").as("rts"))
    val df = AsOf.join(l, r, Seq(l("user_id")), Seq(r("ruser")),
                       l("ts_us"), r("rts"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoinExec") || plan.contains("AsOfJoin"),
      s"custom exec not planned:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("Window"))
    assert(plan.linesIterator
      .count(_.contains("Exchange hashpartitioning")) == 2,
      s"expected exactly one co-partitioning exchange per side:\n$plan")
  }

  test("inclusive bound admits equal timestamps; tolerance nulls far matches") {
    val trades = Seq((1L, 10L, "T1"), (1L, 100L, "T2"))
      .toDF("k", "t", "trade")
    val quotes = Seq((1L, 10L, "a"), (1L, 20L, "b"))
      .toDF("qk", "qt", "quote")
    def run(inclusive: Boolean, tol: Long) =
      AsOf.join(trades, quotes, Seq(trades("k")), Seq(quotes("qk")),
          trades("t"), quotes("qt"),
          inclusive = inclusive, toleranceUs = tol)
        .select(col("trade"), col("quote"))
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    // strict (default): T1 at t=10 has no strictly-prior quote
    assert(run(inclusive = false, tol = -1L) ==
      Map("T1" -> null, "T2" -> "b"))
    // inclusive: the equal-timestamp quote matches
    assert(run(inclusive = true, tol = -1L) ==
      Map("T1" -> "a", "T2" -> "b"))
    // tolerance 50: T2's latest prior (t=20) is 80 away -> null
    assert(run(inclusive = false, tol = 50L) ==
      Map("T1" -> null, "T2" -> null))
    // tolerance exactly at the gap boundary matches (<=)
    assert(run(inclusive = false, tol = 80L) ==
      Map("T1" -> null, "T2" -> "b"))
  }

  test("rightTieBreak pins the winner among equal-time right rows") {
    val trades = Seq((1L, 30L, "T")).toDF("k", "t", "trade")
    // two quotes tied at t=20; tiebreak on id ASC buffers id=9 last
    val quotes = Seq((1L, 20L, 5L, "low"), (1L, 20L, 9L, "high"))
      .toDF("qk", "qt", "qid", "quote")
    val got = (1 to 3).map { _ =>
      AsOf.join(trades, quotes.repartition(3),
          Seq(trades("k")), Seq(quotes("qk")), trades("t"), quotes("qt"),
          rightTieBreak = Seq(quotes("qid")))
        .select(col("quote")).collect().map(_.getString(0)).toSeq
    }
    assert(got.forall(_ == Seq("high")), s"got $got")
  }
}
