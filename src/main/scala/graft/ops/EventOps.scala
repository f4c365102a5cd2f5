package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.io.Tables

/** Product-analytics operators over the event stream: funnel conversion
  * and cohort retention — the two reductions every event-logging
  * deployment (the reference's domain) runs first.
  *
  * Scale: both are key-partitioned aggregates/joins on user_id — linear,
  * one shuffle per stage, no windows over the full stream. Retention's
  * (cohort × week) matrix is tiny regardless of input size.
  */
object EventOps extends OpGroup {

  def qs: Seq[Q] = Seq(
    Q(
      // ordered funnel signup → click → purchase: each stage's timestamp
      // must be strictly later than the previous stage's FIRST timestamp
      "q_events_funnel",
      (s, d) => {
        val e = Tables.events(s, d)
          .select(col("user_id"), col("event_type"), col("ts_us"))
        val s1 = e.filter(col("event_type") === "signup")
          .groupBy(col("user_id")).agg(min(col("ts_us")).as("s_us"))
        val s2 = e.filter(col("event_type") === "click")
          .join(s1, "user_id").filter(col("ts_us") > col("s_us"))
          .groupBy(col("user_id")).agg(min(col("ts_us")).as("c_us"))
        val s3 = e.filter(col("event_type") === "purchase")
          .join(s2, "user_id").filter(col("ts_us") > col("c_us"))
          .groupBy(col("user_id")).agg(min(col("ts_us")).as("p_us"))
        s1.select(lit(1).as("stage"), lit("signup").as("name"),
                  count(lit(1)).as("n_users"))
          .unionByName(s2.select(lit(2).as("stage"),
            lit("click_after_signup").as("name"), count(lit(1)).as("n_users")))
          .unionByName(s3.select(lit(3).as("stage"),
            lit("purchase_after_click").as("name"), count(lit(1)).as("n_users")))
          .orderBy(col("stage"))
      },
      """WITH e AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events),
        |s1 AS (
        |  SELECT user_id, MIN(ts_us) AS s_us FROM e
        |  WHERE event_type = 'signup' GROUP BY user_id),
        |s2 AS (
        |  SELECT e.user_id, MIN(ts_us) AS c_us FROM e
        |  JOIN s1 ON e.user_id = s1.user_id
        |  WHERE event_type = 'click' AND ts_us > s_us GROUP BY e.user_id),
        |s3 AS (
        |  SELECT e.user_id, MIN(ts_us) AS p_us FROM e
        |  JOIN s2 ON e.user_id = s2.user_id
        |  WHERE event_type = 'purchase' AND ts_us > c_us GROUP BY e.user_id)
        |SELECT 1 AS stage, 'signup' AS name, COUNT(*) AS n_users FROM s1
        |UNION ALL BY NAME
        |SELECT 2 AS stage, 'click_after_signup' AS name,
        |  COUNT(*) AS n_users FROM s2
        |UNION ALL BY NAME
        |SELECT 3 AS stage, 'purchase_after_click' AS name,
        |  COUNT(*) AS n_users FROM s3
        |ORDER BY stage""".stripMargin),

    Q(
      // weekly cohort retention: users bucketed by first-seen week,
      // counted per (cohort_week, weeks_since) activity cell
      "q_events_retention",
      (s, d) => {
        val weekUs = 7L * 24 * 3600 * 1000000
        val e = Tables.events(s, d)
          .select(col("user_id"), (col("ts_us") - col("ts_us") % weekUs)
            .as("week_us"))
          .distinct()
        val cohort = e.groupBy(col("user_id"))
          .agg(min(col("week_us")).as("cohort_us"))
        e.join(cohort, "user_id")
          .select(col("user_id"), col("cohort_us"),
                  ((col("week_us") - col("cohort_us")) / weekUs)
                    .cast("int").as("weeks_since"))
          .groupBy(col("cohort_us"), col("weeks_since"))
          .agg(countDistinct(col("user_id")).as("n_users"))
          .orderBy(col("cohort_us"), col("weeks_since"))
      },
      s"""WITH e AS (
        |  SELECT DISTINCT user_id,
        |    epoch_us(ts) - epoch_us(ts) % ${7L * 24 * 3600 * 1000000} AS week_us
        |  FROM events),
        |cohort AS (
        |  SELECT user_id, MIN(week_us) AS cohort_us FROM e GROUP BY user_id)
        |SELECT cohort_us,
        |  CAST((week_us - cohort_us) / ${7L * 24 * 3600 * 1000000} AS INT)
        |    AS weeks_since,
        |  COUNT(DISTINCT e.user_id) AS n_users
        |FROM e JOIN cohort ON e.user_id = cohort.user_id
        |GROUP BY cohort_us, weeks_since
        |ORDER BY cohort_us, weeks_since""".stripMargin),

    Q(
      // event-sequence transition matrix (1st-order Markov): counts of
      // consecutive (prev_type -> type) per user timeline; '^' marks the
      // start state. lag() over a unique (ts, id) order — one shuffle.
      "q_events_transitions",
      (s, d) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts_us").asc, col("event_id").asc)
        Tables.events(s, d)
          .select(col("user_id"), col("ts_us"), col("event_id"),
                  col("event_type"))
          .withColumn("prev",
            coalesce(lag(col("event_type"), 1).over(w), lit("^")))
          .groupBy(col("prev"), col("event_type"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("prev"), col("event_type"))
      },
      """WITH t AS (
        |  SELECT user_id, event_type,
        |    COALESCE(lag(event_type) OVER
        |      (PARTITION BY user_id
        |       ORDER BY epoch_us(ts) ASC, event_id ASC), '^') AS prev
        |  FROM events)
        |SELECT prev, event_type, COUNT(*) AS n
        |FROM t GROUP BY prev, event_type
        |ORDER BY prev, event_type""".stripMargin)
  )
}
