package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.LongType

import graft.engine.Engine

/** Window-function operators: batch sessionization (the batch twin of
  * streaming.Streaming.sessionize), running aggregates, per-group ranking.
  * At scale these are one shuffle on the partition key; state never leaves
  * the executors.
  */
object QueriesWin {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Engine.table(s, dir, name)

  private val w1 = Q(
    "w1_session_batch",
    "Batch sessionization: 30-min-gap sessions via lag + running sum of " +
      "boundaries, then per-session aggregates (cents-exact sums)",
    (s, d) => {
      val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val marked = t(s, d, "events")
        .withColumn("prev_ts", lag("ts", 1).over(byUser))
        .withColumn("boundary",
          when(col("prev_ts").isNull ||
            unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")) > 1800, 1)
            .otherwise(0))
        .withColumn("session_id", sum("boundary").over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      marked.groupBy("user_id", "session_id")
        .agg(count(lit(1)).as("n_events"),
          (sum(round(col("value") * 100, 0).cast(LongType)) / 100.0).as("total_value"),
          min("ts").as("started"), max("ts").as("ended"))
        .orderBy("user_id", "session_id")
    },
    Some("""WITH marked AS (
              SELECT user_id, event_id, ts, value,
                     CASE WHEN lag(ts) OVER w IS NULL
                          OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
                          THEN 1 ELSE 0 END AS boundary
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
            sess AS (
              SELECT *, CAST(sum(boundary) OVER
                (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
              FROM marked)
            SELECT user_id, session_id, count(*) AS n_events,
                   sum(CAST(round(value * 100, 0) AS BIGINT)) / 100.0 AS total_value,
                   min(ts) AS started, max(ts) AS ended
            FROM sess GROUP BY user_id, session_id
            ORDER BY user_id, session_id"""))

  private val w2 = Q(
    "w2_running_sum",
    "Running per-user cumulative sum ordered by event time (cents-exact)",
    (s, d) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, d, "events")
        .withColumn("cum_value",
          sum(round(col("value") * 100, 0).cast(LongType)).over(w) / 100.0)
        .select("event_id", "user_id", "cum_value")
        .orderBy("event_id")
    },
    Some("""SELECT event_id, user_id,
                   sum(CAST(round(value * 100, 0) AS BIGINT)) OVER
                     (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS UNBOUNDED PRECEDING) / 100.0 AS cum_value
            FROM events ORDER BY event_id"""))

  private val w3 = Q(
    "w3_top_n_per_group",
    "Top-3 orders per customer by price (dense ranking, deterministic " +
      "tie-break on key)",
    (s, d) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(desc("o_totalprice"), col("o_orderkey"))
      t(s, d, "orders")
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select("o_custkey", "rk", "o_orderkey", "o_totalprice")
        .orderBy("o_custkey", "rk")
    },
    Some("""SELECT o_custkey, rk, o_orderkey, o_totalprice
            FROM (SELECT *, row_number() OVER
                    (PARTITION BY o_custkey
                     ORDER BY o_totalprice DESC, o_orderkey) AS rk
                  FROM orders) x
            WHERE rk <= 3 ORDER BY o_custkey, rk"""))

  private val w5 = Q(
    "w5_funnel",
    "Ordered funnel (view → click-after-view → purchase-after-click) per " +
      "user via a conditional-min cascade: each stage is min(ts) gated on " +
      "the previous stage's timestamp. Three aggregations + two joins, " +
      "ALL keyed on user_id — one logical shuffle key end to end, so at " +
      "scale every stage is co-partitioned with the last (no data " +
      "re-distribution between stages). Booleans out, no FP, no ts haze.",
    (s, d) => {
      val ev = t(s, d, "events").select("user_id", "event_type", "ts")
      val v = ev.groupBy("user_id")
        .agg(min(when(col("event_type") === "view", col("ts"))).as("t1"))
      val c = ev.join(v, "user_id")
        .groupBy("user_id")
        .agg(min(when(col("event_type") === "click" && col("ts") > col("t1"),
          col("ts"))).as("t2"))
      val p = ev.join(c, "user_id")
        .groupBy("user_id")
        .agg(min(when(col("event_type") === "purchase" && col("ts") > col("t2"),
          col("ts"))).as("t3"))
      v.join(c, "user_id").join(p, "user_id")
        .select(col("user_id"),
          col("t1").isNotNull.as("did_view"),
          col("t2").isNotNull.as("did_click_after"),
          col("t3").isNotNull.as("did_purchase_after"))
        .transform(graft.engine.Ops.reportSort("user_id"))
    },
    Some("""WITH v AS (
              SELECT user_id,
                     min(CASE WHEN event_type = 'view' THEN ts END) AS t1
              FROM events GROUP BY 1),
            c AS (
              SELECT e.user_id,
                     min(CASE WHEN e.event_type = 'click' AND e.ts > v.t1
                              THEN e.ts END) AS t2
              FROM events e JOIN v USING (user_id) GROUP BY 1),
            p AS (
              SELECT e.user_id,
                     min(CASE WHEN e.event_type = 'purchase' AND e.ts > c.t2
                              THEN e.ts END) AS t3
              FROM events e JOIN c USING (user_id) GROUP BY 1)
            SELECT v.user_id,
                   t1 IS NOT NULL AS did_view,
                   t2 IS NOT NULL AS did_click_after,
                   t3 IS NOT NULL AS did_purchase_after
            FROM v JOIN c USING (user_id) JOIN p USING (user_id)
            ORDER BY user_id"""))

  private val w6 = Q(
    "w6_retention",
    "Cohort retention matrix: cohort = each user's first active day, " +
      "retained(k) = distinct users active k days later (k ≤ 7). One agg " +
      "for first-days, one distinct over (user, day) — both shuffle on " +
      "user_id — then a user-keyed join and a small groupBy. The matrix " +
      "is |days| x 8 rows regardless of event volume.",
    (s, d) => {
      val ev = t(s, d, "events")
        .select(col("user_id"), to_date(col("ts")).as("day"))
      val firstDay = ev.groupBy("user_id").agg(min("day").as("cohort_day"))
      val active = ev.distinct()
      active.join(firstDay, "user_id")
        .withColumn("k", datediff(col("day"), col("cohort_day")))
        .filter(col("k") >= 0 && col("k") <= 7)
        // ISO string, not DATE: pandas reads Spark's date32 as Timestamp
        // but DuckDB DATE as datetime.date — strings compare identically
        .groupBy(date_format(col("cohort_day"), "yyyy-MM-dd").as("cohort_day"),
          col("k"))
        .agg(countDistinct("user_id").as("n_active"))
        .transform(graft.engine.Ops.reportSort("cohort_day", "k"))
    },
    Some("""WITH ev AS (
              SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
            f AS (
              SELECT user_id, min(day) AS cohort_day FROM ev GROUP BY 1)
            SELECT strftime(cohort_day, '%Y-%m-%d') AS cohort_day,
                   CAST(date_diff('day', cohort_day, day) AS INT) AS k,
                   count(DISTINCT ev.user_id) AS n_active
            FROM ev JOIN f USING (user_id)
            WHERE date_diff('day', cohort_day, day) BETWEEN 0 AND 7
            GROUP BY 1, 2 ORDER BY cohort_day, k"""))

  val all: Seq[Q] = Seq(w1, w2, w3, w5, w6)
}
