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

  val all: Seq[Q] = Seq(w1, w2, w3)
}
