package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

import graft.engine.Engine

/** Round-8 batch 1: evaluation-tier additions for LLM training runs.
  */
object QueriesR8a {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Engine.table(s, dir, name)

  // ------------- eval_pass_at_k: the unbiased pass@k estimator

  /** The per-task estimator as ONE shared column expression: with n
    * attempts and c correct, pass@k = 1 − C(n−c, k)/C(n, k), computed as
    * the telescoped product ∏_{i=0..k−1} (n−c−i)/(n−i) — numerically
    * stable (every factor ≤ 1, no factorials) and an identical IEEE
    * expression tree on both engines. Guards, in order: c = 0 is an
    * exact 0 (covers n < k, where the n−c < k test alone would wrongly
    * say 1 for a task with no correct attempt at all); then n−c < k
    * means every size-min(k,n) sample contains a correct attempt →
    * pass@k = 1 exactly.
    */
  private def passAtK(k: Int) = {
    val prod = (0 until k).map(i =>
        (col("n") - col("c") - i).cast(DoubleType) /
          (col("n") - i).cast(DoubleType))
      .reduce(_ * _)
    when(col("c") === 0, lit(0.0))
      .when(col("n") - col("c") < k, lit(1.0))
      .otherwise(lit(1.0) - prod)
  }

  private val passK = Q(
    "eval_pass_at_k",
    "The unbiased pass@k estimator (the code-eval standard: with n " +
      "sampled attempts per task of which c pass, pass@k = " +
      "1 − C(n−c,k)/C(n,k), telescoped to ∏(n−c−i)/(n−i) so no " +
      "factorial ever overflows and every factor stays ≤ 1) over the " +
      "events fixture — each user is a task, each event an attempt, " +
      "purchases are passes. Per-task estimates quantize to micro " +
      "units BEFORE the cross-task mean (BIGINT sum: accumulation " +
      "order can never move a bit, the float-sum discipline), and the " +
      "report is one row per k ∈ {1, 5, 10}: tasks counted, mean " +
      "pass@k, and the share of tasks solved outright at that k. " +
      "Map-side partial aggregation end to end — per-task counts then " +
      "a k-row rollup; nothing is ever per-attempt past the first agg.",
    (s, d) => {
      val tasks = t(s, d, "events")
        .groupBy(col("user_id").as("task"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .as("c"))
      val ks = Seq(1, 5, 10)
      ks.map { k =>
          tasks.select(
            lit(k.toLong).as("k"),
            count(lit(1)).as("n_tasks"),
            sum(round(passAtK(k) * 1e6, 0).cast(LongType)).as("sum_micro"),
            sum(when(round(passAtK(k) * 1e6, 0) === 1e6, 1L).otherwise(0L))
              .as("n_solved"))
        }
        .reduce(_ unionByName _)
        .select(col("k"), col("n_tasks"),
          round(col("sum_micro").cast(DoubleType) / col("n_tasks") / 1e6, 6)
            .as("mean_pass_at_k"),
          col("n_solved"))
        .orderBy("k")
    },
    Some {
      def prodSql(k: Int): String = (0 until k)
        .map(i => s"(CAST(n - c - $i AS DOUBLE) / CAST(n - $i AS DOUBLE))")
        .mkString(" * ")
      def caseSql(k: Int): String =
        s"CASE WHEN c = 0 THEN CAST(0.0 AS DOUBLE) " +
          s"WHEN n - c < $k THEN CAST(1.0 AS DOUBLE) " +
          s"ELSE CAST(1.0 AS DOUBLE) - ${prodSql(k)} END"
      val arms = Seq(1, 5, 10).map { k =>
        s"""SELECT CAST($k AS BIGINT) AS k,
                   CAST(count(*) AS BIGINT) AS n_tasks,
                   CAST(sum(CAST(round((${caseSql(k)}) * 1e6, 0) AS BIGINT))
                     AS BIGINT) AS sum_micro,
                   CAST(sum(CASE WHEN round((${caseSql(k)}) * 1e6, 0) = 1e6
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_solved
            FROM tasks"""
      }.mkString("\nUNION ALL\n")
      s"""WITH tasks AS (
            SELECT user_id AS task, count(*) AS n,
                   sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                     AS c
            FROM events GROUP BY user_id)
          SELECT k, n_tasks,
                 round(CAST(sum_micro AS DOUBLE) / n_tasks / 1e6, 6)
                   AS mean_pass_at_k,
                 n_solved
          FROM ($arms)
          ORDER BY k"""
    })

  val all: Seq[Q] = Seq(passK)
}
