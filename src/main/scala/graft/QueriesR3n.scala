package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.LongType

import graft.engine.Engine

/** Round-3 batch 14: cohort lifetime-value (the revenue companion to the
  * w6 retention matrix), the canonical star-schema broadcast rollup, and
  * a column-completeness profile emitted as rows via unpivot.
  */
object QueriesR3n {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Engine.table(s, dir, name)

  // ------------- w17_cohort_ltv: cohort revenue triangle + running LTV

  private val cohortLtv = Q(
    "w17_cohort_ltv",
    "Cohort lifetime-value triangle: users cohort by FIRST event week, " +
      "purchase revenue (exact cents — each double value rounds once, " +
      "sums are BIGINT) buckets by weeks-since-cohort, and a running " +
      "window turns the triangle into cumulative LTV per cohort — the " +
      "growth-analytics companion to the w6 retention matrix. One agg " +
      "for first-weeks, a user-keyed join, a small groupBy; the " +
      "cumulative window runs over |cohorts|×|weeks| rows, never " +
      "events.",
    (s, d) => {
      val ev = t(s, d, "events").select(col("user_id"), col("ts"),
        col("event_type"), col("value"))
      val firstWeek = ev.groupBy("user_id")
        .agg(date_trunc("week", min(col("ts"))).as("cohort_week"))
      val rev = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"),
          date_trunc("week", col("ts")).as("ev_week"),
          round(col("value") * 100, 0).cast(LongType).as("cents"))
      // ISO string, not DATE: pandas reads Spark's date32 as Timestamp
      // but DuckDB DATE as datetime.date — strings compare identically
      val cells = rev.join(firstWeek, "user_id")
        .select(date_format(col("cohort_week"), "yyyy-MM-dd")
          .as("cohort_week"),
          (datediff(col("ev_week"), col("cohort_week")) / 7)
            .cast(LongType).as("weeks_since"),
          col("cents"), col("user_id"))
        .groupBy("cohort_week", "weeks_since")
        .agg(countDistinct("user_id").as("buyers"),
          sum("cents").as("revenue_cents"))
      cells.withColumn("cum_ltv_cents",
          sum("revenue_cents").over(Window.partitionBy("cohort_week")
            .orderBy("weeks_since")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .transform(graft.engine.Ops.reportSort("cohort_week", "weeks_since"))
    },
    Some("""WITH fw AS (SELECT user_id,
                               date_trunc('week', min(ts)) AS cohort_week
                        FROM events GROUP BY 1),
            rev AS (SELECT user_id, date_trunc('week', ts) AS ev_week,
                           CAST(round(value * 100, 0) AS BIGINT) AS cents
                    FROM events WHERE event_type = 'purchase'),
            cells AS (
              SELECT strftime(cohort_week, '%Y-%m-%d') AS cohort_week,
                     CAST(date_diff('day', cohort_week, ev_week) // 7
                       AS BIGINT) AS weeks_since,
                     CAST(count(DISTINCT rev.user_id) AS BIGINT)
                       AS buyers,
                     CAST(sum(cents) AS BIGINT) AS revenue_cents
              FROM rev JOIN fw USING (user_id)
              GROUP BY 1, 2)
            SELECT cohort_week, weeks_since, buyers, revenue_cents,
                   CAST(sum(revenue_cents) OVER
                     (PARTITION BY cohort_week ORDER BY weeks_since
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS BIGINT) AS cum_ltv_cents
            FROM cells ORDER BY cohort_week, weeks_since"""))

  // ------------- j20_star_rollup: canonical star-schema rollup

  private val starRollup = Q(
    "j20_star_rollup",
    "The canonical star-schema rollup: fact orders joins the " +
      "customer→nation→region dimension chain (every dim " +
      "broadcast — zero fact-side shuffles until the final partial " +
      "agg) and rolls revenue up to region × order-priority. THE " +
      "warehouse query shape: at 100 TB the fact scan streams through " +
      "three broadcast hash joins and one 2-level hash aggregate; " +
      "revenue in exact cents.",
    (s, d) => {
      val dims = t(s, d, "customer")
        .select(col("c_custkey"), col("c_nationkey"))
        .join(broadcast(t(s, d, "nation")
          .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, d, "region")
          .select(col("r_regionkey"), col("r_name"))),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("c_custkey"), col("r_name").as("region"))
      t(s, d, "orders")
        .select(col("o_custkey"), col("o_orderpriority").as("priority"),
          round(col("o_totalprice") * 100, 0).cast(LongType).as("cents"))
        .join(broadcast(dims), col("o_custkey") === col("c_custkey"))
        .groupBy("region", "priority")
        .agg(count(lit(1)).as("n_orders"),
          sum("cents").as("revenue_cents"))
        .transform(graft.engine.Ops.reportSort("region", "priority"))
    },
    Some("""SELECT r_name AS region, o_orderpriority AS priority,
                   CAST(count(*) AS BIGINT) AS n_orders,
                   CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                     AS BIGINT) AS revenue_cents
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY 1, 2 ORDER BY region, priority"""))

  // ------------- dq_profile_unpivot: per-column completeness profile

  private val profile = Q(
    "dq_profile_unpivot",
    "Column-completeness profile AS ROWS — the data-profiling report " +
      "shape (one row per column: rows, nulls, blank-or-zero, exact " +
      "distinct): the customer table unpivots to (column, " +
      "string-value) pairs in the scan stage and ONE groupBy per " +
      "column computes every metric. The distinct shuffle carries " +
      "each column's value space only; at 100 TB the same plan runs " +
      "over a hash-sampled slice (curate_hash_sample composes in " +
      "front) — the unpivot itself is map-only.",
    (s, d) => {
      val src = t(s, d, "customer")
      val cols = Seq(
        ("c_custkey", col("c_custkey").cast("string")),
        ("c_name", col("c_name")),
        ("c_nationkey", col("c_nationkey").cast("string")),
        ("c_acctbal", round(col("c_acctbal") * 100, 0).cast(LongType)
          .cast("string")),
        ("c_mktsegment", col("c_mktsegment")))
      src.select(explode(array(cols.map { case (n, c) =>
          struct(lit(n).as("column"), c.as("val"))
        }: _*)).as("r"))
        .select(col("r.column").as("column"), col("r.val").as("val"))
        .groupBy("column")
        .agg(count(lit(1)).as("n_rows"),
          sum(col("val").isNull.cast(LongType)).as("n_null"),
          sum((col("val") === "" || col("val") === "0")
            .cast(LongType)).as("n_blank_or_zero"),
          countDistinct("val").as("n_distinct"))
        .transform(graft.engine.Ops.reportSort("column"))
    },
    Some("""WITH unp AS (
              SELECT 'c_custkey' AS "column",
                     CAST(c_custkey AS VARCHAR) AS val FROM customer
              UNION ALL
              SELECT 'c_name', c_name FROM customer
              UNION ALL
              SELECT 'c_nationkey', CAST(c_nationkey AS VARCHAR)
              FROM customer
              UNION ALL
              SELECT 'c_acctbal',
                     CAST(CAST(round(c_acctbal * 100, 0) AS BIGINT)
                       AS VARCHAR)
              FROM customer
              UNION ALL
              SELECT 'c_mktsegment', c_mktsegment FROM customer)
            SELECT "column",
                   CAST(count(*) AS BIGINT) AS n_rows,
                   CAST(sum(CAST(val IS NULL AS BIGINT)) AS BIGINT)
                     AS n_null,
                   CAST(sum(CAST(val = '' OR val = '0' AS BIGINT))
                     AS BIGINT) AS n_blank_or_zero,
                   CAST(count(DISTINCT val) AS BIGINT) AS n_distinct
            FROM unp GROUP BY 1 ORDER BY "column" """))

  val all: Seq[Q] = Seq(cohortLtv, starRollup, profile)
}
