package graft

import graft.engine.Ck.Ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.{DoubleType, LongType}

import graft.engine.Engine

/** Round-5 batch 14: Chatterjee ξ correlation, forecast-interval
  * coverage, 2-D corpus profile histogram.
  */
object QueriesR5p {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Engine.table(s, dir, name)

  // ------- stat_xi_correlation: Chatterjee's rank correlation, both ways

  private val xiCorr = Q(
    "stat_xi_correlation",
    "Chatterjee's ξ (2020) between daily order count and daily revenue, " +
      "in BOTH directions — the modern dependence coefficient that (a) " +
      "detects any functional relationship, not just monotone ones, " +
      "and (b) is deliberately asymmetric (ξ(x→y) ≈ 'is y a function " +
      "of x'): rows sort by the conditioning variable (day tie-break, " +
      "deterministic), r_i = #{y_j ≤ y_i} via a RANGE-frame count, and " +
      "ξ = 1 − 3Σ|r_{i+1}−r_i|/(n²−1) from integer rank hops. All " +
      "windows ride the calendar-bounded daily frame; both directions " +
      "reuse one daily rollup.",
    (s, d) => {
      val daily = t(s, d, "orders")
        .groupBy(date_format(col("o_orderdate"), "yyyy-MM-dd").as("day"))
        .agg(count(lit(1)).as("x"),
          sum(round(col("o_totalprice") * 100, 0).cast(LongType))
            .as("y"))
        .ckpt(true)
      def xi(cond: String, resp: String, label: String): DataFrame = {
        val wRank = Window.partitionBy(lit(1)).orderBy(resp)
          .rangeBetween(Window.unboundedPreceding, Window.currentRow)
        val wSort = Window.partitionBy(lit(1)).orderBy(cond, "day")
        val hops = daily
          .withColumn("r", count(lit(1)).over(wRank))
          .withColumn("rl", lag("r", 1).over(wSort))
          .filter(col("rl").isNotNull)
          .agg(count(lit(1)).as("n1"),
            sum(abs(col("r") - col("rl"))).as("hops"))
        hops.select(lit(label).as("direction"),
          (col("n1") + 1).as("n_days"),
          round((lit(1.0) - lit(3.0) * col("hops").cast(DoubleType) /
            ((col("n1") + 1).cast(DoubleType) *
              (col("n1") + 1).cast(DoubleType) - 1.0)) * 1e6, 0)
            .cast(LongType).as("xi_micro"))
      }
      xi("x", "y", "orders->revenue")
        .unionByName(xi("y", "x", "revenue->orders"))
        .transform(graft.engine.Ops.reportSort("direction"))
    },
    Some("""WITH daily AS (
              SELECT strftime(o_orderdate, '%Y-%m-%d') AS day,
                     CAST(count(*) AS BIGINT) AS x,
                     CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                       AS BIGINT) AS y
              FROM orders GROUP BY 1),
            fwd AS (
              SELECT CAST(count(*) AS BIGINT) AS n1,
                     CAST(sum(abs(r - rl)) AS BIGINT) AS hops
              FROM (SELECT r, lag(r) OVER (ORDER BY x, day) AS rl
                    FROM (SELECT day, x,
                                 count(*) OVER (ORDER BY y RANGE BETWEEN
                                   UNBOUNDED PRECEDING AND CURRENT ROW)
                                   AS r
                          FROM daily))
              WHERE rl IS NOT NULL),
            bwd AS (
              SELECT CAST(count(*) AS BIGINT) AS n1,
                     CAST(sum(abs(r - rl)) AS BIGINT) AS hops
              FROM (SELECT r, lag(r) OVER (ORDER BY y, day) AS rl
                    FROM (SELECT day, y,
                                 count(*) OVER (ORDER BY x RANGE BETWEEN
                                   UNBOUNDED PRECEDING AND CURRENT ROW)
                                   AS r
                          FROM daily))
              WHERE rl IS NOT NULL)
            SELECT 'orders->revenue' AS direction, n1 + 1 AS n_days,
                   CAST(round((1.0 - 3.0 * CAST(hops AS DOUBLE) /
                     (CAST(n1 + 1 AS DOUBLE) * (n1 + 1) - 1.0)) * 1e6, 0)
                     AS BIGINT) AS xi_micro
            FROM fwd
            UNION ALL
            SELECT 'revenue->orders', n1 + 1,
                   CAST(round((1.0 - 3.0 * CAST(hops AS DOUBLE) /
                     (CAST(n1 + 1 AS DOUBLE) * (n1 + 1) - 1.0)) * 1e6, 0)
                     AS BIGINT)
            FROM bwd
            ORDER BY direction"""))

  // ------- w31_interval_coverage: do the P10/P90 bands actually cover?

  private val intervalCoverage = Q(
    "w31_interval_coverage",
    "Forecast-interval calibration — the check that turns a point " +
      "baseline (w27) into a usable band: naive one-step residuals on " +
      "the first 80% of days give empirical P10/P90 limits (exact " +
      "percentiles of integer cents), and the held-out 20% measures " +
      "actual coverage vs the 80% nominal — the backtest every " +
      "quantile forecaster must pass. The chronological split is a " +
      "row-number cut on the calendar-bounded daily frame; residuals " +
      "are exact lags; the verdict is one fold.",
    (s, d) => {
      val w = Window.partitionBy(lit(1)).orderBy("day")
      val daily = t(s, d, "orders")
        .groupBy(date_format(col("o_orderdate"), "yyyy-MM-dd").as("day"))
        .agg(sum(round(col("o_totalprice") * 100, 0).cast(LongType))
          .as("y"))
        .withColumn("res", col("y") - lag("y", 1).over(w))
        .withColumn("rn", row_number().over(w))
        .withColumn("n", count(lit(1)).over(Window.partitionBy(lit(1))))
        .filter(col("res").isNotNull)
        .ckpt(true)
      val train = daily.filter(col("rn") <= expr("(n * 8) div 10"))
      val lims = train.agg(count(lit(1)).as("n_train"),
        round(expr("percentile(res, 0.1)"), 1).as("q10"),
        round(expr("percentile(res, 0.9)"), 1).as("q90"))
      def dd(c: String) = col(c).cast(DoubleType)
      daily.filter(col("rn") > expr("(n * 8) div 10"))
        .crossJoin(broadcast(lims))
        .agg(first("n_train").as("n_train"),
          count(lit(1)).as("n_test"),
          first("q10").as("q10d"), first("q90").as("q90d"),
          sum(when(col("res") >= col("q10") &&
            col("res") <= col("q90"), 1L).otherwise(0L)).as("covered"))
        .select(col("n_train"), col("n_test"),
          round(col("q10d") * 10, 0).cast(LongType).as("q10_decicents"),
          round(col("q90d") * 10, 0).cast(LongType).as("q90_decicents"),
          col("covered"),
          round(dd("covered") * 1e6 / dd("n_test"), 0).cast(LongType)
            .as("coverage_micro"),
          lit(800000L).as("nominal_micro"))
    },
    Some("""WITH daily AS (
              SELECT day, y,
                     y - lag(y) OVER (ORDER BY day) AS res,
                     row_number() OVER (ORDER BY day) AS rn,
                     count(*) OVER () AS n
              FROM (SELECT strftime(o_orderdate, '%Y-%m-%d') AS day,
                           CAST(sum(CAST(round(o_totalprice * 100, 0)
                             AS BIGINT)) AS BIGINT) AS y
                    FROM orders GROUP BY 1)
              QUALIFY res IS NOT NULL),
            lims AS (
              SELECT CAST(count(*) AS BIGINT) AS n_train,
                     round(quantile_cont(res, 0.1), 1) AS q10,
                     round(quantile_cont(res, 0.9), 1) AS q90
              FROM daily WHERE rn <= (n * 8) // 10)
            SELECT n_train, CAST(count(*) AS BIGINT) AS n_test,
                   CAST(round(q10 * 10, 0) AS BIGINT) AS q10_decicents,
                   CAST(round(q90 * 10, 0) AS BIGINT) AS q90_decicents,
                   CAST(sum(CASE WHEN res >= q10 AND res <= q90
                     THEN 1 ELSE 0 END) AS BIGINT) AS covered,
                   CAST(round(CAST(sum(CASE WHEN res >= q10 AND
                       res <= q90 THEN 1 ELSE 0 END) AS DOUBLE) * 1e6 /
                     count(*), 0) AS BIGINT) AS coverage_micro,
                   CAST(800000 AS BIGINT) AS nominal_micro
            FROM daily CROSS JOIN lims
            WHERE rn > (n * 8) // 10
            GROUP BY n_train, q10, q90"""))

  // ------- curate_joint_histogram: the 2-D corpus profile

  private val jointHistogram = Q(
    "curate_joint_histogram",
    "Joint length × lexical-diversity histogram — the 2-D corpus " +
      "profile a curator reads before setting ANY 1-D filter (length " +
      "and diversity cuts interact; marginals alone hide the " +
      "short-and-repetitive corner that matters): docs bucket by " +
      "token-length band (100-token bins, capped at 9) and " +
      "distinct-token-ratio decile, grid cells carry counts, corpus " +
      "share, and BOTH conditional marginal shares (via windows over " +
      "the ≤100-row grid — bounded at any corpus size). Map-side " +
      "per-doc bucketing, one grid rollup.",
    (s, d) => {
      val binned = t(s, d, "documents")
        .select(size(split(col("text"), " ")).cast(LongType).as("len"),
          size(array_distinct(split(col("text"), " "))).cast(LongType)
            .as("dtok"))
        .select(least(expr("len div 100"), lit(9L)).as("len_band"),
          least(expr("(dtok * 10) div len"), lit(9L)).as("ttr_decile"))
      val grid = binned.groupBy("len_band", "ttr_decile")
        .agg(count(lit(1)).as("n_docs"))
      val wAll = Window.partitionBy(lit(1))
      val wRow = Window.partitionBy("len_band")
      val wCol = Window.partitionBy("ttr_decile")
      def dd(c: String) = col(c).cast(DoubleType)
      grid
        .withColumn("tot", sum("n_docs").over(wAll))
        .withColumn("rowt", sum("n_docs").over(wRow))
        .withColumn("colt", sum("n_docs").over(wCol))
        .select(col("len_band"), col("ttr_decile"), col("n_docs"),
          round(dd("n_docs") * 1e6 / dd("tot"), 0).cast(LongType)
            .as("share_micro"),
          round(dd("n_docs") * 1e6 / dd("rowt"), 0).cast(LongType)
            .as("share_of_len_band_micro"),
          round(dd("n_docs") * 1e6 / dd("colt"), 0).cast(LongType)
            .as("share_of_ttr_decile_micro"))
        .transform(graft.engine.Ops.reportSort("len_band", "ttr_decile"))
    },
    Some("""WITH binned AS (
              SELECT least(len // 100, 9) AS len_band,
                     least((dtok * 10) // len, 9) AS ttr_decile
              FROM (SELECT CAST(len(string_split(text, ' ')) AS BIGINT)
                             AS len,
                           CAST(len(list_distinct(string_split(text,
                             ' '))) AS BIGINT) AS dtok
                    FROM documents)),
            grid AS (
              SELECT len_band, ttr_decile,
                     CAST(count(*) AS BIGINT) AS n_docs
              FROM binned GROUP BY 1, 2)
            SELECT len_band, ttr_decile, n_docs,
                   CAST(round(CAST(n_docs AS DOUBLE) * 1e6 /
                     sum(n_docs) OVER (), 0) AS BIGINT) AS share_micro,
                   CAST(round(CAST(n_docs AS DOUBLE) * 1e6 /
                     sum(n_docs) OVER (PARTITION BY len_band), 0)
                     AS BIGINT) AS share_of_len_band_micro,
                   CAST(round(CAST(n_docs AS DOUBLE) * 1e6 /
                     sum(n_docs) OVER (PARTITION BY ttr_decile), 0)
                     AS BIGINT) AS share_of_ttr_decile_micro
            FROM grid ORDER BY len_band, ttr_decile"""))

  val all: Seq[Q] = Seq(xiCorr, intervalCoverage, jointHistogram)
}
