package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.LongType

import graft.engine.Engine

/** Round-3 batch 31: model-evaluation surfaces — rank-based ROC AUC,
  * a calibration (reliability) table, and a decile lift/gains table.
  * The synthetic "model" throughout: o_totalprice scores the order,
  * o_orderstatus = 'F' is the positive class (did the order fulfill).
  */
object QueriesR4e {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Engine.table(s, dir, name)

  // ------------- ml_auc_rank: per-segment ROC AUC via rank sums

  private val auc = Q(
    "ml_auc_rank",
    "Per-segment ROC AUC by the Mann-Whitney rank identity — AUC = " +
      "(R+ − n+(n+ +1)/2)/(n+·n−) where R+ is the positives' rank sum — " +
      "kept integer-exact under ties by summing 2·avg_rank = 2·rank() + " +
      "tie_count − 1 (an integer per row), so the only float is the " +
      "final division of exact integers, identical on both engines. " +
      "Both windows are PARTITIONED by the segment key (never global): " +
      "the shuffle is one hash exchange on segment, the same plan at " +
      "any corpus size. A single GLOBAL AUC at 100 TB would instead " +
      "bin scores into a fixed histogram and trapezoid it (a17's " +
      "shape); the per-key form here is what eval dashboards actually " +
      "chart.",
    (s, d) => {
      val scored = t(s, d, "orders")
        .join(t(s, d, "customer"),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_mktsegment").as("segment"),
          col("o_totalprice").as("score"),
          (col("o_orderstatus") === "F").cast(LongType).as("pos"))
      val wRank = Window.partitionBy("segment").orderBy("score")
      val wTie = Window.partitionBy("segment", "score")
      scored
        .withColumn("two_avg_rank",
          lit(2L) * rank().over(wRank).cast(LongType) +
            count(lit(1)).over(wTie).cast(LongType) - lit(1L))
        .groupBy("segment")
        .agg(sum(when(col("pos") === 1L, col("two_avg_rank"))
            .otherwise(0L)).cast(LongType).as("sum2r"),
          sum(col("pos")).cast(LongType).as("n_pos"),
          sum(lit(1L) - col("pos")).cast(LongType).as("n_neg"))
        .select(col("segment"), col("n_pos"), col("n_neg"),
          round((col("sum2r") - col("n_pos") * (col("n_pos") + 1L))
            .cast("double") /
            (lit(2L) * col("n_pos") * col("n_neg")).cast("double"), 6)
            .as("auc"))
        .transform(graft.engine.Ops.reportSort("segment"))
    },
    Some("""WITH scored AS (
              SELECT c_mktsegment AS segment, o_totalprice AS score,
                     CAST(o_orderstatus = 'F' AS BIGINT) AS pos
              FROM orders JOIN customer ON o_custkey = c_custkey),
            ranked AS (
              SELECT segment, pos,
                     2 * CAST(rank() OVER (PARTITION BY segment
                                           ORDER BY score) AS BIGINT)
                       + CAST(count(*) OVER (PARTITION BY segment, score)
                              AS BIGINT) - 1 AS two_avg_rank
              FROM scored),
            agg AS (
              SELECT segment,
                     CAST(sum(CASE WHEN pos = 1 THEN two_avg_rank
                              ELSE 0 END) AS BIGINT) AS sum2r,
                     CAST(sum(pos) AS BIGINT) AS n_pos,
                     CAST(sum(1 - pos) AS BIGINT) AS n_neg
              FROM ranked GROUP BY 1)
            SELECT segment, n_pos, n_neg,
                   round(CAST(sum2r - n_pos * (n_pos + 1) AS DOUBLE) /
                         CAST(2 * n_pos * n_neg AS DOUBLE), 6) AS auc
            FROM agg ORDER BY segment"""))

  // ------------- ml_calibration: reliability table, integer binning

  private val calib = Q(
    "ml_calibration",
    "Calibration (reliability) table: the score is normalized to a " +
      "pseudo-probability against the global max and binned into 10 " +
      "fixed-width buckets ENTIRELY in integer arithmetic — bin = " +
      "(cents·10) div max_cents capped at 9 — so bin edges cannot " +
      "drift between engines. One scalar max is computed once and " +
      "broadcast; binning is map-side; the rollup is 10 groups. " +
      "Per bin: count, positives, mean predicted probability and " +
      "empirical positive rate (each ONE division of exact BIGINTs, " +
      "rounded), plus the signed calibration gap. The 100 TB plan is " +
      "identical — scalar agg, broadcast, map, 10-group rollup.",
    (s, d) => {
      val cents = t(s, d, "orders")
        .select(round(col("o_totalprice") * 100).cast(LongType)
          .as("cents"),
          (col("o_orderstatus") === "F").cast(LongType).as("pos"))
      val mx = cents.agg(max("cents").as("max_cents"))
      cents.crossJoin(broadcast(mx))
        .withColumn("bin",
          least(expr("(cents * 10) div max_cents"), lit(9L)))
        .groupBy("bin")
        .agg(count(lit(1)).as("n"),
          sum("pos").cast(LongType).as("n_pos"),
          sum("cents").cast(LongType).as("sum_cents"),
          max("max_cents").as("mc"))
        .select(col("bin"), col("n"), col("n_pos"),
          round(col("sum_cents").cast("double") /
            (col("n") * col("mc")).cast("double"), 6).as("mean_p"),
          round(col("n_pos").cast("double") / col("n").cast("double"), 6)
            .as("frac_pos"),
          round(col("sum_cents").cast("double") /
            (col("n") * col("mc")).cast("double") -
            col("n_pos").cast("double") / col("n").cast("double"), 6)
            .as("gap"))
        .transform(graft.engine.Ops.reportSort("bin"))
    },
    Some("""WITH cents AS (
              SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
                     CAST(o_orderstatus = 'F' AS BIGINT) AS pos
              FROM orders),
            mx AS (SELECT max(cents) AS max_cents FROM cents),
            binned AS (
              SELECT least((cents * 10) // max_cents, 9) AS bin,
                     pos, cents, max_cents
              FROM cents, mx)
            SELECT bin, CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(pos) AS BIGINT) AS n_pos,
                   round(CAST(sum(cents) AS DOUBLE) /
                         CAST(count(*) * max(max_cents) AS DOUBLE), 6)
                     AS mean_p,
                   round(CAST(sum(pos) AS DOUBLE) /
                         CAST(count(*) AS DOUBLE), 6) AS frac_pos,
                   round(CAST(sum(cents) AS DOUBLE) /
                         CAST(count(*) * max(max_cents) AS DOUBLE) -
                         CAST(sum(pos) AS DOUBLE) /
                         CAST(count(*) AS DOUBLE), 6) AS gap
            FROM binned GROUP BY 1 ORDER BY bin"""))

  // ------------- ml_lift_gains: decile gains via broadcast breakpoints

  private val lift = Q(
    "ml_lift_gains",
    "Decile lift & cumulative-gains table — the campaign-targeting " +
      "readout: 'if I contact the top k deciles by score, what share " +
      "of positives do I capture?'. Deciles come from 9 percentile " +
      "breakpoints computed ONCE and broadcast (the w23_rfm " +
      "discipline — no global ntile, which is a single-partition " +
      "window at scale); the per-row decile is a map-side comparison " +
      "fan. Cumulative sums then run top-decile-down over exactly 10 " +
      "rows — a bounded window, safe on any corpus. Lift = " +
      "(cum_pos·total_n)/(cum_n·total_pos), one float division of " +
      "exact integers, rounded. At 100 TB the exact percentile " +
      "becomes approx_percentile with an identical downstream plan.",
    (s, d) => {
      val scored = t(s, d, "orders")
        .select(round(col("o_totalprice") * 100).cast(LongType)
          .as("cents"),
          (col("o_orderstatus") === "F").cast(LongType).as("pos"))
      val bp = scored.agg(expr(
        "percentile(cents, array(0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9))")
        .as("b"))
      val decile: Column =
        (1 to 9).map(i => (col("cents") > element_at(col("b"), i))
          .cast(LongType)).reduce(_ + _) + lit(1L)
      val perDecile = scored.crossJoin(broadcast(bp))
        .select(decile.as("decile"), col("pos"))
        .groupBy("decile")
        .agg(count(lit(1)).as("n"), sum("pos").cast(LongType).as("n_pos"))
      val wCum = Window.orderBy(desc("decile"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wAll = Window.orderBy(desc("decile"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      perDecile
        .withColumn("cum_n", sum("n").over(wCum).cast(LongType))
        .withColumn("cum_pos", sum("n_pos").over(wCum).cast(LongType))
        .withColumn("tot_n", sum("n").over(wAll).cast(LongType))
        .withColumn("tot_pos", sum("n_pos").over(wAll).cast(LongType))
        .select(col("decile"), col("n"), col("n_pos"), col("cum_n"),
          col("cum_pos"),
          round(col("cum_pos").cast("double") /
            col("tot_pos").cast("double"), 6).as("cum_gain"),
          round((col("cum_pos") * col("tot_n")).cast("double") /
            (col("cum_n") * col("tot_pos")).cast("double"), 6).as("lift"))
        .transform(graft.engine.Ops.reportSort(desc("decile")))
    },
    Some("""WITH scored AS (
              SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
                     CAST(o_orderstatus = 'F' AS BIGINT) AS pos
              FROM orders),
            bp AS (SELECT quantile_cont(cents,
                     [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS b
                   FROM scored),
            deciled AS (
              SELECT 1 + CAST(cents > b[1] AS BIGINT)
                       + CAST(cents > b[2] AS BIGINT)
                       + CAST(cents > b[3] AS BIGINT)
                       + CAST(cents > b[4] AS BIGINT)
                       + CAST(cents > b[5] AS BIGINT)
                       + CAST(cents > b[6] AS BIGINT)
                       + CAST(cents > b[7] AS BIGINT)
                       + CAST(cents > b[8] AS BIGINT)
                       + CAST(cents > b[9] AS BIGINT) AS decile, pos
              FROM scored, bp),
            per AS (
              SELECT decile, CAST(count(*) AS BIGINT) AS n,
                     CAST(sum(pos) AS BIGINT) AS n_pos
              FROM deciled GROUP BY 1),
            cum AS (
              SELECT decile, n, n_pos,
                     CAST(sum(n) OVER w AS BIGINT) AS cum_n,
                     CAST(sum(n_pos) OVER w AS BIGINT) AS cum_pos,
                     CAST(sum(n) OVER a AS BIGINT) AS tot_n,
                     CAST(sum(n_pos) OVER a AS BIGINT) AS tot_pos
              FROM per
              WINDOW w AS (ORDER BY decile DESC
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW),
                     a AS (ORDER BY decile DESC
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND UNBOUNDED FOLLOWING))
            SELECT decile, n, n_pos, cum_n, cum_pos,
                   round(CAST(cum_pos AS DOUBLE) /
                         CAST(tot_pos AS DOUBLE), 6) AS cum_gain,
                   round(CAST(cum_pos * tot_n AS DOUBLE) /
                         CAST(cum_n * tot_pos AS DOUBLE), 6) AS lift
            FROM cum ORDER BY decile DESC"""))

  val all: Seq[Q] = Seq(auc, calib, lift)
}
