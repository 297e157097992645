package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.LongType

import graft.engine.Engine
import graft.operators.Dedup

/** Round-3 batch 24: Kaplan-Meier survival with censoring, deterministic
  * rejection sampling to flatten a skewed distribution, and day-of-week
  * seasonality indices.
  */
object QueriesR3x {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Engine.table(s, dir, name)

  // ------------- stat_survival_km: Kaplan-Meier with censoring

  private val survival = Q(
    "stat_survival_km",
    "Kaplan-Meier survival curve over user lifetimes (first event to " +
      "last, in days) WITH censoring — users still active in the final " +
      "week of the corpus are censored, not churned, which is exactly " +
      "the distinction a naive churn histogram gets wrong. Lifetimes " +
      "aggregate per user (one key shuffle), then the curve computes on " +
      "the per-duration rollup — the global at-risk/product windows run " +
      "over at most horizon-days rows, never the user table, so the " +
      "single-partition window is bounded at any corpus size (same " +
      "discipline as the ECDF queries). The product folds as " +
      "exp(sum(ln)) on both engines; a cummax flag pins S(t)=0 exactly " +
      "once a duration absorbs its whole risk set.",
    (s, d) => {
      val ev = t(s, d, "events")
        .select(col("user_id"), unix_timestamp(col("ts")).as("sec"))
      val mx = ev.agg(max("sec").as("mx"))
      val life = ev.groupBy("user_id")
        .agg(min("sec").as("first_sec"), max("sec").as("last_sec"))
        .crossJoin(broadcast(mx))
        .select(
          ((col("last_sec") - col("first_sec")) / 86400L).cast(LongType)
            .as("dur_days"),
          (col("last_sec") >= col("mx") - 7L * 86400L).cast(LongType)
            .as("censored"))
      val perDur = life.groupBy("dur_days")
        .agg(sum(lit(1L) - col("censored")).cast(LongType).as("d"),
          sum("censored").cast(LongType).as("c"))
      val w = Window.orderBy("dur_days")
      val wPrev = w.rowsBetween(Window.unboundedPreceding, -1)
      val wPref = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val total = perDur.agg(sum(col("d") + col("c")).cast(LongType)
        .as("n_total"))
      perDur.crossJoin(broadcast(total))
        .withColumn("n_at_risk",
          col("n_total") -
            coalesce(sum(col("d") + col("c")).over(wPrev), lit(0L)))
        .withColumn("dead_end",
          max((col("d") === col("n_at_risk")).cast(LongType)).over(wPref))
        .withColumn("survival",
          when(col("dead_end") === 1L, lit(0.0)).otherwise(
            round(exp(sum(
              when(col("d") < col("n_at_risk"),
                log(lit(1.0) - col("d") / col("n_at_risk")))
                .otherwise(lit(0.0))).over(wPref)), 6)))
        .select(col("dur_days"), col("n_at_risk"), col("d").as("n_events"),
          col("c").as("n_censored"), col("survival"))
        .transform(graft.engine.Ops.reportSort("dur_days"))
    },
    Some("""WITH ev AS (SELECT user_id, epoch_us(ts) // 1000000 AS sec
                        FROM events),
            mx AS (SELECT max(sec) AS mx FROM ev),
            life AS (
              SELECT (max(sec) - min(sec)) // 86400 AS dur_days,
                     CAST(max(sec) >= (SELECT mx FROM mx) - 7 * 86400
                       AS BIGINT) AS censored
              FROM ev GROUP BY user_id),
            per_dur AS (
              SELECT dur_days,
                     CAST(sum(1 - censored) AS BIGINT) AS d,
                     CAST(sum(censored) AS BIGINT) AS c
              FROM life GROUP BY 1),
            curve AS (
              SELECT dur_days, d, c,
                     CAST((SELECT sum(d + c) FROM per_dur) AS BIGINT)
                       - CAST(coalesce(sum(d + c) OVER
                           (ORDER BY dur_days
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND 1 PRECEDING), 0) AS BIGINT) AS n_at_risk
              FROM per_dur),
            flagged AS (
              SELECT *,
                     max(CASE WHEN d = n_at_risk THEN 1 ELSE 0 END) OVER
                       (ORDER BY dur_days
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS dead_end,
                     sum(CASE WHEN d < n_at_risk
                              THEN ln(1.0 - CAST(d AS DOUBLE) / n_at_risk)
                              ELSE 0.0 END) OVER
                       (ORDER BY dur_days
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS log_s
              FROM curve)
            SELECT dur_days, n_at_risk, d AS n_events, c AS n_censored,
                   CASE WHEN dead_end = 1 THEN 0.0
                        ELSE round(exp(log_s), 6) END AS survival
            FROM flagged ORDER BY dur_days"""))

  // ------------- curate_rejection_sample: flatten a skewed distribution

  private val rejection = Q(
    "curate_rejection_sample",
    "Deterministic rejection sampling that FLATTENS the corpus's skewed " +
      "source distribution to its smallest source: per-source acceptance " +
      "rates (basis points, from the broadcast histogram) gate each doc " +
      "by content-stable hash — md5-prefix mod 10000 < rate — so the " +
      "same doc keeps/drops on every run, engine, and partitioning " +
      "(rand() would not). The balanced-corpus downsample every " +
      "training pipeline runs; map-only after one tiny histogram, and " +
      "the audit emits per-source before/after/rate plus the achieved " +
      "flatness. Accepted counts land within integer-hash noise of the " +
      "min-source target.",
    (s, d) => {
      val docs = t(s, d, "documents")
      val hist = docs.groupBy("source").agg(count(lit(1)).as("n_before"))
      val mn = hist.agg(min("n_before").as("n_min"))
      val rates = hist.crossJoin(broadcast(mn))
        .select(col("source"), col("n_before"),
          expr("(n_min * 10000) div n_before").as("accept_bp"))
      docs.join(broadcast(rates), "source")
        .filter(Dedup.tokenId(col("doc_id").cast("string")) % 10000 <
          col("accept_bp"))
        .groupBy(col("source"), col("n_before"), col("accept_bp"))
        .agg(count(lit(1)).as("n_after"))
        .select("source", "n_before", "accept_bp", "n_after")
        .transform(graft.engine.Ops.reportSort("source"))
    },
    Some("""WITH hist AS (SELECT source, CAST(count(*) AS BIGINT)
                            AS n_before
                          FROM documents GROUP BY 1),
            mn AS (SELECT min(n_before) AS n_min FROM hist),
            rates AS (SELECT source, n_before,
                             (SELECT n_min FROM mn) * 10000 // n_before
                               AS accept_bp
                      FROM hist)
            SELECT source, n_before, accept_bp,
                   CAST(count(*) AS BIGINT) AS n_after
            FROM documents JOIN rates USING (source)
            WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                    ::BIGINT % 10000 < accept_bp
            GROUP BY source, n_before, accept_bp
            ORDER BY source"""))

  // ------------- stat_seasonal_dow: day-of-week seasonality indices

  private val seasonal = Q(
    "stat_seasonal_dow",
    "Day-of-week seasonality index per event type: each (type, ISO dow) " +
      "cell's share of the type's volume, scaled so a flat week reads " +
      "10000 bp on every day (count*7*10000 div total) — the " +
      "multiplicative seasonal factor a forecaster divides out before " +
      "trending, kept integer-exact. One groupBy plus a per-type total " +
      "join; 7 rows per type forever, regardless of corpus size.",
    (s, d) => {
      val ev = t(s, d, "events")
        .select(col("event_type"), (weekday(col("ts")) + 1).as("isodow"))
      val cell = ev.groupBy("event_type", "isodow")
        .agg(count(lit(1)).as("n"))
      val tot = ev.groupBy("event_type").agg(count(lit(1)).as("total"))
      cell.join(tot, "event_type")
        .select(col("event_type"), col("isodow").cast(LongType)
            .as("isodow"), col("n"),
          expr("(n * 7 * 10000) div total").as("seasonal_bp"))
        .transform(graft.engine.Ops.reportSort("event_type", "isodow"))
    },
    Some("""WITH ev AS (SELECT event_type,
                               CAST(isodow(ts) AS BIGINT) AS isodow
                        FROM events),
            cell AS (SELECT event_type, isodow,
                            CAST(count(*) AS BIGINT) AS n
                     FROM ev GROUP BY 1, 2),
            tot AS (SELECT event_type, CAST(count(*) AS BIGINT) AS total
                    FROM ev GROUP BY 1)
            SELECT event_type, isodow, n,
                   n * 7 * 10000 // total AS seasonal_bp
            FROM cell JOIN tot USING (event_type)
            ORDER BY event_type, isodow"""))

  val all: Seq[Q] = Seq(survival, rejection, seasonal)
}
