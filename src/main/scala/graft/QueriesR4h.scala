package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.LongType

import graft.engine.Engine

/** Round-3 batch 34: cross-document boilerplate detection, forecast
  * baseline evaluation (naive vs seasonal-naive), and a data-freshness
  * audit.
  */
object QueriesR4h {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Engine.table(s, dir, name)

  // ------------- curate_boilerplate: repeated sentences across docs

  private val boilerplate = Q(
    "curate_boilerplate",
    "Cross-document boilerplate detection — the web-corpus curation " +
      "step that strips repeated navigation/footer spans before " +
      "training (C4/RefinedWeb-style): each document is tokenized " +
      "(lower, non-alnum → space) and expanded into word 5-gram " +
      "spans; any span appearing in 3+ DISTINCT documents is " +
      "boilerplate. Explode → one hash groupBy on the span string " +
      "(at 100 TB: on its xxhash64, same plan) → top offenders with " +
      "document reach, total occurrences, and corpus share. The " +
      "groupBy's pre-image is exactly the per-doc strip mask a " +
      "cleaner would apply.",
    (s, d) => {
      val nDocs = t(s, d, "documents")
        .agg(count(lit(1)).as("n_docs_total"))
      // native tokenization (plans.AlnumTokens, round 13): one
      // compiled byte scan replaces the lower+regex+split+filter
      // chain — byte-identical tokens (TokenizeSpec), ~0.16 s/pass
      // of regex cost gone (TokProbe)
      val toks = t(s, d, "documents")
        .select(col("doc_id"),
          graft.plans.AlnumTokens(col("text")).as("toks"))
      // explicit two-level aggregation on ONE span-pinned exchange
      // (round 9; was countDistinct, whose expand rewrite shuffles the
      // heavy span strings twice): hash(span) clusters (span, doc) for
      // the first level and span itself for the second, so neither
      // groupBy adds an exchange after the repartition. The 1-row doc
      // total rides a cartesian instead of a broadcast build job.
      // No size(toks) >= 5 pre-filter (round 13 optimization): the
      // predicate pushed BELOW the tokenizing projection and duplicated
      // the whole regex tokenization per row (TokProbe: 0.20 → 0.40 s
      // for the stage) — and it is redundant here: NgramStrings is
      // total (size < 5 → EMPTY array) and explode drops empty arrays,
      // so short docs contribute no span rows either way.
      toks
        // native 5-gram build (plans.NgramStrings, round 13): the
        // round-12 incremental zip_with chain was still 4 interpreted
        // lambda levels per row — same strings, one compiled loop
        .select(col("doc_id"),
          explode(graft.plans.NgramStrings(col("toks"), 5)).as("span"))
        .repartition(col("span"))
        .groupBy("span", "doc_id").agg(count(lit(1)).as("c"))
        .groupBy("span")
        .agg(count(lit(1)).as("n_docs"), sum("c").as("n_occurrences"))
        .filter(col("n_docs") >= 3)
        .hint("shuffle_replicate_nl").crossJoin(nDocs)
        .select(col("span"), col("n_docs"), col("n_occurrences"),
          round(col("n_docs").cast("double") /
            col("n_docs_total").cast("double"), 6).as("doc_share"))
        .orderBy(desc("n_docs"), desc("n_occurrences"), col("span"))
        .limit(50)
    },
    Some("""WITH nd AS (SELECT count(*) AS n_docs_total FROM documents),
            toks AS (
              SELECT doc_id,
                     list_filter(regexp_split_to_array(
                       regexp_replace(lower(text), '[^a-z0-9 ]', ' ',
                         'g'), '\s+'), x -> x <> '') AS tk
              FROM documents),
            spans AS (
              SELECT doc_id,
                     array_to_string(tk[i:i+4], ' ') AS span
              FROM toks,
                   unnest(range(1, len(tk) - 3)) AS u(i)
              WHERE len(tk) >= 5),
            rep AS (
              SELECT span,
                     CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
                     CAST(count(*) AS BIGINT) AS n_occurrences
              FROM spans GROUP BY 1
              HAVING count(DISTINCT doc_id) >= 3)
            SELECT span, n_docs, n_occurrences,
                   round(CAST(n_docs AS DOUBLE) /
                         CAST(n_docs_total AS DOUBLE), 6) AS doc_share
            FROM rep, nd
            ORDER BY n_docs DESC, n_occurrences DESC, span
            LIMIT 50"""))

  // ------------- w27_forecast_baseline: naive vs seasonal-naive MAE

  private val forecastBaseline = Q(
    "w27_forecast_baseline",
    "Forecast-baseline shootout on the daily event series: one-step " +
      "MAE of the naive forecast (yesterday's value) vs the " +
      "seasonal-naive (same weekday last week) — the two baselines " +
      "every forecasting paper must beat, and the first diagnostic a " +
      "pipeline runs on a new series. Absolute errors are INTEGER " +
      "(|y_t − y_{t−k}| of exact counts), so both MAEs are one " +
      "division of exact sums; scored only where BOTH forecasts " +
      "exist, so the comparison is apples-to-apples. Lags are " +
      "user-keyed windows — one hash shuffle, any scale; the " +
      "per-user winner verdict comes along for free.",
    (s, d) => {
      val daily = t(s, d, "events")
        .filter(col("user_id") % 10 === 0)
        .groupBy(col("user_id"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("y"))
      val w = Window.partitionBy("user_id").orderBy("day")
      daily
        .withColumn("naive", lag("y", 1).over(w))
        .withColumn("snaive", lag("y", 7).over(w))
        .filter(col("naive").isNotNull && col("snaive").isNotNull)
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_scored"),
          sum(abs(col("y") - col("naive"))).cast(LongType)
            .as("naive_ae_sum"),
          sum(abs(col("y") - col("snaive"))).cast(LongType)
            .as("snaive_ae_sum"))
        .select(col("user_id"), col("n_scored"),
          round(col("naive_ae_sum").cast("double") /
            col("n_scored").cast("double"), 6).as("naive_mae"),
          round(col("snaive_ae_sum").cast("double") /
            col("n_scored").cast("double"), 6).as("snaive_mae"),
          when(col("snaive_ae_sum") < col("naive_ae_sum"),
            lit("seasonal"))
            .when(col("snaive_ae_sum") > col("naive_ae_sum"),
              lit("naive")).otherwise(lit("tie")).as("winner"))
        .transform(graft.engine.Ops.reportSort("user_id"))
    },
    Some("""WITH daily AS (
              SELECT user_id, CAST(ts AS DATE) AS day,
                     CAST(count(*) AS BIGINT) AS y
              FROM events WHERE user_id % 10 = 0 GROUP BY 1, 2),
            lagged AS (
              SELECT user_id, y,
                     lag(y, 1) OVER w AS naive,
                     lag(y, 7) OVER w AS snaive
              FROM daily
              WINDOW w AS (PARTITION BY user_id ORDER BY day)),
            scored AS (
              SELECT user_id,
                     CAST(count(*) AS BIGINT) AS n_scored,
                     CAST(sum(abs(y - naive)) AS BIGINT)
                       AS naive_ae_sum,
                     CAST(sum(abs(y - snaive)) AS BIGINT)
                       AS snaive_ae_sum
              FROM lagged
              WHERE naive IS NOT NULL AND snaive IS NOT NULL
              GROUP BY 1)
            SELECT user_id, n_scored,
                   round(CAST(naive_ae_sum AS DOUBLE) /
                         CAST(n_scored AS DOUBLE), 6) AS naive_mae,
                   round(CAST(snaive_ae_sum AS DOUBLE) /
                         CAST(n_scored AS DOUBLE), 6) AS snaive_mae,
                   CASE WHEN snaive_ae_sum < naive_ae_sum
                        THEN 'seasonal'
                        WHEN snaive_ae_sum > naive_ae_sum THEN 'naive'
                        ELSE 'tie' END AS winner
            FROM scored ORDER BY user_id"""))

  // ------------- dq_freshness: staleness audit per event stream

  private val freshness = Q(
    "dq_freshness",
    "Freshness/staleness audit per event stream — the first page of " +
      "any data-platform SLA dashboard: per event type, the last " +
      "arrival, days stale vs the corpus watermark (exact integer " +
      "datediff), event volume inside the trailing 7-day window, and " +
      "the share of lifetime volume that window represents. One " +
      "scalar watermark computed once and broadcast; per-type rollup " +
      "is a single hash groupBy with conditional sums — no second " +
      "pass over the data. Flags types whose trailing-window volume " +
      "collapsed (silent-upstream detection), which is a plain " +
      "integer comparison, not a heuristic.",
    (s, d) => {
      val wm = t(s, d, "events")
        .agg(max(to_date(col("ts"))).as("watermark"))
      t(s, d, "events")
        .select(col("event_type"), to_date(col("ts")).as("day"))
        .crossJoin(broadcast(wm))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_total"),
          max("day").as("last_day"),
          max("watermark").as("wmk"),
          sum((datediff(col("watermark"), col("day")) < 7)
            .cast(LongType)).cast(LongType).as("n_last7"))
        .select(col("event_type"), col("n_total"),
          date_format(col("last_day"), "yyyy-MM-dd").as("last_day"),
          datediff(col("wmk"), col("last_day")).cast(LongType)
            .as("days_stale"),
          col("n_last7"),
          round(col("n_last7").cast("double") /
            col("n_total").cast("double"), 6).as("last7_share"),
          (col("n_last7") * 52L < col("n_total")).as("volume_collapsed"))
        .transform(graft.engine.Ops.reportSort("event_type"))
    },
    Some("""WITH wm AS (SELECT max(CAST(ts AS DATE)) AS watermark
                        FROM events),
            per AS (
              SELECT event_type,
                     CAST(count(*) AS BIGINT) AS n_total,
                     max(CAST(ts AS DATE)) AS last_day,
                     max(watermark) AS wmk,
                     CAST(sum(CAST(date_diff('day', CAST(ts AS DATE),
                       watermark) < 7 AS BIGINT)) AS BIGINT) AS n_last7
              FROM events, wm GROUP BY 1)
            SELECT event_type, n_total,
                   strftime(last_day, '%Y-%m-%d') AS last_day,
                   CAST(date_diff('day', last_day, wmk) AS BIGINT)
                     AS days_stale,
                   n_last7,
                   round(CAST(n_last7 AS DOUBLE) /
                         CAST(n_total AS DOUBLE), 6) AS last7_share,
                   n_last7 * 52 < n_total AS volume_collapsed
            FROM per ORDER BY event_type"""))

  val all: Seq[Q] = Seq(boilerplate, forecastBaseline, freshness)
}
