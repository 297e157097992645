package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.LongType

import graft.engine.Engine
import graft.operators.Dedup

/** Round-3 batch 33: fixed-point EWMA smoothing, sentence segmentation
  * statistics, and the hashing-trick featurizer with its collision
  * diagnostic.
  */
object QueriesR4g {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Engine.table(s, dir, name)

  // EWMA weights: w_k = round(1e6 · α(1−α)^k), α = 0.3, k = 0..9.
  // Hardcoded identically on both engines so the smoothed value is an
  // exact integer dot product; truncating at 10 lags keeps 97.2% of the
  // geometric mass ((1−α)^10 ≈ 0.028) — the standard windowed-EWMA
  // trade-off, and what makes the op a bounded window instead of an
  // unbounded recurrence (which distributed engines cannot run).
  private val EwmaW =
    Seq(300000L, 210000L, 147000L, 102900L, 72030L,
      50421L, 35295L, 24706L, 17294L, 12106L)
  private val EwmaWSum = EwmaW.sum // 971752

  // ------------- w25_ewma: fixed-point exponential smoothing

  private val ewma = Q(
    "w25_ewma",
    "Exponentially weighted moving average of each user's daily event " +
      "counts in FIXED-POINT: the 10 geometric weights round(1e6·" +
      "0.3·0.7^k) are hardcoded identically on both engines, so the " +
      "smoothed value is an exact integer dot product over a 10-row " +
      "user-keyed window (10 lag() taps — codegen-friendly, no " +
      "unbounded recurrence, which is what makes EWMA distributable " +
      "at all) divided once by the weight mass. Full windows only; " +
      "lags are over OBSERVED days (documented — gap-fill is w12's " +
      "job). One hash shuffle on the user key at any scale.",
    (s, d) => {
      val daily = t(s, d, "events")
        .filter(col("user_id") % 25 === 0)
        .groupBy(col("user_id"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("y"))
      val w = Window.partitionBy("user_id").orderBy("day")
      val taps = EwmaW.zipWithIndex.map { case (wk, k) =>
        lag(col("y"), k).over(w) * lit(wk)
      }
      daily
        .withColumn("ewma_micro", taps.reduce(_ + _).cast(LongType))
        .filter(col("ewma_micro").isNotNull)
        .select(col("user_id"),
          date_format(col("day"), "yyyy-MM-dd").as("day"), col("y"),
          col("ewma_micro"),
          round(col("ewma_micro").cast("double") / EwmaWSum, 6)
            .as("ewma"))
        .transform(graft.engine.Ops.reportSort("user_id", "day"))
    },
    Some(s"""WITH daily AS (
              SELECT user_id, CAST(ts AS DATE) AS day,
                     CAST(count(*) AS BIGINT) AS y
              FROM events WHERE user_id % 25 = 0 GROUP BY 1, 2),
            lagged AS (
              SELECT user_id, day, y,
                     lag(y, 0) OVER w AS y0, lag(y, 1) OVER w AS y1,
                     lag(y, 2) OVER w AS y2, lag(y, 3) OVER w AS y3,
                     lag(y, 4) OVER w AS y4, lag(y, 5) OVER w AS y5,
                     lag(y, 6) OVER w AS y6, lag(y, 7) OVER w AS y7,
                     lag(y, 8) OVER w AS y8, lag(y, 9) OVER w AS y9
              FROM daily
              WINDOW w AS (PARTITION BY user_id ORDER BY day))
            SELECT user_id, strftime(day, '%Y-%m-%d') AS day, y,
                   CAST(y0*300000 + y1*210000 + y2*147000 + y3*102900
                      + y4*72030 + y5*50421 + y6*35295 + y7*24706
                      + y8*17294 + y9*12106 AS BIGINT) AS ewma_micro,
                   round(CAST(y0*300000 + y1*210000 + y2*147000
                      + y3*102900 + y4*72030 + y5*50421 + y6*35295
                      + y7*24706 + y8*17294 + y9*12106 AS DOUBLE)
                     / ${EwmaWSum}, 6) AS ewma
            FROM lagged
            WHERE y9 IS NOT NULL
            ORDER BY user_id, day"""))

  // ------------- text_sentences: sentence segmentation stats

  private val sentences = Q(
    "text_sentences",
    "Sentence segmentation statistics per document: split on " +
      "terminator-plus-whitespace ('[.!?]+\\\\s+' — RE2-safe, no " +
      "lookbehind, so both engines' regex dialects agree), then " +
      "per-sentence word counts entirely in array HOFs — no explode, " +
      "no shuffle, one map pass at any corpus size. Word totals and " +
      "maxima are exact integers; the mean is one division, rounded. " +
      "The readability-style shape every text-quality pipeline " +
      "computes before filtering.",
    (s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"),
          filter(split(col("text"), "[.!?]+\\s+"),
            x => trim(x) =!= "").as("sents"))
        .select(col("doc_id"),
          size(col("sents")).cast(LongType).as("n_sentences"),
          transform(col("sents"),
            x => size(filter(split(x, "\\s+"), w => w =!= ""))
              .cast(LongType)).as("wc"))
        .select(col("doc_id"), col("n_sentences"),
          aggregate(col("wc"), lit(0L), (a, x) => a + x).as("n_words"),
          aggregate(col("wc"), lit(0L),
            (a, x) => greatest(a, x)).as("max_sent_words"))
        .withColumn("avg_sent_words",
          when(col("n_sentences") === 0L, lit(0.0))
            .otherwise(round(col("n_words").cast("double") /
              col("n_sentences").cast("double"), 6)))
        .orderBy("doc_id"),
    Some("""WITH sents AS (
              SELECT doc_id,
                     list_filter(regexp_split_to_array(text,
                       '[.!?]+\s+'), x -> trim(x) <> '') AS ss
              FROM documents),
            wc AS (
              SELECT doc_id,
                     CAST(len(ss) AS BIGINT) AS n_sentences,
                     list_transform(ss, x -> CAST(len(list_filter(
                       regexp_split_to_array(x, '\s+'),
                       w -> w <> '')) AS BIGINT)) AS w
              FROM sents)
            SELECT doc_id, n_sentences,
                   CAST(list_sum(w) AS BIGINT) AS n_words,
                   CAST(list_max(w) AS BIGINT) AS max_sent_words,
                   CASE WHEN n_sentences = 0 THEN 0.0
                        ELSE round(CAST(list_sum(w) AS DOUBLE) /
                                   CAST(n_sentences AS DOUBLE), 6)
                   END AS avg_sent_words
            FROM wc ORDER BY doc_id"""))

  // ------------- ml_feature_hash: hashing trick + collision diagnostic

  private val featureHash = Q(
    "ml_feature_hash",
    "Hashing-trick featurizer: tokens hash into 64 buckets by the " +
      "content-stable md5-prefix id (the engine's cross-engine hash " +
      "bridge), and the graded output is the per-bucket rollup a " +
      "modeler actually inspects before training — total term " +
      "frequency, document reach, and DISTINCT-TOKEN LOAD (the " +
      "collision diagnostic: buckets carrying many distinct tokens " +
      "are where the trick is lossy). Tokenize→explode→one hash " +
      "groupBy on the bucket; 64 output rows at any corpus size. " +
      "The per-doc sparse vectors themselves are the groupBy's " +
      "pre-image — same plan minus the rollup.",
    (s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"),
          explode(split(lower(col("text")), "[^a-z0-9]+")).as("tok"))
        .filter(col("tok") =!= "")
        .select(col("doc_id"), col("tok"),
          (Dedup.tokenId(col("tok")) % 64L).as("bucket"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("total_tf"),
          countDistinct(col("doc_id")).as("n_docs"),
          countDistinct(col("tok")).as("n_tokens"))
        .withColumn("avg_tf_per_token",
          round(col("total_tf").cast("double") /
            col("n_tokens").cast("double"), 6))
        .orderBy("bucket"),
    Some("""WITH toks AS (
              SELECT doc_id, tok
              FROM documents,
                   unnest(string_split_regex(lower(text), '[^a-z0-9]+'))
                     AS u(tok)
              WHERE tok <> ''),
            hashed AS (
              SELECT doc_id, tok,
                     ('0x' || substr(md5(tok), 1, 8))::BIGINT % 64
                       AS bucket
              FROM toks)
            SELECT bucket, CAST(count(*) AS BIGINT) AS total_tf,
                   CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
                   CAST(count(DISTINCT tok) AS BIGINT) AS n_tokens,
                   round(CAST(count(*) AS DOUBLE) /
                         CAST(count(DISTINCT tok) AS DOUBLE), 6)
                     AS avg_tf_per_token
            FROM hashed GROUP BY 1 ORDER BY bucket"""))

  val all: Seq[Q] = Seq(ewma, sentences, featureHash)
}
