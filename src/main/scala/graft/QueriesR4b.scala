package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.LongType

import graft.engine.Engine

/** Round-3 batch 28: rolling OLS trend slopes, the Wald-Wolfowitz runs
  * test, and VAD-style voice segmentation parsed from raw PCM bytes.
  */
object QueriesR4b {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Engine.table(s, dir, name)

  // ------------- w24_rolling_slope: per-series rolling OLS trend

  private val rollingSlope = Q(
    "w24_rolling_slope",
    "Rolling 14-day OLS trend slope of each user's daily event counts — " +
      "the classic 'is this series trending up' detector, computed " +
      "without ever fitting: slope = (n·Σxy − ΣxΣy)/(n·Σx² − (Σx)²) " +
      "where x is the per-user day index and y the daily count, so all " +
      "four sums are INTEGER rolling-window aggregates (one user-keyed " +
      "shuffle, never global) and only the final division is float, " +
      "from identical integers on both engines. Full windows only — " +
      "a 3-day 'trend' is noise wearing a suit.",
    (s, d) => {
      val daily = t(s, d, "events")
        .groupBy(col("user_id"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("y"))
      val wAll = Window.partitionBy("user_id").orderBy("day")
      val wRoll = wAll.rowsBetween(-13, Window.currentRow)
      val withX = daily
        .withColumn("x", row_number().over(wAll).cast(LongType))
        .withColumn("xy", col("x") * col("y"))
        .withColumn("xx", col("x") * col("x"))
      withX
        .withColumn("n", count(lit(1)).over(wRoll))
        .withColumn("sx", sum("x").over(wRoll).cast(LongType))
        .withColumn("sy", sum("y").over(wRoll).cast(LongType))
        .withColumn("sxy", sum("xy").over(wRoll).cast(LongType))
        .withColumn("sxx", sum("xx").over(wRoll).cast(LongType))
        .filter(col("n") === 14L)
        .select(col("user_id"),
          date_format(col("day"), "yyyy-MM-dd").as("day"),
          col("y"),
          round((col("n") * col("sxy") - col("sx") * col("sy"))
            .cast("double") /
            (col("n") * col("sxx") - col("sx") * col("sx")), 6)
            .as("slope_14d"))
        .orderBy("user_id", "day")
    },
    Some("""WITH daily AS (SELECT user_id, CAST(ts AS DATE) AS day,
                                  CAST(count(*) AS BIGINT) AS y
                           FROM events GROUP BY 1, 2),
            wx AS (SELECT user_id, day, y,
                          CAST(row_number() OVER
                            (PARTITION BY user_id ORDER BY day)
                            AS BIGINT) AS x
                   FROM daily),
            rolled AS (
              SELECT user_id, day, y,
                     CAST(count(*) OVER w AS BIGINT) AS n,
                     CAST(sum(x) OVER w AS BIGINT) AS sx,
                     CAST(sum(y) OVER w AS BIGINT) AS sy,
                     CAST(sum(x * y) OVER w AS BIGINT) AS sxy,
                     CAST(sum(x * x) OVER w AS BIGINT) AS sxx
              FROM wx
              WINDOW w AS (PARTITION BY user_id ORDER BY day
                           ROWS BETWEEN 13 PRECEDING AND CURRENT ROW))
            SELECT user_id, strftime(day, '%Y-%m-%d') AS day, y,
                   round(CAST(n * sxy - sx * sy AS DOUBLE) /
                         (n * sxx - sx * sx), 6) AS slope_14d
            FROM rolled WHERE n = 14
            ORDER BY user_id, day"""))

  // ------------- stat_runs_test: Wald-Wolfowitz randomness test

  private val runsTest = Q(
    "stat_runs_test",
    "Wald-Wolfowitz runs test on the corpus's daily event totals: days " +
      "above/below the median form a binary sequence, and too FEW runs " +
      "means trending while too MANY means oscillation — the " +
      "nonparametric 'is traffic random or structured' answer that " +
      "complements KS (distribution) and CUSUM (changepoint). Runs, " +
      "n1, n2 are integers off one lag boundary-sum over the per-day " +
      "rollup (bounded by the horizon, same discipline as the ECDF " +
      "family); expectation, variance, and z evaluate the identical " +
      "closed form on both engines, rounded once.",
    (s, d) => {
      val daily = t(s, d, "events")
        .groupBy(to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("c"))
      val med = daily.agg(expr("percentile(c, 0.5)").as("med"))
      val flagged = daily.crossJoin(broadcast(med))
        .filter(col("c") =!= col("med"))
        .select(col("day"), (col("c") > col("med")).cast(LongType).as("hi"))
      val w = Window.orderBy("day")
      val runs = flagged
        .withColumn("boundary",
          when(lag("hi", 1).over(w).isNull ||
            lag("hi", 1).over(w) =!= col("hi"), 1L).otherwise(0L))
        .agg(sum("boundary").cast(LongType).as("runs"),
          sum("hi").cast(LongType).as("n1"),
          sum(lit(1L) - col("hi")).cast(LongType).as("n2"))
      runs.select(col("runs"), col("n1"), col("n2"),
        round(lit(2.0) * col("n1") * col("n2") / (col("n1") + col("n2"))
          + 1.0, 6).as("expected_runs"),
        round((col("runs") -
          (lit(2.0) * col("n1") * col("n2") / (col("n1") + col("n2"))
            + 1.0)) /
          sqrt(lit(2.0) * col("n1") * col("n2") *
            (lit(2.0) * col("n1") * col("n2") - col("n1") - col("n2")) /
            ((col("n1") + col("n2")) * (col("n1") + col("n2")) *
              (col("n1") + col("n2") - 1))), 6).as("z"))
    },
    Some("""WITH daily AS (SELECT CAST(ts AS DATE) AS day,
                                  CAST(count(*) AS BIGINT) AS c
                           FROM events GROUP BY 1),
            med AS (SELECT quantile_cont(c, 0.5) AS med FROM daily),
            flagged AS (SELECT day, CAST(c > med AS BIGINT) AS hi
                        FROM daily, med WHERE c <> med),
            runs AS (
              SELECT CAST(sum(CASE WHEN prev IS NULL OR prev <> hi
                                   THEN 1 ELSE 0 END) AS BIGINT) AS runs,
                     CAST(sum(hi) AS BIGINT) AS n1,
                     CAST(sum(1 - hi) AS BIGINT) AS n2
              FROM (SELECT hi, lag(hi) OVER (ORDER BY day) AS prev
                    FROM flagged))
            SELECT runs, n1, n2,
                   round(2.0 * n1 * n2 / (n1 + n2) + 1.0, 6)
                     AS expected_runs,
                   round((runs - (2.0 * n1 * n2 / (n1 + n2) + 1.0)) /
                         sqrt(2.0 * n1 * n2 *
                              (2.0 * n1 * n2 - n1 - n2) /
                              ((n1 + n2) * (n1 + n2) * (n1 + n2 - 1))), 6)
                     AS z
            FROM runs"""))

  // ------------- mm_vad_segments: silence/voice islands from PCM bytes

  private val vad = Q(
    "mm_vad_segments",
    "VAD-style voice segmentation from RAW PCM BYTES, no UDF: the same " +
      "synthesized WAV payloads as mm_pcm_stats, but here each sample " +
      "is re-read from the binary at a COMPUTED offset (substring with " +
      "a column index — the byte-walking a decode kernel does), " +
      "classified voice/silence by amplitude, and voice RUNS found by " +
      "gaps-and-islands keyed per doc. Output per doc: voice-sample " +
      "count, segment count, and longest run — the clip-level metadata " +
      "an audio curation pass indexes. The oracle replays the " +
      "synthesis formula, so the graded contract is byte-walk == " +
      "formula, exactly. Map + one doc-keyed window at any scale.",
    (s, d) => {
      import graft.operators.Multimodal
      def hexLe2(v: Column) = concat(
        lpad(hex(v % 256), 2, "0"),
        lpad(hex(shiftright(v, 8) % 256), 2, "0"))
      val sr = (lit(8000) + (col("doc_id") % 5) * 8820).cast("int")
      def u(i: Int): Column = (col("doc_id") * 31 + lit(i * i * 7)) % 65536
      val media = t(s, d, "documents")
        .select(col("doc_id"),
          concat(Multimodal.wavHeaderBytes(sr),
            unhex(concat((0 until 32).map(i => hexLe2(u(i))): _*)))
            .as("payload"))
      val perSample = media
        .select(col("doc_id"), col("payload"),
          explode(sequence(lit(0), lit(31))).as("i"))
        .withColumn("lo", conv(hex(
          expr("substring(payload, CAST(45 + 2*i AS INT), 1)")), 16, 10)
          .cast(LongType))
        .withColumn("hi_b", conv(hex(
          expr("substring(payload, CAST(46 + 2*i AS INT), 1)")), 16, 10)
          .cast(LongType))
        .withColumn("v",
          when(col("lo") + col("hi_b") * 256 >= 32768L,
            col("lo") + col("hi_b") * 256 - 65536L)
            .otherwise(col("lo") + col("hi_b") * 256))
        .select(col("doc_id"), col("i"), (abs(col("v")) >= 8192L)
          .cast(LongType).as("voice"))
      val w = Window.partitionBy("doc_id").orderBy("i")
      val islands = perSample
        .withColumn("boundary",
          when(col("voice") === 1L &&
            (lag("voice", 1).over(w).isNull ||
              lag("voice", 1).over(w) === 0L), 1L).otherwise(0L))
        .withColumn("seg_id",
          sum("boundary").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val segs = islands.filter(col("voice") === 1L)
        .groupBy("doc_id", "seg_id").agg(count(lit(1)).as("len"))
      media.select("doc_id").join(
          segs.groupBy("doc_id")
            .agg(sum("len").cast(LongType).as("n_voice"),
              count(lit(1)).as("n_segments"),
              max("len").cast(LongType).as("longest_run")),
          Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_voice"), lit(0L)).as("n_voice"),
          coalesce(col("n_segments"), lit(0L)).as("n_segments"),
          coalesce(col("longest_run"), lit(0L)).as("longest_run"))
        .transform(graft.engine.Ops.reportSort("doc_id"))
    },
    Some("""WITH samp AS (SELECT doc_id, i,
                                 (doc_id * 31 + i*i*7) % 65536 AS u
                          FROM documents CROSS JOIN
                            (SELECT unnest(range(0, 32)) AS i)),
            cls AS (SELECT doc_id, i,
                           CAST(abs(CASE WHEN u >= 32768 THEN u - 65536
                                         ELSE u END) >= 8192 AS BIGINT)
                             AS voice
                    FROM samp),
            marked AS (
              SELECT doc_id, i, voice,
                     CASE WHEN voice = 1 AND
                          coalesce(lag(voice) OVER
                            (PARTITION BY doc_id ORDER BY i), 0) = 0
                          THEN 1 ELSE 0 END AS boundary
              FROM cls),
            ids AS (SELECT doc_id, i, voice,
                           sum(boundary) OVER
                             (PARTITION BY doc_id ORDER BY i
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS seg_id
                    FROM marked),
            segs AS (SELECT doc_id, seg_id,
                            CAST(count(*) AS BIGINT) AS len
                     FROM ids WHERE voice = 1 GROUP BY 1, 2),
            per_doc AS (SELECT doc_id,
                               CAST(sum(len) AS BIGINT) AS n_voice,
                               CAST(count(*) AS BIGINT) AS n_segments,
                               CAST(max(len) AS BIGINT) AS longest_run
                        FROM segs GROUP BY 1)
            SELECT d.doc_id,
                   coalesce(p.n_voice, 0) AS n_voice,
                   coalesce(p.n_segments, 0) AS n_segments,
                   coalesce(p.longest_run, 0) AS longest_run
            FROM documents d LEFT JOIN per_doc p USING (doc_id)
            ORDER BY d.doc_id"""))

  val all: Seq[Q] = Seq(rollingSlope, runsTest, vad)
}
