package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.{DoubleType, LongType}

import graft.engine.Engine

/** Round-3 batch 21: per-key interval union-merge (activity coverage),
  * mutual information between categorical columns, and exact integer-scaled
  * CUSUM changepoint detection per series.
  */
object QueriesR3u {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Engine.table(s, dir, name)

  // ------------- w21_interval_union: merge overlapping activity intervals

  private val intervalUnion = Q(
    "w21_interval_union",
    "Per-user union of overlapping activity intervals (each event opens a " +
      "30-minute window): gaps-and-islands where an island starts when an " +
      "event's start exceeds the running max end of everything before it. " +
      "Answers 'how much wall-clock was this user actually active' — " +
      "interval UNION length, not event count, so overlapping bursts " +
      "don't double-count. Both windows and the final rollup key on the " +
      "user: one hash shuffle end to end, islands merge in a single " +
      "ordered pass per key.",
    (s, d) => {
      val ev = t(s, d, "events")
        .select(col("user_id"), unix_timestamp(col("ts")).as("st"))
        .withColumn("en", col("st") + lit(1800L))
      val w = Window.partitionBy("user_id").orderBy("st", "en")
      val prevMaxEnd = max("en").over(
        w.rowsBetween(Window.unboundedPreceding, -1))
      val marked = ev
        .withColumn("boundary",
          when(col("st") > coalesce(prevMaxEnd, lit(Long.MinValue)), 1L)
            .otherwise(0L))
        .withColumn("island", sum("boundary").over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      marked.groupBy("user_id", "island")
        .agg((max("en") - min("st")).as("covered"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_islands"),
          sum("covered").cast(LongType).as("covered_sec"))
        .transform(graft.engine.Ops.reportSort("user_id"))
    },
    Some("""WITH ev AS (SELECT user_id,
                               epoch_us(ts) // 1000000 AS st,
                               epoch_us(ts) // 1000000 + 1800 AS en
                        FROM events),
            marked AS (
              SELECT user_id, st, en,
                     CASE WHEN st > coalesce(max(en) OVER
                            (PARTITION BY user_id ORDER BY st, en
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND 1 PRECEDING), -9223372036854775808)
                          THEN 1 ELSE 0 END AS boundary
              FROM ev),
            isl AS (
              SELECT user_id, st, en,
                     sum(boundary) OVER
                       (PARTITION BY user_id ORDER BY st, en
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND CURRENT ROW) AS island
              FROM marked),
            per_isl AS (
              SELECT user_id, island, max(en) - min(st) AS covered
              FROM isl GROUP BY 1, 2)
            SELECT user_id,
                   CAST(count(*) AS BIGINT) AS n_islands,
                   CAST(sum(covered) AS BIGINT) AS covered_sec
            FROM per_isl GROUP BY user_id ORDER BY user_id"""))

  // ------------- stat_mutual_info: MI between two categorical columns

  private val mutualInfo = Q(
    "stat_mutual_info",
    "Mutual information (nats) between a document's language and its " +
      "source, plus both marginal entropies — the dependence audit that " +
      "tells a corpus curator whether a source is secretly a language " +
      "proxy (MI near min(H) = redundant stratification keys). Three " +
      "count aggregates (joint + two marginals, each one shuffle over " +
      "low-cardinality keys) joined back on the joint table; the log " +
      "ratio uses raw counts (c_ls*n)/(c_l*c_s) so everything inside " +
      "the log is integer-exact.",
    (s, d) => {
      val docs = t(s, d, "documents").select("lang", "source")
      val tot = docs.agg(count(lit(1)).as("n"))
      val joint = docs.groupBy("lang", "source")
        .agg(count(lit(1)).as("c_ls"))
      val byL = docs.groupBy("lang").agg(count(lit(1)).as("c_l"))
      val byS = docs.groupBy("source").agg(count(lit(1)).as("c_s"))
      // cross-row double sums are accumulation-order-dependent (and ln is
      // libm-ulp-sensitive): every term nano-rounds to BIGINT before the
      // sum, the output reconstructs with one exact-integer division —
      // the micro-rounded-terms-then-integer-sum discipline
      val mi = joint.join(broadcast(byL), "lang")
        .join(broadcast(byS), "source")
        .crossJoin(broadcast(tot))
        .agg(round(sum(round(col("c_ls") / col("n") *
          log(col("c_ls") * col("n") / (col("c_l") * col("c_s"))) * 1e9,
          0).cast(LongType)).cast(DoubleType) / 1e9, 6).as("mi_nats"))
      val hL = byL.crossJoin(broadcast(tot))
        .agg(round(-sum(round(col("c_l") / col("n") *
          log(col("c_l") / col("n")) * 1e9, 0).cast(LongType))
          .cast(DoubleType) / 1e9, 6).as("h_lang"))
      val hS = byS.crossJoin(broadcast(tot))
        .agg(round(-sum(round(col("c_s") / col("n") *
          log(col("c_s") / col("n")) * 1e9, 0).cast(LongType))
          .cast(DoubleType) / 1e9, 6).as("h_source"))
      tot.select(col("n").as("n_docs"))
        .crossJoin(hL).crossJoin(hS).crossJoin(mi)
    },
    Some("""WITH d AS (SELECT lang, source FROM documents),
            n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM d),
            j AS (SELECT lang, source, CAST(count(*) AS BIGINT) AS c_ls
                  FROM d GROUP BY 1, 2),
            l AS (SELECT lang, CAST(count(*) AS BIGINT) AS c_l
                  FROM d GROUP BY 1),
            s AS (SELECT source, CAST(count(*) AS BIGINT) AS c_s
                  FROM d GROUP BY 1)
            SELECT (SELECT n FROM n) AS n_docs,
                   (SELECT round(-CAST(sum(CAST(round((c_l * 1.0 / n.n) *
                                      ln(c_l * 1.0 / n.n) * 1e9, 0)
                                    AS BIGINT)) AS DOUBLE) / 1e9, 6)
                    FROM l, n) AS h_lang,
                   (SELECT round(-CAST(sum(CAST(round((c_s * 1.0 / n.n) *
                                      ln(c_s * 1.0 / n.n) * 1e9, 0)
                                    AS BIGINT)) AS DOUBLE) / 1e9, 6)
                    FROM s, n) AS h_source,
                   (SELECT round(CAST(sum(CAST(round((c_ls * 1.0 / n.n) *
                                     ln((c_ls * 1.0 * n.n) /
                                        (c_l * 1.0 * c_s)) * 1e9, 0)
                                   AS BIGINT)) AS DOUBLE) / 1e9, 6)
                    FROM j JOIN l USING (lang) JOIN s USING (source), n)
                     AS mi_nats"""))

  // ------------- w22_cusum: integer-exact CUSUM changepoint per series

  private val cusum = Q(
    "w22_cusum",
    "CUSUM changepoint detection over each user's daily event counts, " +
      "kept integer-exact by scaling: the classic cusum_k = S_k - " +
      "k*mean has a float mean, so both engines compute n*S_k - k*S_n " +
      "(pure BIGINT arithmetic — no rounding contract needed) and flag " +
      "the day where |scaled CUSUM| peaks, ties to the earlier day. " +
      "The day where the cumulative count path strays furthest from " +
      "its own trend line IS the level-shift candidate. Daily rollup, " +
      "prefix-sum window, per-user total join, and argmax window all " +
      "key on the user — one shuffle.",
    (s, d) => {
      val daily = t(s, d, "events")
        .groupBy(col("user_id"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("c"))
      val w = Window.partitionBy("user_id").orderBy("day")
      val pref = daily
        .withColumn("k", row_number().over(w).cast(LongType))
        .withColumn("s_k", sum("c").over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val tot = daily.groupBy("user_id")
        .agg(sum("c").as("s_n"), count(lit(1)).as("n_days"))
      val scored = pref.join(tot, "user_id")
        .withColumn("scaled_cusum",
          col("n_days") * col("s_k") - col("k") * col("s_n"))
      scored.withColumn("rk", row_number().over(
          Window.partitionBy("user_id")
            .orderBy(abs(col("scaled_cusum")).desc, col("day"))))
        .filter(col("rk") === 1)
        .select(col("user_id"),
          date_format(col("day"), "yyyy-MM-dd").as("peak_day"),
          col("n_days"), col("scaled_cusum"))
        .orderBy(abs(col("scaled_cusum")).desc, col("user_id"))
        .limit(20)
    },
    Some("""WITH daily AS (SELECT user_id, CAST(ts AS DATE) AS day,
                                  CAST(count(*) AS BIGINT) AS c
                           FROM events GROUP BY 1, 2),
            pref AS (
              SELECT user_id, day, c,
                     CAST(row_number() OVER
                       (PARTITION BY user_id ORDER BY day) AS BIGINT) AS k,
                     CAST(sum(c) OVER
                       (PARTITION BY user_id ORDER BY day
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS BIGINT) AS s_k
              FROM daily),
            tot AS (SELECT user_id, CAST(sum(c) AS BIGINT) AS s_n,
                           CAST(count(*) AS BIGINT) AS n_days
                    FROM daily GROUP BY 1),
            scored AS (
              SELECT p.user_id, p.day, t.n_days,
                     t.n_days * p.s_k - p.k * t.s_n AS scaled_cusum
              FROM pref p JOIN tot t USING (user_id)),
            ranked AS (
              SELECT *, row_number() OVER
                     (PARTITION BY user_id
                      ORDER BY abs(scaled_cusum) DESC, day) AS rk
              FROM scored)
            SELECT user_id, strftime(day, '%Y-%m-%d') AS peak_day,
                   n_days, scaled_cusum
            FROM ranked WHERE rk = 1
            ORDER BY abs(scaled_cusum) DESC, user_id LIMIT 20"""))

  val all: Seq[Q] = Seq(intervalUnion, mutualInfo, cusum)
}
