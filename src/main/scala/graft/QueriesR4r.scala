package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.{DoubleType, LongType}

import graft.engine.Engine

/** Round-4 batch 5: Markov sequence scoring, TOST equivalence, Poisson
  * rate comparison, embedding data-quality audit.
  */
object QueriesR4r {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Engine.table(s, dir, name)

  // ------------- seq_markov_perplexity: score sequences under the LM

  private val markovPpl = Q(
    "seq_markov_perplexity",
    "Per-user sequence perplexity under the w10 first-order transition " +
      "model — the anomaly score that flags bot-like or broken event " +
      "streams (a user whose transitions the corpus model finds " +
      "improbable): transition probabilities from one (prev, next) " +
      "rollup (add-one smoothed over the |types|² grid so unseen " +
      "transitions score finitely), each user's mean negative log2 " +
      "prob over a broadcast join of their lag pairs, top 20 most " +
      "surprising users. Probabilities are exact count ratios; the " +
      "log sum is per-user bounded. Two windows + two keyed aggs.",
    (s, d) => {
      val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val pairs = t(s, d, "events")
        .select(col("user_id"), col("event_id"), col("ts"),
          col("event_type").as("nxt"))
        .withColumn("prv", lag("nxt", 1).over(byUser))
        .filter(col("prv").isNotNull)
        .select("user_id", "prv", "nxt")
      // types = union of observed prv AND nxt values: an event type that
      // only ever opens users' sequences appears solely as prv, and a
      // nxt-only grid would silently drop its transitions at the join
      val types = pairs.select(col("nxt").as("t0"))
        .union(pairs.select(col("prv").as("t0"))).distinct()
      val grid = types.crossJoin(types.select(col("t0").as("t1")))
        .select(col("t0").as("prv"), col("t1").as("nxt"))
      val counts = pairs.groupBy("prv", "nxt").agg(count(lit(1)).as("c"))
      val probs = grid.join(counts, Seq("prv", "nxt"), "left")
        .na.fill(0L, Seq("c"))
        .withColumn("c1", col("c") + 1)
        .withColumn("p", col("c1").cast(DoubleType) /
          sum("c1").over(Window.partitionBy("prv")).cast(DoubleType))
        .select("prv", "nxt", "p")
      pairs.join(broadcast(probs), Seq("prv", "nxt"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_transitions"),
          // nano-rounded per-transition log terms, exact integer sum
          // (cross-row double sums are order-dependent; log2 is
          // libm-ulp-sensitive) — one identical division reconstructs
          round(-(sum(round(log2(col("p")) * 1e9, 0).cast("long"))
            .cast("double") / 1e9) / count(lit(1)), 6)
            .as("bits_per_step"))
        .filter(col("n_transitions") >= 5)
        .orderBy(desc("bits_per_step"), col("user_id"))
        .limit(20)
    },
    Some("""WITH seq AS (
              SELECT user_id, event_type AS nxt,
                     lag(event_type) OVER (PARTITION BY user_id
                       ORDER BY ts, event_id) AS prv
              FROM events),
            pairs AS (SELECT user_id, prv, nxt FROM seq
                      WHERE prv IS NOT NULL),
            types AS (SELECT DISTINCT nxt AS t0 FROM pairs
                      UNION SELECT DISTINCT prv FROM pairs),
            grid AS (SELECT a.t0 AS prv, b.t0 AS nxt
                     FROM types a CROSS JOIN types b),
            counts AS (SELECT prv, nxt, count(*) AS c FROM pairs
                       GROUP BY 1, 2),
            probs AS (
              SELECT grid.prv, grid.nxt,
                     CAST(coalesce(c, 0) + 1 AS DOUBLE) /
                     CAST(sum(coalesce(c, 0) + 1) OVER
                       (PARTITION BY grid.prv) AS DOUBLE) AS p
              FROM grid LEFT JOIN counts
                ON grid.prv = counts.prv AND grid.nxt = counts.nxt)
            SELECT user_id, CAST(count(*) AS BIGINT) AS n_transitions,
                   round(-(CAST(sum(CAST(round(log2(p) * 1e9, 0)
                       AS BIGINT)) AS DOUBLE) / 1e9) / count(*), 6)
                     AS bits_per_step
            FROM pairs JOIN probs USING (prv, nxt)
            GROUP BY user_id HAVING count(*) >= 5
            ORDER BY bits_per_step DESC, user_id LIMIT 20"""))

  // ------------- stat_tost_equivalence: two one-sided tests

  private val tost = Q(
    "stat_tost_equivalence",
    "TOST equivalence test — the right tool when the question is 'are " +
      "these the same?', where a non-significant t-test proves " +
      "nothing: order values of two customer segments, equivalence " +
      "margin ±5% of the pooled mean, Welch statistics for BOTH " +
      "one-sided tests (difference > −δ and < +δ); equivalent iff " +
      "min(t1, −t2) clears the one-sided 95% normal critical value. " +
      "Sums/squares aggregate map-side per segment; everything after " +
      "is scalar double math on six aggregates.",
    (s, d) => {
      val base = t(s, d, "orders")
        .join(t(s, d, "customer"),
          col("o_custkey") === col("c_custkey"))
        .filter(col("c_mktsegment").isin("BUILDING", "MACHINERY"))
        .select(col("c_mktsegment").as("g"),
          col("o_totalprice").as("x"))
      val g = base.groupBy("g")
        .agg(count(lit(1)).cast(DoubleType).as("n"),
          sum("x").as("sx"), sum(col("x") * col("x")).as("sxx"))
      val wide = g.filter(col("g") === "BUILDING")
        .select(col("n").as("n1"), col("sx").as("sx1"), col("sxx").as("sxx1"))
        .crossJoin(broadcast(g.filter(col("g") === "MACHINERY")
          .select(col("n").as("n2"), col("sx").as("sx2"),
            col("sxx").as("sxx2"))))
      wide
        .withColumn("m1", col("sx1") / col("n1"))
        .withColumn("m2", col("sx2") / col("n2"))
        .withColumn("v1", (col("sxx1") - col("sx1") * col("sx1") / col("n1")) /
          (col("n1") - 1))
        .withColumn("v2", (col("sxx2") - col("sx2") * col("sx2") / col("n2")) /
          (col("n2") - 1))
        .withColumn("se", sqrt(col("v1") / col("n1") + col("v2") / col("n2")))
        .withColumn("delta",
          (col("m1") * col("n1") + col("m2") * col("n2")) /
            (col("n1") + col("n2")) * 0.05)
        .withColumn("t1", (col("m1") - col("m2") + col("delta")) / col("se"))
        .withColumn("t2", (col("m1") - col("m2") - col("delta")) / col("se"))
        .select(
          col("n1").cast(LongType).as("n1"),
          col("n2").cast(LongType).as("n2"),
          round(col("m1") - col("m2"), 4).as("mean_diff"),
          round(col("delta"), 4).as("margin"),
          round(col("t1"), 6).as("t_lower"),
          round(col("t2"), 6).as("t_upper"),
          (col("t1") > 1.6448536269514722 &&
            col("t2") < -1.6448536269514722).as("equivalent"))
    },
    Some("""WITH base AS (
              SELECT c_mktsegment AS g, o_totalprice AS x
              FROM orders JOIN customer ON o_custkey = c_custkey
              WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')),
            g AS (SELECT g, CAST(count(*) AS DOUBLE) AS n,
                         sum(x) AS sx, sum(x * x) AS sxx
                  FROM base GROUP BY g),
            wide AS (
              SELECT b.n AS n1, b.sx AS sx1, b.sxx AS sxx1,
                     m.n AS n2, m.sx AS sx2, m.sxx AS sxx2
              FROM (SELECT * FROM g WHERE g = 'BUILDING') b,
                   (SELECT * FROM g WHERE g = 'MACHINERY') m),
            c AS (
              SELECT n1, n2, sx1 / n1 AS m1, sx2 / n2 AS m2,
                     (sxx1 - sx1 * sx1 / n1) / (n1 - 1) AS v1,
                     (sxx2 - sx2 * sx2 / n2) / (n2 - 1) AS v2
              FROM wide),
            e AS (
              SELECT n1, n2, m1, m2,
                     sqrt(v1 / n1 + v2 / n2) AS se,
                     (m1 * n1 + m2 * n2) / (n1 + n2) * 0.05 AS delta
              FROM c)
            SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
                   round(m1 - m2, 4) AS mean_diff,
                   round(delta, 4) AS margin,
                   round((m1 - m2 + delta) / se, 6) AS t_lower,
                   round((m1 - m2 - delta) / se, 6) AS t_upper,
                   (m1 - m2 + delta) / se > 1.6448536269514722 AND
                   (m1 - m2 - delta) / se < -1.6448536269514722
                     AS equivalent
            FROM e"""))

  // ------------- stat_poisson_rate_test: two-sample rate comparison

  private val rateTest = Q(
    "stat_poisson_rate_test",
    "Two-sample Poisson rate test between event types (purchase vs " +
      "signup volumes over the same observation window): conditional " +
      "on the total, the purchase count is Binomial(n, 1/2) under " +
      "H0 of equal rates — the exact-conditional framing — and the " +
      "score statistic (k − n/2)/sqrt(n/4) is its normal " +
      "approximation. Counts come from ONE filtered aggregate; the " +
      "statistic is scalar math, so the query is a map-side count at " +
      "any corpus size.",
    (s, d) => {
      val counts = t(s, d, "events")
        .filter(col("event_type").isin("purchase", "signup"))
        .agg(
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .as("k1"),
          sum(when(col("event_type") === "signup", 1L).otherwise(0L))
            .as("k2"))
      counts
        .withColumn("n", col("k1") + col("k2"))
        .select(col("k1"), col("k2"), col("n"),
          round((col("k1").cast(DoubleType) - col("n") / 2.0) /
            sqrt(col("n").cast(DoubleType) / 4.0), 6).as("z"),
          round(col("k1").cast(DoubleType) / col("k2"), 6)
            .as("rate_ratio"),
          (abs((col("k1").cast(DoubleType) - col("n") / 2.0) /
            sqrt(col("n").cast(DoubleType) / 4.0)) > 1.959963984540054)
            .as("significant"))
    },
    Some("""WITH c AS (
              SELECT CAST(sum(CASE WHEN event_type = 'purchase'
                       THEN 1 ELSE 0 END) AS BIGINT) AS k1,
                     CAST(sum(CASE WHEN event_type = 'signup'
                       THEN 1 ELSE 0 END) AS BIGINT) AS k2
              FROM events
              WHERE event_type IN ('purchase', 'signup'))
            SELECT k1, k2, k1 + k2 AS n,
                   round((CAST(k1 AS DOUBLE) - (k1 + k2) / 2.0) /
                         sqrt(CAST(k1 + k2 AS DOUBLE) / 4.0), 6) AS z,
                   round(CAST(k1 AS DOUBLE) / k2, 6) AS rate_ratio,
                   abs((CAST(k1 AS DOUBLE) - (k1 + k2) / 2.0) /
                       sqrt(CAST(k1 + k2 AS DOUBLE) / 4.0))
                     > 1.959963984540054 AS significant
            FROM c"""))

  // ------------- dq_embedding_audit: vector data-quality report

  private val embAudit = Q(
    "dq_embedding_audit",
    "Embedding-table data-quality audit — the checks that catch a " +
      "broken encoder export before it poisons retrieval: per label, " +
      "vector count, dimensionality spread (min=max or the export is " +
      "ragged), L2-norm stats (collapsed ≈0-norm vectors and " +
      "exploding outliers), zero-component fraction, and non-finite " +
      "component count. All within-row HOFs + one label groupBy — " +
      "map-only at any corpus size.",
    (s, d) =>
      t(s, d, "embeddings")
        .select(col("label"),
          size(col("embedding")).cast(LongType).as("dim"),
          sqrt(aggregate(col("embedding"), lit(0.0d),
            (acc, x) => acc + x.cast(DoubleType) * x.cast(DoubleType)))
            .as("norm"),
          size(filter(col("embedding"), x => x === 0.0f))
            .cast(LongType).as("n_zero"),
          size(filter(col("embedding"),
            x => isnan(x) || x.cast(DoubleType) === Double.PositiveInfinity ||
              x.cast(DoubleType) === Double.NegativeInfinity))
            .cast(LongType).as("n_bad"))
        .groupBy("label")
        .agg(count(lit(1)).as("n_vecs"),
          min("dim").as("dim_min"), max("dim").as("dim_max"),
          round(min("norm"), 6).as("norm_min"),
          round(max("norm"), 6).as("norm_max"),
          round(avg("norm"), 6).as("norm_avg"),
          sum("n_zero").as("zero_components"),
          sum("n_bad").as("nonfinite_components"))
        .orderBy("label"),
    Some("""SELECT label, CAST(count(*) AS BIGINT) AS n_vecs,
                   CAST(min(len(embedding)) AS BIGINT) AS dim_min,
                   CAST(max(len(embedding)) AS BIGINT) AS dim_max,
                   round(min(norm), 6) AS norm_min,
                   round(max(norm), 6) AS norm_max,
                   round(avg(norm), 6) AS norm_avg,
                   CAST(sum(nz) AS BIGINT) AS zero_components,
                   CAST(sum(nb) AS BIGINT) AS nonfinite_components
            FROM (SELECT label, embedding,
                         sqrt(list_sum(list_transform(embedding::DOUBLE[],
                           x -> x * x))) AS norm,
                         len(list_filter(embedding, x -> x = 0)) AS nz,
                         len(list_filter(embedding::DOUBLE[],
                           x -> isnan(x) OR isinf(x))) AS nb
                  FROM embeddings)
            GROUP BY label ORDER BY label"""))

  val all: Seq[Q] = Seq(markovPpl, tost, rateTest, embAudit)
}
