package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

import graft.engine.Engine
import graft.operators.Dedup

/** Round-3 batch 18: a Laplace-mechanism differential-privacy count
  * release (deterministic inverse-CDF noise so the mechanism is
  * testable), a Zipf-law fit over token frequencies, and week-over-week
  * growth — the BI change-tracking staple.
  */
object QueriesR3r {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Engine.table(s, dir, name)

  // ------------- dq_dp_counts: Laplace-mechanism count release

  private val dpCounts = Q(
    "dq_dp_counts",
    "Differentially-private count release via the Laplace mechanism " +
      "(ε=1, sensitivity 1): per-nation customer counts perturbed by " +
      "inverse-CDF Laplace noise −b·sign(v)·ln(1−2|v|) — the uniform " +
      "v comes from the content-stable hash, NOT rand(), so the " +
      "mechanism is reproducible and hash-gradable (a production " +
      "release swaps in a real RNG; everything else — sensitivity, " +
      "scale, the post-processing — is the real mechanism). Noise is " +
      "micro-rounded once; the noisy count stays an exact integer in " +
      "micro units. One groupBy + map-side noise at any scale.",
    (s, d) => {
      val g = t(s, d, "customer")
        .groupBy(col("c_nationkey").as("nation"))
        .agg(count(lit(1)).as("n"))
      val u = (Dedup.tokenId(concat(lit("dp:"),
        col("nation").cast("string"))).cast(DoubleType) + 0.5) /
        lit(4294967296.0)
      val v = u - 0.5
      val noise = round(-signum(v) *
        log(lit(1.0) - lit(2.0) * abs(v)) * 1e6, 0).cast(LongType)
      g.select(col("nation"), col("n"), noise.as("noise_micro"),
          (col("n") * 1000000L + noise).as("noisy_micro"))
        .transform(graft.engine.Ops.reportSort("nation"))
    },
    Some("""WITH g AS (SELECT c_nationkey AS nation, count(*) AS n
                       FROM customer GROUP BY 1),
            nz AS (SELECT nation, n,
                          (CAST(('0x' || substr(md5('dp:' ||
                             CAST(nation AS VARCHAR)), 1, 8))::BIGINT
                             AS DOUBLE) + 0.5) / 4294967296.0 - 0.5 AS v
                   FROM g)
            SELECT nation, n,
                   CAST(round(-sign(v) * ln(1.0 - 2.0 * abs(v)) * 1e6,
                     0) AS BIGINT) AS noise_micro,
                   n * 1000000 +
                   CAST(round(-sign(v) * ln(1.0 - 2.0 * abs(v)) * 1e6,
                     0) AS BIGINT) AS noisy_micro
            FROM nz ORDER BY nation"""))

  // ------------- text_zipf_fit: Zipf exponent over token frequencies

  private val zipf = Q(
    "text_zipf_fit",
    "Zipf's-law fit over the corpus token distribution — the " +
      "sanity check that a corpus is natural-language-shaped (synthetic " +
      "or template spam bends the curve): token frequencies fold to " +
      "the tiny frequency-of-frequency histogram, each class gets its " +
      "MIN RANK from a cumulative count over that histogram (hundreds " +
      "of rows — no global sort ever touches the token table), and " +
      "log2-rank/log2-freq points (micro ints) feed the closed-form " +
      "OLS: slope ≈ −Zipf exponent. Output: one row of fit " +
      "parameters from exact DECIMAL sufficient statistics.",
    (s, d) => {
      val freq = t(s, d, "documents")
        .select(explode(split(col("text"), " ")).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("f"))
      val hist = freq.groupBy("f").agg(count(lit(1)).as("cnt"))
      val w = Window.orderBy(desc("f"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val pts = hist
        .select(col("f"), (sum("cnt").over(w) - col("cnt") + 1)
          .as("rank_min"))
        .select(
          round(log2(col("rank_min").cast(DoubleType)) * 1e6, 0)
            .cast(LongType).as("x"),
          round(log2(col("f").cast(DoubleType)) * 1e6, 0)
            .cast(LongType).as("y"))
      val agg = pts.agg(
        count(lit(1)).as("n"),
        sum("x").as("sx"), sum("y").as("sy"),
        sum((col("x") * col("y")).cast(DecimalType(38, 0))).as("sxy"),
        sum((col("x") * col("x")).cast(DecimalType(38, 0))).as("sxx"),
        sum((col("y") * col("y")).cast(DecimalType(38, 0))).as("syy"))
      def dd(c: String) = col(c).cast(DoubleType)
      val cov = dd("n") * dd("sxy") - dd("sx") * dd("sy")
      val varx = dd("n") * dd("sxx") - dd("sx") * dd("sx")
      val vary = dd("n") * dd("syy") - dd("sy") * dd("sy")
      agg.select(col("n").as("n_classes"),
        round(cov / varx * 1e6, 0).cast(LongType).as("slope_micro"),
        round((dd("sy") - cov / varx * dd("sx")) / dd("n") * 1e6, 0)
          .cast(LongType).as("intercept_micro"),
        round(cov * cov / (varx * vary) * 1e6, 0).cast(LongType)
          .as("r2_micro"))
    },
    Some("""WITH freq AS (SELECT tok, count(*) AS f
                          FROM (SELECT unnest(string_split(text, ' '))
                                  AS tok FROM documents)
                          GROUP BY 1),
            hist AS (SELECT f, count(*) AS cnt FROM freq GROUP BY 1),
            pts AS (
              SELECT CAST(round(log2(CAST(sum(cnt) OVER (ORDER BY f DESC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       - cnt + 1 AS DOUBLE)) * 1e6, 0) AS BIGINT) AS x,
                     CAST(round(log2(CAST(f AS DOUBLE)) * 1e6, 0)
                       AS BIGINT) AS y
              FROM hist),
            agg AS (SELECT CAST(count(*) AS BIGINT) AS n,
                           CAST(sum(x) AS BIGINT) AS sx,
                           CAST(sum(y) AS BIGINT) AS sy,
                           sum(x * y) AS sxy,
                           sum(x * x) AS sxx,
                           sum(y * y) AS syy
                    FROM pts)
            SELECT n AS n_classes,
                   CAST(round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                       - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
                     (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                       - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                     * 1e6, 0) AS BIGINT) AS slope_micro,
                   CAST(round((CAST(sy AS DOUBLE) -
                       (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                         - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
                       (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                       * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE)
                     * 1e6, 0) AS BIGINT) AS intercept_micro,
                   CAST(round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                       - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) *
                     (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                       - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
                     ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                       - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
                      (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                       - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
                     * 1e6, 0) AS BIGINT) AS r2_micro
            FROM agg"""))

  // ------------- w19_wow_change: week-over-week growth

  private val wow = Q(
    "w19_wow_change",
    "Week-over-week revenue change per event type — the BI " +
      "change-tracking staple: events fold to (type, week) exact " +
      "cents (the only event-volume pass), lag(1) over each type's " +
      "tiny weekly series fetches the prior week, and the delta " +
      "ships in integer basis points ((cur−prev)·10⁴ div prev). " +
      "Weeks as ISO strings per the repo's date-bridge convention.",
    (s, d) => {
      val weekly = t(s, d, "events")
        .filter(col("event_type").isin("purchase", "signup"))
        .groupBy(col("event_type").as("etype"),
          date_trunc("week", col("ts")).as("wk"))
        .agg(sum(round(col("value") * 100, 0).cast(LongType))
          .as("cents"))
      weekly
        .withColumn("prev_cents", lag("cents", 1).over(
          Window.partitionBy("etype").orderBy("wk")))
        .select(col("etype"), date_format(col("wk"), "yyyy-MM-dd")
            .as("week"),
          col("cents"), col("prev_cents"),
          when(col("prev_cents") > 0,
            expr("((cents - prev_cents) * 10000) div prev_cents"))
            .as("delta_bp"))
        .transform(graft.engine.Ops.reportSort("etype", "week"))
    },
    Some("""WITH weekly AS (
              SELECT event_type AS etype, date_trunc('week', ts) AS wk,
                     CAST(sum(CAST(round(value * 100, 0) AS BIGINT))
                       AS BIGINT) AS cents
              FROM events WHERE event_type IN ('purchase', 'signup')
              GROUP BY 1, 2),
            lagged AS (
              SELECT etype, wk, cents,
                     lag(cents, 1) OVER (PARTITION BY etype ORDER BY wk)
                       AS prev_cents
              FROM weekly)
            SELECT etype, strftime(wk, '%Y-%m-%d') AS week, cents,
                   prev_cents,
                   CASE WHEN prev_cents > 0
                        THEN ((cents - prev_cents) * 10000) // prev_cents
                   END AS delta_bp
            FROM lagged ORDER BY etype, week"""))

  val all: Seq[Q] = Seq(dpCounts, zipf, wow)
}
