package graft

import graft.engine.Ck.Ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.{DoubleType, LongType}

import graft.engine.Engine

/** Round-5 batch 16: Weibull inter-event fit, Breusch-Pagan
  * heteroskedasticity test, suffix morphology profile.
  */
object QueriesR5r {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Engine.table(s, dir, name)

  private val DecimalType38 =
    org.apache.spark.sql.types.DecimalType(38, 0)

  // ------- seq_interpurchase_weibull: parametric recurrence fit

  private val weibull = Q(
    "seq_interpurchase_weibull",
    "Weibull fit of inter-purchase gaps by log-moment closed form — " +
      "the parametric upgrade over raw gap quantiles that answers " +
      "'are repeat purchases bursty (k<1) or regular (k>1)?': for " +
      "ln X ~ Weibull(k, λ), Var(ln X) = π²/(6k²) and E(ln X) = " +
      "ln λ − γ/k, so shape and scale drop out of two log-gap " +
      "moments — no iterative MLE. Gaps are integer seconds from one " +
      "user-keyed lag; log-moments micro-round per gap (the " +
      "accumulation-order bridge) before the fold; γ and π inlined " +
      "as literals. Output includes the model's median-gap check " +
      "λ·ln(2)^(1/k) against the observed median.",
    (s, d) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val gaps = t(s, d, "events")
        .filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id"))
        .withColumn("gap",
          unix_timestamp(col("ts")) -
            unix_timestamp(lag("ts", 1).over(w)))
        .filter(col("gap").isNotNull && col("gap") > 0)
        .select(col("gap"),
          round(log(col("gap").cast(DoubleType)) * 1e6, 0)
            .cast(LongType).as("lg_micro"))
        .ckpt(true)
      val m = gaps.agg(count(lit(1)).as("n"),
        sum("lg_micro").as("s1"),
        sum(col("lg_micro") * col("lg_micro")).as("s2"),
        round(expr("percentile(gap, 0.5)"), 1).as("med_obs"))
      def dd(c: String) = col(c).cast(DoubleType)
      val mu = dd("s1") / dd("n") / 1e6
      val v = (dd("s2") / dd("n") -
        (dd("s1") / dd("n")) * (dd("s1") / dd("n"))) / 1e12
      val k = lit(3.141592653589793) / sqrt(v * 6.0)
      val lam = exp(mu + lit(0.5772156649015329) / k)
      m.select(col("n").as("n_gaps"),
        round(k * 1e6, 0).cast(LongType).as("shape_micro"),
        round(lam, 0).cast(LongType).as("scale_sec"),
        round(lam * pow(lit(0.6931471805599453), lit(1.0) / k), 0)
          .cast(LongType).as("model_median_sec"),
        round(col("med_obs") * 10, 0).cast(LongType)
          .as("obs_median_decisec"))
    },
    Some("""WITH gaps AS (
              SELECT gap,
                     CAST(round(ln(CAST(gap AS DOUBLE)) * 1e6, 0)
                       AS BIGINT) AS lg_micro
              FROM (SELECT epoch_us(ts) // 1000000 -
                           epoch_us(lag(ts) OVER (PARTITION BY user_id
                             ORDER BY ts, event_id)) // 1000000 AS gap
                    FROM events WHERE event_type = 'purchase')
              WHERE gap IS NOT NULL AND gap > 0),
            m AS (
              SELECT CAST(count(*) AS BIGINT) AS n,
                     CAST(sum(lg_micro) AS BIGINT) AS s1,
                     CAST(sum(lg_micro * lg_micro) AS BIGINT) AS s2,
                     round(quantile_cont(gap, 0.5), 1) AS med_obs
              FROM gaps),
            fit AS (
              SELECT n, med_obs,
                     CAST(s1 AS DOUBLE) / n / 1e6 AS mu,
                     (CAST(s2 AS DOUBLE) / n -
                      (CAST(s1 AS DOUBLE) / n) *
                      (CAST(s1 AS DOUBLE) / n)) / 1e12 AS v
              FROM m)
            SELECT n AS n_gaps,
                   CAST(round(3.141592653589793 / sqrt(v * 6.0) * 1e6, 0)
                     AS BIGINT) AS shape_micro,
                   CAST(round(exp(mu + 0.5772156649015329 /
                     (3.141592653589793 / sqrt(v * 6.0))), 0) AS BIGINT)
                     AS scale_sec,
                   CAST(round(exp(mu + 0.5772156649015329 /
                     (3.141592653589793 / sqrt(v * 6.0))) *
                     pow(0.6931471805599453, 1.0 /
                       (3.141592653589793 / sqrt(v * 6.0))), 0)
                     AS BIGINT) AS model_median_sec,
                   CAST(round(med_obs * 10, 0) AS BIGINT)
                     AS obs_median_decisec
            FROM fit"""))

  // ------- stat_breusch_pagan: does residual variance drift with x?

  private val breuschPagan = Q(
    "stat_breusch_pagan",
    "Breusch-Pagan heteroskedasticity test on the price~quantity " +
      "regression — the diagnostic that says whether ml_linreg_group's " +
      "OLS standard errors can be trusted: first-stage slope/intercept " +
      "from exact moments, per-row residuals ROUNDED TO INTEGER CENTS " +
      "(the accumulation bridge — float residuals would sum order-" +
      "dependently), then the LM statistic n·R² of the e²-on-x " +
      "auxiliary regression from exact DECIMAL(38) moment sums (e² " +
      "reaches 10²¹·n — past BIGINT, inside decimal). Two scans, two " +
      "folds, zero windows.",
    (s, d) => {
      val base = t(s, d, "lineitem").select(
        col("l_quantity").cast(LongType).as("x"),
        round(col("l_extendedprice") * 100, 0).cast(LongType).as("y"))
      val m1 = base.agg(count(lit(1)).as("n"),
        sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx")).ckpt(true)
      val r1 = m1.select(col("n"),
        ((col("n").cast(DoubleType) * col("sxy").cast(DoubleType) -
          col("sx").cast(DoubleType) * col("sy").cast(DoubleType)) /
          (col("n").cast(DoubleType) * col("sxx").cast(DoubleType) -
            col("sx").cast(DoubleType) * col("sx").cast(DoubleType)))
          .as("b"))
        .select(col("n"), col("b"))
      val ab = m1.crossJoin(broadcast(r1.select(col("b"))))
        .select(col("b"),
          ((col("sy").cast(DoubleType) - col("b") *
            col("sx").cast(DoubleType)) / col("n").cast(DoubleType))
            .as("a"))
      def dd(c: String) = col(c).cast(DoubleType)
      val resid = base.crossJoin(broadcast(ab))
        .select(col("x"),
          (col("y") - round(col("a") + col("b") * col("x"), 0)
            .cast(LongType)).as("e"))
        .select(col("x"), (col("e") * col("e")).as("e2"))
      val m2 = resid.agg(count(lit(1)).as("n"),
        sum("x").as("sx"),
        sum(col("e2").cast(DecimalType38)).as("se2"),
        sum((col("e2") * col("x")).cast(DecimalType38)).as("se2x"),
        sum(col("x") * col("x")).as("sxx"),
        sum((col("e2").cast(DecimalType38) * col("e2")))
          .as("se4"))
      val cov = dd("se2x") - dd("sx") * dd("se2") / dd("n")
      val varx = dd("sxx") - dd("sx") * dd("sx") / dd("n")
      val vare = dd("se4") - dd("se2") * dd("se2") / dd("n")
      m2.select(col("n").as("n_rows"),
        round(cov / varx, 0).cast(LongType).as("aux_slope_c2_per_unit"),
        round(cov * cov / (varx * vare) * dd("n") * 1e6, 0)
          .cast(LongType).as("bp_lm_micro"),
        (cov * cov / (varx * vare) * dd("n") > 3.841458820694124)
          .cast(LongType).as("heteroskedastic_flag"))
    },
    Some("""WITH base AS (
              SELECT CAST(l_quantity AS BIGINT) AS x,
                     CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS y
              FROM lineitem),
            m1 AS (
              SELECT CAST(count(*) AS BIGINT) AS n,
                     CAST(sum(x) AS BIGINT) AS sx,
                     CAST(sum(y) AS BIGINT) AS sy,
                     CAST(sum(x * y) AS BIGINT) AS sxy,
                     CAST(sum(x * x) AS BIGINT) AS sxx
              FROM base),
            r1 AS (
              SELECT n,
                     (CAST(n AS DOUBLE) * sxy -
                      CAST(sx AS DOUBLE) * sy) /
                     (CAST(n AS DOUBLE) * sxx -
                      CAST(sx AS DOUBLE) * sx) AS b
              FROM m1),
            ab AS (
              SELECT b,
                     (CAST(sy AS DOUBLE) - b * sx) / m1.n AS a
              FROM m1 CROSS JOIN r1),
            resid AS (
              SELECT x,
                     (y - CAST(round(a + b * x, 0) AS BIGINT)) *
                     (y - CAST(round(a + b * x, 0) AS BIGINT)) AS e2
              FROM base CROSS JOIN ab),
            m2 AS (
              SELECT CAST(count(*) AS BIGINT) AS n,
                     CAST(sum(x) AS BIGINT) AS sx,
                     sum(CAST(e2 AS HUGEINT)) AS se2,
                     sum(CAST(e2 AS HUGEINT) * x) AS se2x,
                     CAST(sum(x * x) AS BIGINT) AS sxx,
                     sum(CAST(e2 AS HUGEINT) * e2) AS se4
              FROM resid)
            SELECT n AS n_rows,
                   CAST(round((CAST(se2x AS DOUBLE) -
                     CAST(sx AS DOUBLE) * CAST(se2 AS DOUBLE) / n) /
                     (CAST(sxx AS DOUBLE) -
                      CAST(sx AS DOUBLE) * sx / n), 0) AS BIGINT)
                     AS aux_slope_c2_per_unit,
                   CAST(round((CAST(se2x AS DOUBLE) -
                       CAST(sx AS DOUBLE) * CAST(se2 AS DOUBLE) / n) *
                     (CAST(se2x AS DOUBLE) -
                       CAST(sx AS DOUBLE) * CAST(se2 AS DOUBLE) / n) /
                     ((CAST(sxx AS DOUBLE) -
                        CAST(sx AS DOUBLE) * sx / n) *
                      (CAST(se4 AS DOUBLE) -
                        CAST(se2 AS DOUBLE) * CAST(se2 AS DOUBLE) / n))
                     * n * 1e6, 0) AS BIGINT) AS bp_lm_micro,
                   CAST((CAST(se2x AS DOUBLE) -
                       CAST(sx AS DOUBLE) * CAST(se2 AS DOUBLE) / n) *
                     (CAST(se2x AS DOUBLE) -
                       CAST(sx AS DOUBLE) * CAST(se2 AS DOUBLE) / n) /
                     ((CAST(sxx AS DOUBLE) -
                        CAST(sx AS DOUBLE) * sx / n) *
                      (CAST(se4 AS DOUBLE) -
                        CAST(se2 AS DOUBLE) * CAST(se2 AS DOUBLE) / n))
                     * n > 3.841458820694124 AS BIGINT)
                     AS heteroskedastic_flag
            FROM m2"""))

  // ------- text_suffix_morphology: per-language suffix profile

  private val suffixMorph = Q(
    "text_suffix_morphology",
    "Suffix-morphology profile per language — the pre-tokenizer " +
      "diagnostic that shows WHY fertility differs across languages " +
      "(text_fertility measures it; this explains it): the top-5 " +
      "3-character word suffixes per language by token share, from " +
      "one explode → per-(lang, suffix) count → struct-ordered top-5 " +
      "pick via the repo's bounded-rank idiom (count desc, suffix " +
      "asc ties). Suffix space is alphabet-bounded, so the rollup " +
      "frame is tiny at any corpus size.",
    (s, d) => {
      val suf = t(s, d, "documents")
        .select(col("lang"), explode(split(col("text"), " ")).as("tok"))
        .filter(length(col("tok")) >= 4)
        .select(col("lang"), substring(col("tok"), -3, 3).as("suffix"))
      val counts = suf.groupBy("lang", "suffix")
        .agg(count(lit(1)).as("n"))
      val wL = Window.partitionBy("lang")
      def dd(c: String) = col(c).cast(DoubleType)
      counts
        .withColumn("tot", sum("n").over(wL))
        .withColumn("rk", row_number().over(
          wL.orderBy(desc("n"), col("suffix"))))
        .filter(col("rk") <= 5)
        .select(col("lang"), col("rk").cast(LongType).as("rk"),
          col("suffix"), col("n"),
          round(dd("n") * 1e6 / dd("tot"), 0).cast(LongType)
            .as("share_micro"))
        .transform(graft.engine.Ops.reportSort("lang", "rk"))
    },
    Some("""WITH suf AS (
              SELECT lang, tok[-3:] AS suffix
              FROM (SELECT lang,
                           unnest(string_split(text, ' ')) AS tok
                    FROM documents)
              WHERE len(tok) >= 4),
            counts AS (
              SELECT lang, suffix, CAST(count(*) AS BIGINT) AS n
              FROM suf GROUP BY 1, 2),
            ranked AS (
              SELECT lang, suffix, n,
                     CAST(sum(n) OVER (PARTITION BY lang) AS BIGINT)
                       AS tot,
                     row_number() OVER (PARTITION BY lang
                       ORDER BY n DESC, suffix) AS rk
              FROM counts)
            SELECT lang, CAST(rk AS BIGINT) AS rk, suffix, n,
                   CAST(round(CAST(n AS DOUBLE) * 1e6 / tot, 0)
                     AS BIGINT) AS share_micro
            FROM ranked WHERE rk <= 5
            ORDER BY lang, rk"""))

  val all: Seq[Q] = Seq(weibull, breuschPagan, suffixMorph)
}
