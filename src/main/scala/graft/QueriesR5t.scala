package graft

import graft.engine.Ck.Ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.{DoubleType, LongType}

import graft.engine.Engine

/** Round-5 batch 18: time-series peak detection, Bradley-Terry
  * preference step, cross-table financial reconciliation.
  */
object QueriesR5t {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Engine.table(s, dir, name)

  // ------- w32_peak_detection: prominent local maxima on the daily series

  private val peaks = Q(
    "w32_peak_detection",
    "Prominent-peak detection on daily revenue — the alerting primitive " +
      "between w18's pointwise z-score and w26's decomposition: a day " +
      "is a peak when it beats BOTH neighbors and clears 1.5× the " +
      "centered 15-day rolling median (a prominence floor that kills " +
      "the noise peaks a plain local-max test emits). Lags/leads and " +
      "the rolling median ride the calendar-bounded daily frame; the " +
      "exact rolling median comes from percentile over a row window. " +
      "Output: each peak day, its revenue, the local floor, and " +
      "prominence in micro-ratio units.",
    (s, d) => {
      val w = Window.partitionBy(lit(1)).orderBy("day")
      val wMed = Window.partitionBy(lit(1)).orderBy("day")
        .rowsBetween(-7, 7)
      val daily = t(s, d, "orders")
        .groupBy(date_format(col("o_orderdate"), "yyyy-MM-dd").as("day"))
        .agg(sum(round(col("o_totalprice") * 100, 0).cast(LongType))
          .as("rev"))
      def dd(c: String) = col(c).cast(DoubleType)
      daily
        .withColumn("prv", lag("rev", 1).over(w))
        .withColumn("nxt", lead("rev", 1).over(w))
        .withColumn("med", expr("percentile(rev, 0.5)").over(wMed))
        .filter(col("prv").isNotNull && col("nxt").isNotNull)
        .filter(col("rev") > col("prv") && col("rev") > col("nxt") &&
          dd("rev") > col("med") * 1.5)
        .select(col("day"), col("rev").as("rev_cents"),
          round(col("med") * 10, 0).cast(LongType).as("med_decicents"),
          round(dd("rev") * 1e6 / col("med"), 0).cast(LongType)
            .as("prominence_micro"))
        .transform(graft.engine.Ops.reportSort("day"))
    },
    Some("""WITH daily AS (
              SELECT strftime(o_orderdate, '%Y-%m-%d') AS day,
                     CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                       AS BIGINT) AS rev
              FROM orders GROUP BY 1),
            scored AS (
              SELECT day, rev,
                     lag(rev) OVER (ORDER BY day) AS prv,
                     lead(rev) OVER (ORDER BY day) AS nxt,
                     quantile_cont(rev, 0.5) OVER (ORDER BY day
                       ROWS BETWEEN 7 PRECEDING AND 7 FOLLOWING) AS med
              FROM daily)
            SELECT day, rev AS rev_cents,
                   CAST(round(med * 10, 0) AS BIGINT) AS med_decicents,
                   CAST(round(CAST(rev AS DOUBLE) * 1e6 / med, 0)
                     AS BIGINT) AS prominence_micro
            FROM scored
            WHERE prv IS NOT NULL AND nxt IS NOT NULL
              AND rev > prv AND rev > nxt
              AND CAST(rev AS DOUBLE) > med * 1.5
            ORDER BY day"""))

  // ------- ml_bradley_terry_step: preference-model strength update

  private val bradleyTerry = Q(
    "ml_bradley_terry_step",
    "One Bradley-Terry minorization-maximization step over pairwise " +
      "preferences — the strength model behind chatbot-arena-style " +
      "rankings and RLHF preference data QA: comparisons come from " +
      "co-purchase baskets (both parts of a top-20 panel in one " +
      "order; the higher quantity 'wins', quantity ties split), and " +
      "from uniform strengths one MM update gives π_i = W_i / " +
      "Σ_j n_ij/(π_i+π_j) = 2·W_i/G_i, iterated once more against " +
      "the UPDATED opponent strengths — the second step needs the " +
      "pairwise grid (bounded: panel²) joined to step-1 strengths, " +
      "which is where the relational form earns its keep. Output: " +
      "panel strengths after step 2, win records, rank.",
    (s, d) => {
      val li = t(s, d, "lineitem")
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"),
          col("l_quantity").cast(LongType).as("q"))
        .filter(col("pk") <= 20)
      val pairs = li.as("a").join(li.as("b"),
          col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
        .select(col("a.pk").as("i"), col("b.pk").as("j"),
          when(col("a.q") > col("b.q"), 1.0)
            .when(col("a.q") < col("b.q"), 0.0).otherwise(0.5)
            .as("wi"))
      val grid = pairs.groupBy("i", "j")
        .agg(count(lit(1)).as("n"), sum("wi").as("w_i"))
        .ckpt(true)
      val undGrid = grid.select(col("i").as("p"), col("j").as("o"),
          col("n"), col("w_i").as("w"))
        .unionByName(grid.select(col("j").as("p"), col("i").as("o"),
          col("n"), (col("n").cast(DoubleType) - col("w_i")).as("w")))
      // step 1 from uniform strengths: pi1 = 2 W / G
      val s1 = undGrid.groupBy("p")
        .agg(sum("w").as("wins"), sum("n").as("games"))
        .select(col("p"),
          (lit(2.0) * col("wins") / col("games").cast(DoubleType))
            .as("pi1"), col("wins"), col("games"))
        .ckpt(true)
      // step 2: pi2 = W / Σ_j n_ij/(pi1_i + pi1_j)
      def dd(c: String) = col(c).cast(DoubleType)
      val denom = undGrid
        .join(broadcast(s1.select(col("p"), col("pi1"))), "p")
        .join(broadcast(s1.select(col("p").as("o"),
          col("pi1").as("pi1_o"))), "o")
        .groupBy("p")
        .agg(sum(dd("n") / (col("pi1") + col("pi1_o"))).as("den"))
      s1.join(denom, "p")
        .select(col("p").as("part"), col("games"),
          round(col("wins"), 1).as("winsr"),
          round(col("wins") / col("den") * 1e6, 0).cast(LongType)
            .as("pi2_micro"))
        .select(col("part"), col("games"),
          round(col("winsr") * 10, 0).cast(LongType).as("wins_deci"),
          col("pi2_micro"))
        .transform(graft.engine.Ops.reportSort(desc("pi2_micro"), col("part")))
    },
    Some("""WITH li AS (
              SELECT l_orderkey AS ok, l_partkey AS pk,
                     CAST(l_quantity AS BIGINT) AS q
              FROM lineitem WHERE l_partkey <= 20),
            pairs AS (
              SELECT a.pk AS i, b.pk AS j,
                     CASE WHEN a.q > b.q THEN 1.0
                          WHEN a.q < b.q THEN 0.0 ELSE 0.5 END AS wi
              FROM li a JOIN li b
                ON a.ok = b.ok AND a.pk < b.pk),
            grid AS (
              SELECT i, j, CAST(count(*) AS BIGINT) AS n,
                     sum(wi) AS w_i
              FROM pairs GROUP BY 1, 2),
            und AS (
              SELECT i AS p, j AS o, n, w_i AS w FROM grid
              UNION ALL
              SELECT j, i, n, CAST(n AS DOUBLE) - w_i FROM grid),
            s1 AS (
              SELECT p, sum(w) AS wins, CAST(sum(n) AS BIGINT) AS games,
                     2.0 * sum(w) / sum(n) AS pi1
              FROM und GROUP BY 1),
            denom AS (
              SELECT und.p,
                     sum(CAST(n AS DOUBLE) / (sp.pi1 + so.pi1)) AS den
              FROM und
              JOIN s1 sp ON und.p = sp.p
              JOIN s1 so ON und.o = so.p
              GROUP BY 1)
            SELECT s1.p AS part, games,
                   CAST(round(round(wins, 1) * 10, 0) AS BIGINT)
                     AS wins_deci,
                   CAST(round(wins / den * 1e6, 0) AS BIGINT)
                     AS pi2_micro
            FROM s1 JOIN denom ON s1.p = denom.p
            ORDER BY pi2_micro DESC, part"""))

  // ------- dq_order_reconciliation: cross-table financial audit

  private val reconciliation = Q(
    "dq_order_reconciliation",
    "Order-header vs line-item financial reconciliation — the " +
      "cross-table audit every warehouse runs nightly (dq_ref_" +
      "integrity checks the KEYS exist; this checks the MONEY adds " +
      "up): per order, header o_totalprice against the derived " +
      "Σ extendedprice·(1−discount)·(1+tax), both in exact cents " +
      "with per-line rounding, bucketed by relative delta into " +
      "exact / within-1% / within-5% / beyond bands plus the count " +
      "of header-less and line-less orders from one full outer " +
      "join. Keyed join + 6-row rollup; the delta histogram is the " +
      "triage dashboard's first panel.",
    (s, d) => {
      val derived = t(s, d, "lineitem")
        .select(col("l_orderkey").as("ok"),
          round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) *
            (lit(1.0) + col("l_tax")) * 100, 0).cast(LongType)
            .as("line_cents"))
        .groupBy("ok").agg(sum("line_cents").as("derived_cents"))
      val header = t(s, d, "orders")
        .select(col("o_orderkey").as("ok"),
          round(col("o_totalprice") * 100, 0).cast(LongType)
            .as("header_cents"))
      def dd(c: String) = col(c).cast(DoubleType)
      header.join(derived, Seq("ok"), "full_outer")
        .select(
          when(col("header_cents").isNull, "no_header")
            .when(col("derived_cents").isNull, "no_lines")
            .when(col("header_cents") === col("derived_cents"), "exact")
            .when(abs(dd("header_cents") - dd("derived_cents")) <=
              dd("header_cents") * 0.01, "within_1pct")
            .when(abs(dd("header_cents") - dd("derived_cents")) <=
              dd("header_cents") * 0.05, "within_5pct")
            .otherwise("beyond_5pct").as("band"),
          coalesce(abs(col("header_cents") - col("derived_cents")),
            lit(0L)).as("abs_delta"))
        .groupBy("band")
        .agg(count(lit(1)).as("n_orders"),
          sum("abs_delta").as("total_abs_delta_cents"),
          max("abs_delta").as("worst_delta_cents"))
        .transform(graft.engine.Ops.reportSort("band"))
    },
    Some("""WITH derived AS (
              SELECT l_orderkey AS ok,
                     CAST(sum(CAST(round(l_extendedprice *
                       (1.0 - l_discount) * (1.0 + l_tax) * 100, 0)
                       AS BIGINT)) AS BIGINT) AS derived_cents
              FROM lineitem GROUP BY 1),
            header AS (
              SELECT o_orderkey AS ok,
                     CAST(round(o_totalprice * 100, 0) AS BIGINT)
                       AS header_cents
              FROM orders)
            SELECT CASE
                     WHEN header_cents IS NULL THEN 'no_header'
                     WHEN derived_cents IS NULL THEN 'no_lines'
                     WHEN header_cents = derived_cents THEN 'exact'
                     WHEN abs(CAST(header_cents AS DOUBLE) -
                       derived_cents) <= header_cents * 0.01
                       THEN 'within_1pct'
                     WHEN abs(CAST(header_cents AS DOUBLE) -
                       derived_cents) <= header_cents * 0.05
                       THEN 'within_5pct'
                     ELSE 'beyond_5pct' END AS band,
                   CAST(count(*) AS BIGINT) AS n_orders,
                   CAST(sum(coalesce(abs(header_cents - derived_cents),
                     0)) AS BIGINT) AS total_abs_delta_cents,
                   CAST(max(coalesce(abs(header_cents - derived_cents),
                     0)) AS BIGINT) AS worst_delta_cents
            FROM header FULL OUTER JOIN derived USING (ok)
            GROUP BY 1 ORDER BY 1"""))

  val all: Seq[Q] = Seq(peaks, bradleyTerry, reconciliation)
}
