package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.{DoubleType, LongType}

import graft.engine.Engine

/** Round-5 batch 1: Mann-Kendall trend test, Kruskal-Wallis rank test,
  * G-test of independence, McNemar paired-classifier test.
  */
object QueriesR5a {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Engine.table(s, dir, name)

  // ------------- stat_mann_kendall: nonparametric monotone-trend test

  private val mannKendall = Q(
    "stat_mann_kendall",
    "Mann-Kendall trend test per order status over MONTHLY order " +
      "counts — the standard nonparametric 'is this metric drifting' " +
      "monitor (no normality assumption, robust to outliers): " +
      "S = Σ sign(c_j − c_i) over month pairs i<j, variance with the " +
      "tied-value correction, z with the ±1 continuity shift. The " +
      "pair space is over the MONTH ROLLUP (~80 rows per status at " +
      "any corpus size — time is bounded, rows are not), so the " +
      "self-join is a bounded grid however large orders gets; the " +
      "only full-table work is one (status, month) groupBy. All " +
      "integer until the final z division.",
    (s, d) => {
      val monthly = t(s, d, "orders")
        .groupBy(col("o_orderstatus").as("g"),
          date_trunc("month", col("o_orderdate")).as("m"))
        .agg(count(lit(1)).as("c"))
      val sSum = monthly.as("x").join(monthly.as("y"),
          col("x.g") === col("y.g") && col("x.m") < col("y.m"))
        .groupBy(col("x.g").as("g"))
        .agg(sum(signum(col("y.c") - col("x.c")).cast(LongType)).as("s"),
          count(lit(1)).as("n_pairs"))
      val nM = monthly.groupBy("g").agg(count(lit(1)).as("n"))
      val ties = monthly.groupBy("g", "c").agg(count(lit(1)).as("tcnt"))
        .groupBy("g")
        .agg(sum(col("tcnt") * (col("tcnt") - 1) * (lit(2) * col("tcnt") + 5))
          .as("tie_term"))
      def dd(c: String) = col(c).cast(DoubleType)
      val varS = (dd("n") * (dd("n") - 1) * (lit(2.0) * dd("n") + 5) -
        dd("tie_term")) / 18.0
      val z = when(col("s") > 0, (dd("s") - 1) / sqrt(varS))
        .when(col("s") < 0, (dd("s") + 1) / sqrt(varS))
        .otherwise(lit(0.0))
      sSum.join(nM, "g").join(ties, "g")
        .select(col("g"), col("n"), col("s"), col("n_pairs"),
          round(varS * 1e6, 0).cast(LongType).as("var_micro"),
          round(z * 1e6, 0).cast(LongType).as("z_micro"))
        .transform(graft.engine.Ops.reportSort("g"))
    },
    Some("""WITH monthly AS (
              SELECT o_orderstatus AS g, date_trunc('month', o_orderdate) AS m,
                     count(*) AS c
              FROM orders GROUP BY 1, 2),
            s AS (
              SELECT x.g AS g,
                     CAST(sum(sign(y.c - x.c)) AS BIGINT) AS s,
                     CAST(count(*) AS BIGINT) AS n_pairs
              FROM monthly x JOIN monthly y ON x.g = y.g AND x.m < y.m
              GROUP BY 1),
            nm AS (SELECT g, CAST(count(*) AS BIGINT) AS n
                   FROM monthly GROUP BY 1),
            ties AS (
              SELECT g, sum(tcnt * (tcnt - 1) * (2 * tcnt + 5)) AS tie_term
              FROM (SELECT g, c, count(*) AS tcnt FROM monthly GROUP BY 1, 2)
              GROUP BY 1),
            j AS (
              SELECT s.g, n, s, n_pairs,
                     (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1) *
                      (2.0 * CAST(n AS DOUBLE) + 5) -
                      CAST(tie_term AS DOUBLE)) / 18.0 AS var_s
              FROM s JOIN nm ON s.g = nm.g JOIN ties ON s.g = ties.g)
            SELECT g, n, s, n_pairs,
                   CAST(round(var_s * 1e6, 0) AS BIGINT) AS var_micro,
                   CAST(round(CASE WHEN s > 0
                                THEN (CAST(s AS DOUBLE) - 1) / sqrt(var_s)
                              WHEN s < 0
                                THEN (CAST(s AS DOUBLE) + 1) / sqrt(var_s)
                              ELSE 0.0 END * 1e6, 0) AS BIGINT) AS z_micro
            FROM j ORDER BY g"""))

  // ------------- stat_kruskal_wallis: rank-based k-sample test

  private val kruskal = Q(
    "stat_kruskal_wallis",
    "Kruskal-Wallis H test — 'do the k groups come from the same " +
      "distribution' on ranks (the nonparametric one-way ANOVA): " +
      "extended price ranked over the POOLED table, per-returnflag " +
      "rank sums, H = 12/(N(N+1))·Σ nᵢr̄ᵢ² − 3(N+1), tie-corrected. " +
      "Pooled ranking uses the two-level bucketed scheme " +
      "(stat_spearman's): rows rank inside price buckets, a broadcast " +
      "bucket rollup supplies offsets — a single-partition global " +
      "window would funnel the whole table through ONE task at any " +
      "cluster size. Ranks are carried DOUBLED (2·rank + ties − 1) so " +
      "all rank sums stay exact BIGINTs; tie correction aggregates " +
      "per-value counts (keyed, partial-aggregatable).",
    (s, d) => {
      // CPU-dense pinned exchange: 2x-floor compute parallelism
      // (Engine.computeParts, round 14)
      val parts = graft.engine.Engine.computeParts(s, d)
      val base = t(s, d, "lineitem")
        .select(col("l_returnflag").as("g"), col("l_extendedprice").as("x"))
        .withColumn("bk", floor(col("x") / 4096.0))
      // bucket offsets: rollup is ~#buckets rows (bounded by the value
      // range, not the corpus), so its cumulative window is safe
      val offsets = base.groupBy("bk").agg(count(lit(1)).as("nb"))
        .withColumn("off", coalesce(sum("nb").over(
          Window.orderBy("bk").rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
        .select("bk", "off")
      val wIn = Window.partitionBy("bk").orderBy("x")
      val wTie = Window.partitionBy("bk", "x")
      val ranked = base.repartition(parts, col("bk"))
        .join(broadcast(offsets), "bk")
        .withColumn("dr",
          (lit(2L) * (col("off") + rank().over(wIn)) +
            count(lit(1)).over(wTie) - 1L).cast(LongType))
      def dd(c: String) = col(c).cast(DoubleType)
      // per-group term n_g·r̄² is rounded ONCE per group (to whole units:
      // the terms are ~1e13, micro-scaling would overflow BIGINT, and a
      // ±0.5 absolute error is 5e-14 relative — far below the micro
      // rounding of the output) and summed as BIGINT — a double sum over
      // groups would be accumulation-order dependent and unhashable
      val perG = ranked.groupBy("g")
        .agg(count(lit(1)).as("n_g"), sum("dr").as("sum_dr"))
        .withColumn("term_int",
          round(dd("n_g") * (dd("sum_dr") / (lit(2.0) * dd("n_g"))) *
            (dd("sum_dr") / (lit(2.0) * dd("n_g"))), 0)
            .cast(LongType))
      val tieTerm = base.groupBy("x").agg(count(lit(1)).as("tc"))
        .agg(sum(col("tc") * col("tc") * col("tc") - col("tc"))
          .as("tie_cube"))
      val agg = perG.agg(sum("n_g").as("n_tot"),
        count(lit(1)).as("k"), sum("term_int").as("t_int"))
      val h0 = lit(12.0) / (dd("n_tot") * (dd("n_tot") + 1)) *
        dd("t_int") - lit(3.0) * (dd("n_tot") + 1)
      agg.crossJoin(broadcast(tieTerm))
        .select(col("n_tot"), col("k"),
          round(h0 * 1e6, 0).cast(LongType).as("h_micro"),
          round(h0 / (lit(1.0) -
            dd("tie_cube") / (dd("n_tot") * dd("n_tot") * dd("n_tot") -
              dd("n_tot"))) * 1e6, 0).cast(LongType).as("h_corr_micro"))
    },
    Some("""WITH base AS (
              SELECT l_returnflag AS g, l_extendedprice AS x
              FROM lineitem),
            ranked AS (
              SELECT g,
                     CAST(2 * rank() OVER (ORDER BY x)
                          + count(*) OVER (PARTITION BY x) - 1
                       AS BIGINT) AS dr
              FROM base),
            pg AS (
              SELECT g, CAST(count(*) AS BIGINT) AS n_g,
                     CAST(sum(dr) AS BIGINT) AS sum_dr
              FROM ranked GROUP BY 1),
            pt AS (
              SELECT n_g,
                     CAST(round(CAST(n_g AS DOUBLE) *
                       (CAST(sum_dr AS DOUBLE) / (2.0 * CAST(n_g AS DOUBLE))) *
                       (CAST(sum_dr AS DOUBLE) / (2.0 * CAST(n_g AS DOUBLE))),
                       0) AS BIGINT) AS term_int
              FROM pg),
            tt AS (
              SELECT sum(tc * tc * tc - tc) AS tie_cube
              FROM (SELECT count(*) AS tc FROM base GROUP BY x)),
            agg AS (
              SELECT CAST(sum(n_g) AS BIGINT) AS n_tot,
                     CAST(count(*) AS BIGINT) AS k,
                     CAST(sum(term_int) AS BIGINT) AS t_int
              FROM pt),
            h AS (
              SELECT n_tot, k,
                     12.0 / (CAST(n_tot AS DOUBLE) *
                             (CAST(n_tot AS DOUBLE) + 1)) *
                     CAST(t_int AS DOUBLE)
                     - 3.0 * (CAST(n_tot AS DOUBLE) + 1) AS h0
              FROM agg)
            SELECT n_tot, k,
                   CAST(round(h0 * 1e6, 0) AS BIGINT) AS h_micro,
                   CAST(round(h0 / (1.0 - CAST(tie_cube AS DOUBLE) /
                          (CAST(n_tot AS DOUBLE) * n_tot * n_tot - n_tot))
                        * 1e6, 0) AS BIGINT) AS h_corr_micro
            FROM h, tt"""))

  // ------------- stat_g_test: log-likelihood-ratio independence test

  private val gTest = Q(
    "stat_g_test",
    "G-test of independence on the order priority × status table — the " +
      "log-likelihood-ratio sibling of stat_chi2_indep (better-behaved " +
      "for small expected counts, additive across partitions of the " +
      "table): per cell g = 2·o·ln(o/e) with e = rowTot·colTot/N; the " +
      "contingency table is 5×3 whatever the corpus size, so after one " +
      "groupBy everything is bounded-grid arithmetic. Zero cells " +
      "contribute 0 by the o·ln(o) convention.",
    (s, d) => {
      val cells = t(s, d, "orders")
        .groupBy(col("o_orderpriority").as("pri"),
          col("o_orderstatus").as("st"))
        .agg(count(lit(1)).as("obs"))
      val rt = cells.groupBy("pri").agg(sum("obs").as("rt"))
      val ct = cells.groupBy("st").agg(sum("obs").as("ct"))
      val n = cells.agg(sum("obs").as("n"))
      def dd(c: String) = col(c).cast(DoubleType)
      val e = dd("rt") * dd("ct") / dd("n")
      val g = when(col("obs") > 0,
        lit(2.0) * dd("obs") * log(dd("obs") / e)).otherwise(lit(0.0))
      cells.join(rt, "pri").join(ct, "st").crossJoin(broadcast(n))
        .select(col("pri"), col("st"), col("obs"),
          round(e * 1e6, 0).cast(LongType).as("exp_micro"),
          round(g * 1e6, 0).cast(LongType).as("g_contrib_micro"))
        .transform(graft.engine.Ops.reportSort("pri", "st"))
    },
    Some("""WITH cells AS (
              SELECT o_orderpriority AS pri, o_orderstatus AS st,
                     CAST(count(*) AS BIGINT) AS obs
              FROM orders GROUP BY 1, 2),
            rt AS (SELECT pri, sum(obs) AS rt FROM cells GROUP BY 1),
            ct AS (SELECT st, sum(obs) AS ct FROM cells GROUP BY 1),
            n AS (SELECT sum(obs) AS n FROM cells)
            SELECT pri, st, obs,
                   CAST(round(CAST(rt AS DOUBLE) * ct / n * 1e6, 0)
                     AS BIGINT) AS exp_micro,
                   CAST(round(CASE WHEN obs > 0
                       THEN 2.0 * obs * ln(CAST(obs AS DOUBLE) /
                            (CAST(rt AS DOUBLE) * ct / n))
                       ELSE 0.0 END * 1e6, 0) AS BIGINT)
                     AS g_contrib_micro
            FROM cells JOIN rt USING (pri) JOIN ct USING (st), n
            ORDER BY pri, st"""))

  // ------------- stat_mcnemar: paired-classifier disagreement test

  private val mcnemar = Q(
    "stat_mcnemar",
    "McNemar's test for two classifiers evaluated on the SAME " +
      "documents — the correct comparison when predictions are paired " +
      "(accuracy deltas ignore the pairing): heuristic A (stopword " +
      "presence: contains ' the ' or ' a ') and heuristic B (high " +
      "ASCII-letter ratio) both predict lang='en'; the test uses only " +
      "the DISCORDANT counts b (A right, B wrong) and c (A wrong, B " +
      "right), χ² = (|b−c|−1)²/(b+c) with continuity correction. One " +
      "map-only pass + one aggregation at any corpus size.",
    (s, d) => {
      val scored = t(s, d, "documents")
        .select(
          (col("lang") === "en").cast(LongType).as("y"),
          (col("text").contains(" the ") || col("text").contains(" a "))
            .cast(LongType).as("pa"),
          (length(regexp_replace(col("text"), "[^a-z]", "")) * 100 >=
            length(col("text")) * 78).cast(LongType).as("pb"))
        .select(col("y"),
          (col("pa") === col("y")).cast(LongType).as("ok_a"),
          (col("pb") === col("y")).cast(LongType).as("ok_b"))
      val agg = scored.agg(count(lit(1)).as("n"),
        sum(col("ok_a") * (lit(1L) - col("ok_b"))).as("b"),
        sum((lit(1L) - col("ok_a")) * col("ok_b")).as("c"),
        sum(col("ok_a")).as("n_ok_a"), sum(col("ok_b")).as("n_ok_b"))
      def dd(c: String) = col(c).cast(DoubleType)
      agg.select(col("n"), col("n_ok_a"), col("n_ok_b"), col("b"), col("c"),
        when(col("b") + col("c") > 0,
          round((abs(dd("b") - dd("c")) - 1) * (abs(dd("b") - dd("c")) - 1) /
            (dd("b") + dd("c")) * 1e6, 0))
          .otherwise(lit(0.0)).cast(LongType).as("chi2_micro"))
    },
    Some("""WITH scored AS (
              SELECT CAST(lang = 'en' AS BIGINT) AS y,
                     CAST(contains(text, ' the ') OR contains(text, ' a ')
                       AS BIGINT) AS pa,
                     CAST(length(regexp_replace(text, '[^a-z]', '', 'g'))
                            * 100 >= length(text) * 78 AS BIGINT) AS pb
              FROM documents),
            oks AS (
              SELECT y, CAST(pa = y AS BIGINT) AS ok_a,
                     CAST(pb = y AS BIGINT) AS ok_b
              FROM scored),
            agg AS (
              SELECT CAST(count(*) AS BIGINT) AS n,
                     CAST(sum(ok_a * (1 - ok_b)) AS BIGINT) AS b,
                     CAST(sum((1 - ok_a) * ok_b) AS BIGINT) AS c,
                     CAST(sum(ok_a) AS BIGINT) AS n_ok_a,
                     CAST(sum(ok_b) AS BIGINT) AS n_ok_b
              FROM oks)
            SELECT n, n_ok_a, n_ok_b, b, c,
                   CAST(CASE WHEN b + c > 0
                     THEN round((abs(CAST(b AS DOUBLE) - c) - 1) *
                                (abs(CAST(b AS DOUBLE) - c) - 1) /
                                (CAST(b AS DOUBLE) + c) * 1e6, 0)
                     ELSE 0.0 END AS BIGINT) AS chi2_micro
            FROM agg"""))

  val all: Seq[Q] = Seq(mannKendall, kruskal, gTest, mcnemar)
}
