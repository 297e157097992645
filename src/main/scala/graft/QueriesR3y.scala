package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.LongType

import graft.engine.Engine

/** Round-3 batch 25: decision-stump learning (best Gini split per
  * feature) and the Hill estimator for heavy-tail indices.
  */
object QueriesR3y {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Engine.table(s, dir, name)

  // ------------- ml_gini_split: the tree-building inner loop

  private val giniSplit = Q(
    "ml_gini_split",
    "Decision-stump learning — the inner loop of every tree ensemble: " +
      "for each feature, the threshold minimizing weighted Gini " +
      "impurity of the returned-flag label. Candidate thresholds are " +
      "the feature's distinct values (integer-scaled cents/percents; " +
      "at 100 TB you quantile-bucket to ~256 candidates first — same " +
      "shape, bounded domain), so the scan aggregates to (feature, " +
      "value, n, pos) ONCE and every split evaluates from prefix sums " +
      "— no per-threshold rescan. The impurity score is the identical " +
      "rational expression of integer counts on both engines, so the " +
      "argmin needs no tolerance; windows key on the feature.",
    (s, d) => {
      val li = t(s, d, "lineitem")
        .select((col("l_returnflag") === "R").cast(LongType).as("pos"),
          explode(array(
            struct(lit("discount_pct").as("feature"),
              round(col("l_discount") * 100).cast(LongType).as("v")),
            struct(lit("quantity").as("feature"),
              col("l_quantity").cast(LongType).as("v")),
            struct(lit("tax_pct").as("feature"),
              round(col("l_tax") * 100).cast(LongType).as("v"))))
            .as("f"))
        .select(col("f.feature").as("feature"), col("f.v").as("v"),
          col("pos"))
      val cell = li.groupBy("feature", "v")
        .agg(count(lit(1)).as("n"), sum("pos").cast(LongType).as("p"))
      val w = Window.partitionBy("feature").orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val tot = cell.groupBy("feature")
        .agg(sum("n").cast(LongType).as("nt"),
          sum("p").cast(LongType).as("pt"))
      val scored = cell
        .withColumn("nl", sum("n").over(w).cast(LongType))
        .withColumn("pl", sum("p").over(w).cast(LongType))
        .join(tot, "feature")
        .filter(col("nl") < col("nt")) // splitting past the max is no split
        .withColumn("nr", col("nt") - col("nl"))
        .withColumn("pr", col("pt") - col("pl"))
        .withColumn("score",
          (col("pl") * col("pl") +
            (col("nl") - col("pl")) * (col("nl") - col("pl"))).cast("double")
            / col("nl") +
          (col("pr") * col("pr") +
            (col("nr") - col("pr")) * (col("nr") - col("pr"))).cast("double")
            / col("nr"))
      scored.withColumn("rk", row_number().over(
          Window.partitionBy("feature").orderBy(desc("score"), col("v"))))
        .filter(col("rk") === 1)
        .select(col("feature"), col("v").as("threshold"),
          col("nl"), col("nr"),
          round(lit(1.0) - col("score") / col("nt"), 6).as("gini"))
        .transform(graft.engine.Ops.reportSort("feature"))
    },
    Some("""WITH li AS (
              SELECT CAST(l_returnflag = 'R' AS BIGINT) AS pos,
                     f.feature, f.v
              FROM lineitem,
                   LATERAL (VALUES
                     ('discount_pct',
                      CAST(round(l_discount * 100) AS BIGINT)),
                     ('quantity', CAST(l_quantity AS BIGINT)),
                     ('tax_pct', CAST(round(l_tax * 100) AS BIGINT)))
                     AS f(feature, v)),
            cell AS (SELECT feature, v, CAST(count(*) AS BIGINT) AS n,
                            CAST(sum(pos) AS BIGINT) AS p
                     FROM li GROUP BY 1, 2),
            tot AS (SELECT feature, CAST(sum(n) AS BIGINT) AS nt,
                           CAST(sum(p) AS BIGINT) AS pt
                    FROM cell GROUP BY 1),
            pre AS (
              SELECT feature, v,
                     CAST(sum(n) OVER
                       (PARTITION BY feature ORDER BY v
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS BIGINT) AS nl,
                     CAST(sum(p) OVER
                       (PARTITION BY feature ORDER BY v
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS BIGINT) AS pl
              FROM cell),
            scored AS (
              SELECT pre.feature, v, nl, pl, nt - nl AS nr, pt - pl AS pr,
                     nt,
                     CAST(pl * pl + (nl - pl) * (nl - pl) AS DOUBLE) / nl
                       + CAST((pt - pl) * (pt - pl) +
                              ((nt - nl) - (pt - pl)) *
                              ((nt - nl) - (pt - pl)) AS DOUBLE)
                         / (nt - nl) AS score
              FROM pre JOIN tot ON pre.feature = tot.feature
              WHERE nl < nt),
            ranked AS (
              SELECT *, row_number() OVER
                     (PARTITION BY feature
                      ORDER BY score DESC, v) AS rk
              FROM scored)
            SELECT feature, v AS threshold, nl, nr,
                   round(1.0 - score / nt, 6) AS gini
            FROM ranked WHERE rk = 1 ORDER BY feature"""))

  // ------------- stat_hill_tail: heavy-tail index of order totals

  private val hill = Q(
    "stat_hill_tail",
    "Hill estimator of the Pareto tail index over order totals: the " +
      "top-500 order statistics against the 501st as threshold, " +
      "alpha = k / sum(ln(x_i/x_thr)) — the standard answer to 'how " +
      "heavy is the revenue tail' (alpha <= 2 means infinite variance: " +
      "plan capacity by quantile, not by mean). Totals stay integer " +
      "cents through the top-k selection — a TakeOrdered with a " +
      "deterministic key tie-break, never a global sort — and only " +
      "the final log-ratio sum is floating point, rounded once.",
    (s, d) => {
      val cents = t(s, d, "orders")
        .select(col("o_orderkey"),
          round(col("o_totalprice") * 100).cast(LongType).as("cents"))
      val top = cents
        .orderBy(desc("cents"), col("o_orderkey")).limit(501)
      val thr = top.agg(min("cents").as("x_thr"))
      top.crossJoin(broadcast(thr))
        // ties at the threshold value are excluded on BOTH engines alike
        .filter(col("cents") > col("x_thr"))
        .agg(count(lit(1)).as("k"), first("x_thr").as("x_thr_cents"),
          // nano-rounded log-ratio terms, exact integer sum (500-term
          // double sums are accumulation-order-dependent; ln is
          // libm-ulp-sensitive) — one identical division reconstructs
          round(count(lit(1)) /
            (sum(round(log(col("cents").cast("double") / col("x_thr")) *
              1e9, 0).cast("long")).cast("double") / 1e9), 6)
            .as("alpha"))
    },
    Some("""WITH cents AS (SELECT o_orderkey,
                                  CAST(round(o_totalprice * 100) AS BIGINT)
                                    AS cents
                           FROM orders),
            top AS (SELECT * FROM cents
                    ORDER BY cents DESC, o_orderkey LIMIT 501),
            thr AS (SELECT min(cents) AS x_thr FROM top)
            SELECT CAST(count(*) AS BIGINT) AS k,
                   (SELECT x_thr FROM thr) AS x_thr_cents,
                   round(count(*) /
                         (CAST(sum(CAST(round(ln(CAST(cents AS DOUBLE) /
                                (SELECT x_thr FROM thr)) * 1e9, 0)
                              AS BIGINT)) AS DOUBLE) / 1e9), 6) AS alpha
            FROM top WHERE cents > (SELECT x_thr FROM thr)"""))

  val all: Seq[Q] = Seq(giniSplit, hill)
}
