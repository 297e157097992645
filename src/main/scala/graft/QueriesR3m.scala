package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

import graft.engine.Engine

/** Round-3 batch 13: a Benford's-law first-digit audit (fraud/data-entry
  * screening), sequential event-trigram mining (the pattern-mining
  * primitive behind next-action models), and one exact distributed
  * gradient-descent step of logistic regression — the map-side-combine
  * shape every distributed SGD framework reduces to.
  */
object QueriesR3m {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Engine.table(s, dir, name)

  // ------------- stat_benford: first-digit law audit

  private val benford = Q(
    "stat_benford",
    "Benford's-law audit of order totals — the classic fabricated-data " +
      "screen: first significant digit extracted EXACTLY via " +
      "integer-cents → string (no log10-of-double digit math, whose " +
      "floor can misfire on exact powers), observed share in " +
      "integer micros (obs·1e6 div n), Benford expectation " +
      "log10(1+1/d) micro-rounded, and the absolute gap. One groupBy " +
      "over 9 digit keys; the total rides a broadcast crossJoin.",
    (s, d) => {
      val digits = t(s, d, "orders")
        .select(round(col("o_totalprice") * 100, 0).cast(LongType)
          .as("cents"))
        .filter(col("cents") > 0)
        .select(substring(col("cents").cast("string"), 1, 1).cast("int")
          .as("digit"))
      val obs = digits.groupBy("digit").agg(count(lit(1)).as("obs"))
      val n = obs.agg(sum("obs").as("n"))
      obs.crossJoin(broadcast(n))
        .select(col("digit"), col("obs"),
          expr("obs * 1000000 div n").as("share_micro"),
          round(log10((col("digit") + 1).cast(DoubleType) /
            col("digit").cast(DoubleType)) * 1e6, 0).cast(LongType)
            .as("benford_micro"))
        .withColumn("gap_micro",
          abs(col("share_micro") - col("benford_micro")))
        .transform(graft.engine.Ops.reportSort("digit"))
    },
    Some("""WITH digits AS (
              SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100, 0)
                       AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS digit
              FROM orders
              WHERE CAST(round(o_totalprice * 100, 0) AS BIGINT) > 0),
            obs AS (SELECT digit, count(*) AS obs
                    FROM digits GROUP BY 1),
            n AS (SELECT CAST(sum(obs) AS BIGINT) AS n FROM obs)
            SELECT digit, obs,
                   (obs * 1000000) // n AS share_micro,
                   CAST(round(log10(CAST(digit + 1 AS DOUBLE) /
                          CAST(digit AS DOUBLE)) * 1e6, 0) AS BIGINT)
                     AS benford_micro,
                   abs((obs * 1000000) // n -
                       CAST(round(log10(CAST(digit + 1 AS DOUBLE) /
                              CAST(digit AS DOUBLE)) * 1e6, 0) AS BIGINT))
                     AS gap_micro
            FROM obs CROSS JOIN n ORDER BY digit"""))

  // ------------- seq_event_trigrams: sequential pattern mining

  private val trigrams = Q(
    "seq_event_trigrams",
    "Sequential pattern mining: the 20 most frequent event-type " +
      "TRIGRAMS across per-user event streams (ordered by time, " +
      "event_id tie-break) — the n-gram-over-actions primitive behind " +
      "next-action prediction and funnel discovery. Two leads over the " +
      "user-partitioned window (one shuffle, every partition " +
      "independent), a groupBy on the 3-key, TakeOrdered top-20 — no " +
      "global sort; per-user sequences never leave their partition.",
    (s, d) => {
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("event_id"))
      t(s, d, "events")
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type").as("a"))
        .withColumn("b", lead("a", 1).over(w))
        .withColumn("c", lead("a", 2).over(w))
        .filter(col("b").isNotNull && col("c").isNotNull)
        .groupBy("a", "b", "c").agg(count(lit(1)).as("n"))
        .orderBy(desc("n"), col("a"), col("b"), col("c")).limit(20)
    },
    Some("""WITH seq AS (
              SELECT event_type AS a,
                     lead(event_type, 1) OVER w AS b,
                     lead(event_type, 2) OVER w AS c
              FROM events
              WINDOW w AS (PARTITION BY user_id
                           ORDER BY ts, event_id))
            SELECT a, b, c, CAST(count(*) AS BIGINT) AS n
            FROM seq WHERE b IS NOT NULL AND c IS NOT NULL
            GROUP BY 1, 2, 3
            ORDER BY n DESC, a, b, c LIMIT 20"""))

  // ------------- ml_logreg_step: one exact distributed SGD step

  private val logregStep = Q(
    "ml_logreg_step",
    "One EXACT distributed gradient-descent step of logistic " +
      "regression (predicting returnflag='R' from [1, quantity, " +
      "discount_bp, tax_bp]): per row the sigmoid of the fixed " +
      "starting weights is rounded ONCE to micros, so every gradient " +
      "component Σ(σ−y)·x_j accumulates as exact integers (DECIMAL " +
      "sums — overflow-proof) in ONE partial-aggregatable pass — the " +
      "map-side-combine shape parameter servers and allreduce SGD " +
      "both reduce to; only 4 numbers cross the shuffle. Output: each " +
      "feature's gradient and the post-step weight (lr = 0.1/n, one " +
      "double tree).",
    (s, d) => {
      // fixed starting weights, micro units: w·x uses exact ints
      val w0 = -2000000L; val w1 = 10000L; val w2 = 100L; val w3 = 0L
      val base = t(s, d, "lineitem").select(
        col("l_quantity").cast(LongType).as("qty"),
        round(col("l_discount") * 10000, 0).cast(LongType).as("disc"),
        round(col("l_tax") * 10000, 0).cast(LongType).as("tax"),
        (col("l_returnflag") === "R").cast(LongType).as("y"))
      val z = (lit(w0) + lit(w1) * col("qty") + lit(w2) * col("disc") +
        lit(w3) * col("tax")).cast(DoubleType) / 1e6
      val sigMicro = round(lit(1.0) / (lit(1.0) + exp(-z)) * 1e6, 0)
        .cast(LongType)
      val scored = base.select(col("qty"), col("disc"), col("tax"),
        (sigMicro - col("y") * 1000000L).as("resid"))
      val agg = scored.agg(
        count(lit(1)).as("n"),
        sum(col("resid").cast(DecimalType(38, 0))).as("g0"),
        sum((col("resid") * col("qty")).cast(DecimalType(38, 0)))
          .as("g1"),
        sum((col("resid") * col("disc")).cast(DecimalType(38, 0)))
          .as("g2"),
        sum((col("resid") * col("tax")).cast(DecimalType(38, 0)))
          .as("g3"))
      def step(wOld: Long, g: String) =
        round(lit(wOld).cast(DoubleType) -
          lit(0.1) * col(g).cast(DoubleType) /
            col("n").cast(DoubleType), 0)
          .cast(LongType)
      agg.select(explode(array(
          struct(lit("bias").as("feature"),
            lit(w0).as("w_old_micro"),
            col("g0").cast(LongType).as("grad_micro"),
            step(w0, "g0").as("w_new_micro")),
          struct(lit("quantity").as("feature"),
            lit(w1).as("w_old_micro"),
            col("g1").cast(LongType).as("grad_micro"),
            step(w1, "g1").as("w_new_micro")),
          struct(lit("discount_bp").as("feature"),
            lit(w2).as("w_old_micro"),
            col("g2").cast(LongType).as("grad_micro"),
            step(w2, "g2").as("w_new_micro")),
          struct(lit("tax_bp").as("feature"),
            lit(w3).as("w_old_micro"),
            col("g3").cast(LongType).as("grad_micro"),
            step(w3, "g3").as("w_new_micro")))).as("r"))
        .select(col("r.feature").as("feature"),
          col("r.w_old_micro").as("w_old_micro"),
          col("r.grad_micro").as("grad_micro"),
          col("r.w_new_micro").as("w_new_micro"))
        .transform(graft.engine.Ops.reportSort("feature"))
    },
    Some("""WITH base AS (
              SELECT CAST(l_quantity AS BIGINT) AS qty,
                     CAST(round(l_discount * 10000, 0) AS BIGINT) AS disc,
                     CAST(round(l_tax * 10000, 0) AS BIGINT) AS tax,
                     CAST(l_returnflag = 'R' AS BIGINT) AS y
              FROM lineitem),
            scored AS (
              SELECT qty, disc, tax,
                     CAST(round(1.0 / (1.0 + exp(-(CAST(-2000000 +
                            10000 * qty + 100 * disc + 0 * tax
                            AS DOUBLE) / 1e6))) * 1e6, 0) AS BIGINT)
                       - y * 1000000 AS resid
              FROM base),
            agg AS (SELECT CAST(count(*) AS BIGINT) AS n,
                           sum(resid) AS g0,
                           sum(resid * qty) AS g1,
                           sum(resid * disc) AS g2,
                           sum(resid * tax) AS g3
                    FROM scored),
            rows_ AS (
              SELECT 'bias' AS feature, -2000000 AS w_old_micro,
                     CAST(g0 AS BIGINT) AS grad_micro,
                     CAST(round(CAST(-2000000 AS DOUBLE) -
                       0.1 * CAST(g0 AS DOUBLE) / CAST(n AS DOUBLE), 0)
                       AS BIGINT) AS w_new_micro
              FROM agg
              UNION ALL
              SELECT 'quantity', 10000, CAST(g1 AS BIGINT),
                     CAST(round(CAST(10000 AS DOUBLE) -
                       0.1 * CAST(g1 AS DOUBLE) / CAST(n AS DOUBLE), 0)
                       AS BIGINT)
              FROM agg
              UNION ALL
              SELECT 'discount_bp', 100, CAST(g2 AS BIGINT),
                     CAST(round(CAST(100 AS DOUBLE) -
                       0.1 * CAST(g2 AS DOUBLE) / CAST(n AS DOUBLE), 0)
                       AS BIGINT)
              FROM agg
              UNION ALL
              SELECT 'tax_bp', 0, CAST(g3 AS BIGINT),
                     CAST(round(CAST(0 AS DOUBLE) -
                       0.1 * CAST(g3 AS DOUBLE) / CAST(n AS DOUBLE), 0)
                       AS BIGINT)
              FROM agg)
            SELECT feature, CAST(w_old_micro AS BIGINT) AS w_old_micro,
                   grad_micro, w_new_micro
            FROM rows_ ORDER BY feature"""))

  val all: Seq[Q] = Seq(benford, trigrams, logregStep)
}
