package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.engine.Engine
import graft.operators.Graph

/** Round-3 batch 38: point-in-time trailing-window feature join,
  * community conductance on the co-purchase backbone, and Holt linear
  * smoothing evaluated as an exact dyadic-coefficient dot product.
  */
object QueriesR4l {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Engine.table(s, dir, name)

  // ------------- j23_pit_feature_join: trailing-7d clicks per purchase

  private val pitFeature = Q(
    "j23_pit_feature_join",
    "Point-in-time feature join — the feature-store primitive behind " +
      "every leakage-free training set: for each user's purchase day, " +
      "the trailing-7-day click count AS OF that day (never a future " +
      "click). The join is user-keyed with a day-range predicate " +
      "BOUNDED at 7 candidate rows per purchase day (both sides " +
      "pre-aggregated to daily grain first), so it can never blow up " +
      "into a pair space; at 100 TB the same shape runs as cum-sum " +
      "diffs over an as-of merge, identical semantics. Purchases with " +
      "zero trailing clicks survive via the left join (coalesce 0) — " +
      "dropping them would bias the label set.",
    (s, d) => {
      val clicks = t(s, d, "events")
        .filter(col("event_type") === "click")
        .groupBy(col("user_id"), to_date(col("ts")).as("cday"))
        .agg(count(lit(1)).as("c"))
      val purch = t(s, d, "events")
        .filter(col("event_type") === "purchase")
        .groupBy(col("user_id"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n_purchases"))
      purch.join(clicks,
          purch("user_id") === clicks("user_id") &&
            datediff(col("day"), col("cday")).between(0, 6), "left")
        .groupBy(purch("user_id").as("user_id"), col("day"),
          col("n_purchases"))
        .agg(coalesce(sum("c"), lit(0L)).cast(LongType).as("clicks_7d"))
        .select(col("user_id"),
          date_format(col("day"), "yyyy-MM-dd").as("day"),
          col("n_purchases"), col("clicks_7d"))
        .transform(graft.engine.Ops.reportSort("user_id", "day"))
    },
    Some("""WITH clicks AS (
              SELECT user_id, CAST(ts AS DATE) AS cday,
                     CAST(count(*) AS BIGINT) AS c
              FROM events WHERE event_type = 'click' GROUP BY 1, 2),
            purch AS (
              SELECT user_id, CAST(ts AS DATE) AS day,
                     CAST(count(*) AS BIGINT) AS n_purchases
              FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
            SELECT p.user_id, strftime(p.day, '%Y-%m-%d') AS day,
                   p.n_purchases,
                   CAST(coalesce(sum(c.c), 0) AS BIGINT) AS clicks_7d
            FROM purch p LEFT JOIN clicks c
              ON p.user_id = c.user_id
             AND date_diff('day', c.cday, p.day) BETWEEN 0 AND 6
            GROUP BY 1, 2, 3
            ORDER BY p.user_id, day"""))

  // ------------- g9_conductance: community cut quality

  private val conductance = Q(
    "g9_conductance",
    "Community conductance on the co-purchase backbone (g3/g6's " +
      "top-2000 capped edge list): communities form by ONE " +
      "deterministic min-label round (each node takes the smallest id " +
      "in its closed neighborhood — the first sweep of label " +
      "propagation), then each community is scored by the standard cut " +
      "quality φ(C) = cut(C) / min(vol(C), vol(V∖C)) — the metric " +
      "that tells a partitioner whether a community is real or an " +
      "artifact. Labels and degrees are one aggregation over the " +
      "bounded backbone; the cut is two broadcast label lookups on " +
      "the 2000 edges. Everything downstream of the backbone cap is " +
      "bounded work at any corpus size.",
    (s, d) => {
      // memoized top-2000 backbone (Graph.backbone) — shared across the
      // graph family instead of rebuilt per query
      val e0 = Graph.backbone(s, d).select("a", "b")
      val und = e0.select(col("a").as("v"), col("b").as("w"))
        .unionAll(e0.select(col("b").as("v"), col("a").as("w")))
      val nodes = und.groupBy("v")
        .agg(least(col("v"), min("w")).as("label"),
          count(lit(1)).cast(LongType).as("deg"))
      val labels = nodes.select(col("v"), col("label"))
      val vols = nodes.groupBy("label")
        .agg(count(lit(1)).as("n_nodes"), sum("deg").cast(LongType).as("vol"))
      val tot = vols.agg(sum("vol").cast(LongType).as("total_vol"))
      val cutEdges = e0
        .join(broadcast(labels.withColumnRenamed("v", "a")
          .withColumnRenamed("label", "la")), "a")
        .join(broadcast(labels.withColumnRenamed("v", "b")
          .withColumnRenamed("label", "lb")), "b")
        .filter(col("la") =!= col("lb"))
      val cuts = cutEdges.select(col("la").as("label"))
        .unionAll(cutEdges.select(col("lb").as("label")))
        .groupBy("label").agg(count(lit(1)).cast(LongType).as("cut"))
      vols.join(cuts, Seq("label"), "left")
        .na.fill(0L, Seq("cut"))
        .crossJoin(broadcast(tot))
        .select(col("label").as("community"), col("n_nodes"),
          col("vol"), col("cut").cast(LongType).as("cut"),
          round(when(least(col("vol"), col("total_vol") - col("vol")) > 0,
            col("cut").cast("double") /
              least(col("vol"), col("total_vol") - col("vol"))
                .cast("double")), 6).as("conductance"))
        .transform(graft.engine.Ops.reportSort("community"))
    },
    Some("""WITH ed AS MATERIALIZED (
                SELECT DISTINCT o_custkey AS c, l_suppkey AS s
                FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
            cap AS (SELECT c, list_sort(list(DISTINCT s))[1:20] AS ss
                    FROM ed GROUP BY c),
            pr AS (SELECT unnest(flatten(list_transform(range(1, len(ss)),
                     i -> list_transform(range(i + 1, len(ss) + 1),
                       j -> {'a': ss[i], 'b': ss[j]})))) AS p
                   FROM cap WHERE len(ss) >= 2),
            e0 AS MATERIALIZED (
                SELECT a, b FROM (SELECT p.a AS a, p.b AS b,
                                         count(*) AS n
                                  FROM pr GROUP BY p.a, p.b
                                  ORDER BY n DESC, a, b LIMIT 2000)),
            und AS (SELECT a AS v, b AS w FROM e0
                    UNION ALL SELECT b AS v, a AS w FROM e0),
            nodes AS MATERIALIZED (
                SELECT v, least(v, min(w)) AS label,
                       CAST(count(*) AS BIGINT) AS deg
                FROM und GROUP BY v),
            vols AS (SELECT label, CAST(count(*) AS BIGINT) AS n_nodes,
                            CAST(sum(deg) AS BIGINT) AS vol
                     FROM nodes GROUP BY 1),
            tot AS (SELECT CAST(sum(vol) AS BIGINT) AS total_vol
                    FROM vols),
            ce AS MATERIALIZED (
                SELECT na.label AS la, nb.label AS lb
                FROM e0 JOIN nodes na ON e0.a = na.v
                        JOIN nodes nb ON e0.b = nb.v
                WHERE na.label <> nb.label),
            cuts AS (SELECT label, CAST(count(*) AS BIGINT) AS cut
                     FROM (SELECT la AS label FROM ce
                           UNION ALL SELECT lb AS label FROM ce)
                     GROUP BY 1)
            SELECT vols.label AS community, n_nodes, vol,
                   CAST(coalesce(cut, 0) AS BIGINT) AS cut,
                   round(CASE WHEN least(vol, total_vol - vol) > 0
                         THEN CAST(coalesce(cut, 0) AS DOUBLE) /
                              least(vol, total_vol - vol) END, 6)
                     AS conductance
            FROM vols LEFT JOIN cuts ON vols.label = cuts.label, tot
            ORDER BY community"""))

  // ------------- w29_holt_point: exact dyadic Holt linear smoothing

  /** Holt's linear smoothing with α=1/2, β=1/4 over exactly 10
    * observations unrolls to an EXACT dyadic-rational dot product over
    * (y₁..y₁₀): level and trend numerators are computed here once by
    * BigInt recurrence (l_t=(y_t+l+b)/2, b_t=(l_t−l_{t−1}+3b)/4 with
    * l₁=y₁, b₁=y₂−y₁), so both engines evaluate Σpᵢyᵢ/2^k — integer
    * math plus one exact power-of-two division, no float recursion
    * drift.
    */
  private[graft] val (holtLevelNum, holtTrendNum, holtDen): (Seq[Long], Seq[Long], Long) = {
    val K = 10
    def e(i: Int): Vector[BigInt] =
      Vector.tabulate(K)(j => if (j == i - 1) BigInt(1) else BigInt(0))
    // (numerator vector, power-of-two denominator)
    var l = (e(1), BigInt(1))
    var b = (e(2).zip(e(1)).map { case (x, y) => x - y }, BigInt(1))
    for (tt <- 2 to K) {
      val c = l._2.max(b._2) // common power-of-two denominator
      val lC = l._1.map(_ * (c / l._2))
      val bC = b._1.map(_ * (c / b._2))
      val lNew = (e(tt).map(_ * c).lazyZip(lC).lazyZip(bC)
        .map((a, x, y) => a + x + y), c * 2)
      val bNew = (lNew._1.lazyZip(lC).lazyZip(bC)
        .map((lt, lp, bp) => lt - 2 * lp + 6 * bp), c * 8)
      l = lNew; b = bNew
    }
    val den = l._2.max(b._2)
    (l._1.map(x => (x * (den / l._2)).toLong),
      b._1.map(x => (x * (den / b._2)).toLong), den.toLong)
  }

  private val holt = Q(
    "w29_holt_point",
    "Holt linear exponential smoothing (α=1/2, β=1/4) over each " +
      "user's last 10 daily volumes, evaluated NOT by a sequential " +
      "recursion but as an exact dyadic-coefficient dot product: the " +
      "recurrence unrolls at plan-build time into Σpᵢ·yᵢ/2²⁸ with " +
      "BigInt-derived integer numerators, so level, trend, and the " +
      "one-step forecast are exact integer arithmetic plus one " +
      "power-of-two division — bit-identical on every engine, " +
      "partitioning, and run. One groupBy pivots the 10 lags into " +
      "columns (single shuffle on user_id); users with fewer than 10 " +
      "observed days are excluded by contract.",
    (s, d) => {
      val daily = t(s, d, "events")
        .groupBy(col("user_id"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("y"))
      val idx = daily
        .withColumn("rnd", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("user_id").orderBy(desc("day"))))
        .filter(col("rnd") <= 10)
        .withColumn("i", lit(11) - col("rnd"))
      val wide = idx.groupBy("user_id")
        .agg(count(lit(1)).as("n"),
          (1 to 10).map(i =>
            sum(when(col("i") === i, col("y"))).as(s"y$i")): _*)
        .filter(col("n") === 10)
      def dot(nums: Seq[Long]): Column =
        (1 to 10).map(i => lit(nums(i - 1)) * col(s"y$i"))
          .reduce(_ + _).cast(LongType)
      wide
        .withColumn("lv_num", dot(holtLevelNum))
        .withColumn("tr_num", dot(holtTrendNum))
        .select(col("user_id"),
          round(col("lv_num").cast("double") / holtDen.toDouble, 6)
            .as("level"),
          round(col("tr_num").cast("double") / holtDen.toDouble, 6)
            .as("trend"),
          round((col("lv_num") + col("tr_num")).cast("double") /
            holtDen.toDouble, 6).as("forecast_next"))
        .transform(graft.engine.Ops.reportSort("user_id"))
    },
    Some {
      val lvTerms = (1 to 10).map(i =>
        s"${holtLevelNum(i - 1)} * y$i").mkString(" + ")
      val trTerms = (1 to 10).map(i =>
        s"${holtTrendNum(i - 1)} * y$i").mkString(" + ")
      val yCols = (1 to 10).map(i =>
        s"CAST(sum(CASE WHEN i = $i THEN y END) AS BIGINT) AS y$i")
        .mkString(", ")
      s"""WITH daily AS (
            SELECT user_id, CAST(ts AS DATE) AS day,
                   CAST(count(*) AS BIGINT) AS y
            FROM events GROUP BY 1, 2),
          idx AS (
            SELECT user_id, y,
                   11 - row_number() OVER (PARTITION BY user_id
                     ORDER BY day DESC) AS i
            FROM daily
            QUALIFY row_number() OVER (PARTITION BY user_id
              ORDER BY day DESC) <= 10),
          wide AS (
            SELECT user_id, count(*) AS n, $yCols
            FROM idx GROUP BY 1),
          nums AS (
            SELECT user_id,
                   CAST($lvTerms AS BIGINT) AS lv_num,
                   CAST($trTerms AS BIGINT) AS tr_num
            FROM wide WHERE n = 10)
          SELECT user_id,
                 round(CAST(lv_num AS DOUBLE) / $holtDen, 6) AS level,
                 round(CAST(tr_num AS DOUBLE) / $holtDen, 6) AS trend,
                 round(CAST(lv_num + tr_num AS DOUBLE) / $holtDen, 6)
                   AS forecast_next
          FROM nums ORDER BY user_id"""
    })

  val all: Seq[Q] = Seq(pitFeature, conductance, holt)
}
