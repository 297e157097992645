package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

import graft.engine.Engine

/** Round-5 batch 15: Neyman allocation, Fleiss kappa, position-bias
  * IPS correction.
  */
object QueriesR5q {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Engine.table(s, dir, name)

  // ------- curate_neyman_allocation: optimal stratified sampling

  private val neyman = Q(
    "curate_neyman_allocation",
    "Neyman-optimal stratified sample allocation — the upgrade over " +
      "curate_stratified_sample's proportional split: a 1000-unit " +
      "budget allocates n_h ∝ N_h·σ_h (big AND volatile strata get " +
      "more), with per-stratum σ from exact integer (cents) moment " +
      "sums over customer balances by market segment. One keyed " +
      "rollup, a broadcast total, integer largest-float rounding on " +
      "both engines; the side-by-side proportional column shows what " +
      "the optimization moved.",
    (s, d) => {
      val grp = t(s, d, "customer")
        .select(col("c_mktsegment").as("stratum"),
          round(col("c_acctbal") * 100, 0).cast(LongType).as("c"))
        .groupBy("stratum")
        .agg(count(lit(1)).as("nh"), sum("c").as("s1"),
          sum(col("c") * col("c")).as("s2"))
      def dd(c: String) = col(c).cast(DoubleType)
      val sd = sqrt((dd("s2") - dd("s1") * dd("s1") / dd("nh")) /
        (dd("nh") - 1))
      val scored = grp.select(col("stratum"), col("nh"),
        round(sd, 1).as("sdr"))
      val tot = scored.agg(sum(col("nh").cast(DoubleType) * col("sdr"))
        .as("t_ns"), sum("nh").as("t_n"))
      scored.crossJoin(broadcast(tot))
        .select(col("stratum"), col("nh").as("n_stratum"),
          round(col("sdr") * 10, 0).cast(LongType).as("sd_decicents"),
          round(dd("nh") * col("sdr") * 1000.0 / col("t_ns"), 0)
            .cast(LongType).as("n_neyman"),
          round(dd("nh") * 1000.0 / dd("t_n"), 0).cast(LongType)
            .as("n_proportional"))
        .transform(graft.engine.Ops.reportSort("stratum"))
    },
    Some("""WITH grp AS (
              SELECT c_mktsegment AS stratum,
                     CAST(count(*) AS BIGINT) AS nh,
                     CAST(sum(CAST(round(c_acctbal * 100, 0) AS BIGINT))
                       AS BIGINT) AS s1,
                     CAST(sum(CAST(round(c_acctbal * 100, 0) AS BIGINT) *
                       CAST(round(c_acctbal * 100, 0) AS BIGINT))
                       AS BIGINT) AS s2
              FROM customer GROUP BY 1),
            scored AS (
              SELECT stratum, nh,
                     round(sqrt((CAST(s2 AS DOUBLE) -
                       CAST(s1 AS DOUBLE) * s1 / nh) / (nh - 1)), 1)
                       AS sdr
              FROM grp),
            tot AS (
              SELECT sum(CAST(nh AS DOUBLE) * sdr) AS t_ns,
                     CAST(sum(nh) AS BIGINT) AS t_n
              FROM scored)
            SELECT stratum, nh AS n_stratum,
                   CAST(round(sdr * 10, 0) AS BIGINT) AS sd_decicents,
                   CAST(round(CAST(nh AS DOUBLE) * sdr * 1000.0 / t_ns,
                     0) AS BIGINT) AS n_neyman,
                   CAST(round(CAST(nh AS DOUBLE) * 1000.0 / t_n, 0)
                     AS BIGINT) AS n_proportional
            FROM scored CROSS JOIN tot
            ORDER BY stratum"""))

  // ------- ml_fleiss_kappa: multi-rater agreement for labeling QA

  private val fleiss = Q(
    "ml_fleiss_kappa",
    "Fleiss' κ over a 3-rater labeling panel — the agreement gate an " +
      "annotation (or LLM-judge ensemble) pipeline applies before " +
      "trusting labels: items are the first 500 orders, each 'rater' " +
      "reproduces the true 5-way label (priority digit) except on a " +
      "deterministic-mixer 20% slice where it slips to a different " +
      "category — the standard synthetic-noise harness for agreement " +
      "code. κ = (P̄−P̄_e)/(1−P̄_e) with P̄ from per-item category " +
      "counts (n=3) and P̄_e from squared category prevalences — all " +
      "exact integer counts until two final double ratios.",
    (s, d) => {
      val items = t(s, d, "orders").filter(col("o_orderkey") <= 500)
        .select(col("o_orderkey").as("item"),
          substring(col("o_orderpriority"), 1, 1).cast(LongType)
            .as("truth"))
      val ratings = items.select(col("item"), col("truth"),
          explode(expr("array(1L, 2L, 3L)")).as("rater"))
        .withColumn("a1",
          expr("((item * 31 + rater) * 2654435761L) % 2147483648L"))
        .withColumn("mix", expr("(a1 div 1024 + a1) % 10"))
        .select(col("item"),
          when(col("mix") < 2,
            (col("truth") + col("mix") % 4) % 5 + 1)
            .otherwise(col("truth")).as("label"))
      val cell = ratings.groupBy("item", "label")
        .agg(count(lit(1)).as("nic"))
      def dd(c: String) = col(c).cast(DoubleType)
      val perItem = cell.groupBy("item")
        .agg(sum(col("nic") * col("nic")).as("ss"))
      val pbar = perItem.agg(count(lit(1)).as("n_items"),
        sum("ss").as("sss"))
        .select(col("n_items"),
          ((dd("sss") - dd("n_items") * 3.0) /
            (dd("n_items") * 3.0 * 2.0)).as("pbar"))
      val pe = cell.groupBy("label").agg(sum("nic").as("nc"))
        .agg(sum(col("nc") * col("nc")).as("snc"),
          sum("nc").as("tot"))
        .select((dd("snc") / (dd("tot") * dd("tot"))).as("pe"))
      pbar.crossJoin(broadcast(pe))
        .select(col("n_items"),
          round(col("pbar") * 1e6, 0).cast(LongType).as("pbar_micro"),
          round(col("pe") * 1e6, 0).cast(LongType).as("pe_micro"),
          round((col("pbar") - col("pe")) / (lit(1.0) - col("pe")) * 1e6,
            0).cast(LongType).as("kappa_micro"))
    },
    Some("""WITH items AS (
              SELECT o_orderkey AS item,
                     CAST(substr(o_orderpriority, 1, 1) AS BIGINT)
                       AS truth
              FROM orders WHERE o_orderkey <= 500),
            ratings AS (
              SELECT item,
                     CASE WHEN (a1 // 1024 + a1) % 10 < 2
                          THEN (truth + ((a1 // 1024 + a1) % 10) % 4)
                                 % 5 + 1
                          ELSE truth END AS label
              FROM (SELECT item, truth, rater,
                           ((item * 31 + rater) * 2654435761)
                             % 2147483648 AS a1
                    FROM items
                    CROSS JOIN (SELECT unnest([1, 2, 3]) AS rater))),
            cell AS (
              SELECT item, label, CAST(count(*) AS BIGINT) AS nic
              FROM ratings GROUP BY 1, 2),
            per_item AS (
              SELECT item, CAST(sum(nic * nic) AS BIGINT) AS ss
              FROM cell GROUP BY 1),
            pbar AS (
              SELECT CAST(count(*) AS BIGINT) AS n_items,
                     (CAST(sum(ss) AS DOUBLE) - count(*) * 3.0) /
                       (count(*) * 3.0 * 2.0) AS pbar
              FROM per_item),
            pe AS (
              SELECT CAST(sum(nc * nc) AS DOUBLE) /
                       (CAST(sum(nc) AS DOUBLE) * sum(nc)) AS pe
              FROM (SELECT label, CAST(sum(nic) AS BIGINT) AS nc
                    FROM cell GROUP BY 1))
            SELECT n_items,
                   CAST(round(pbar * 1e6, 0) AS BIGINT) AS pbar_micro,
                   CAST(round(pe * 1e6, 0) AS BIGINT) AS pe_micro,
                   CAST(round((pbar - pe) / (1.0 - pe) * 1e6, 0)
                     AS BIGINT) AS kappa_micro
            FROM pbar CROSS JOIN pe"""))

  // ------- ml_position_bias_ips: examination bias + IPS correction

  private val positionBias = Q(
    "ml_position_bias_ips",
    "Position-bias estimation + inverse-propensity correction — the " +
      "counterfactual step that turns logged clicks into unbiased " +
      "relevance signal for ranker training: the props payload's k " +
      "field maps events to display positions 0..9, per-position CTR " +
      "= clicks/views, examination propensity = CTR_p / CTR_0 (the " +
      "position-1 normalization of the standard examination model), " +
      "and IPS-corrected clicks re-weight each position's clicks by " +
      "1/propensity — positions then agree if the bias model holds. " +
      "One rollup over the JSON-extracted position; the position-0 " +
      "row broadcasts as the normalizer.",
    (s, d) => {
      val pos = t(s, d, "events")
        .filter(col("event_type").isin("view", "click"))
        .select((get_json_object(col("props"), "$.k").cast(LongType)
          % 10).as("position"), col("event_type"))
        .groupBy("position")
        .agg(sum(when(col("event_type") === "view", 1L).otherwise(0L))
          .as("views"),
          sum(when(col("event_type") === "click", 1L).otherwise(0L))
            .as("clicks"))
      def dd(c: String) = col(c).cast(DoubleType)
      val p0 = pos.filter(col("position") === 0)
        .select((dd("clicks") / dd("views")).as("ctr0"))
      pos.crossJoin(broadcast(p0))
        .select(col("position"), col("views"), col("clicks"),
          round(dd("clicks") * 1e6 / dd("views"), 0).cast(LongType)
            .as("ctr_micro"),
          round(dd("clicks") / dd("views") / col("ctr0") * 1e6, 0)
            .cast(LongType).as("propensity_micro"),
          round(dd("clicks") / (dd("clicks") / dd("views") / col("ctr0")),
            0).cast(LongType).as("ips_clicks"))
        .transform(graft.engine.Ops.reportSort("position"))
    },
    Some("""WITH pos AS (
              SELECT CAST(json_extract_string(props, '$.k') AS BIGINT)
                       % 10 AS position,
                     CAST(sum(CASE WHEN event_type = 'view' THEN 1
                       ELSE 0 END) AS BIGINT) AS views,
                     CAST(sum(CASE WHEN event_type = 'click' THEN 1
                       ELSE 0 END) AS BIGINT) AS clicks
              FROM events
              WHERE event_type IN ('view', 'click')
              GROUP BY 1),
            p0 AS (
              SELECT CAST(clicks AS DOUBLE) / views AS ctr0
              FROM pos WHERE position = 0)
            SELECT position, views, clicks,
                   CAST(round(CAST(clicks AS DOUBLE) * 1e6 / views, 0)
                     AS BIGINT) AS ctr_micro,
                   CAST(round(CAST(clicks AS DOUBLE) / views / ctr0
                     * 1e6, 0) AS BIGINT) AS propensity_micro,
                   CAST(round(CAST(clicks AS DOUBLE) /
                     (CAST(clicks AS DOUBLE) / views / ctr0), 0)
                     AS BIGINT) AS ips_clicks
            FROM pos CROSS JOIN p0
            ORDER BY position"""))

  val all: Seq[Q] = Seq(neyman, fleiss, positionBias)
}
