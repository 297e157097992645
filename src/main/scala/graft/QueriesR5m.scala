package graft

import graft.engine.Ck.Ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

import graft.engine.Engine
import graft.operators.Graph

/** Round-5 batch 11: functional-dependency discovery, Gumbel
  * block-maxima tail fit, community modularity.
  */
object QueriesR5m {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Engine.table(s, dir, name)

  // ------- dq_fd_discovery: which functional dependencies hold?

  private val fdDiscovery = Q(
    "dq_fd_discovery",
    "Functional-dependency discovery over a candidate panel — the " +
      "schema-profiling step that finds the REAL keys and denormalized " +
      "copies in unfamiliar data (part of every FD-mining loop à la " +
      "TANE, here the verification kernel): six candidate A→B rules " +
      "across five tables ride ONE tagged union stream of (rule, lhs, " +
      "rhs) rows through a two-level aggregation — distinct-rhs per " +
      "lhs, then violating-lhs counts and the worst lhs's rhs fan-out. " +
      "Same single-shuffle shape as the PK/FK audits; cost scales with " +
      "the scanned columns, never the rule count.",
    (s, d) => {
      // the union stream ships (rid:int, lhs:long, rhs:long) — values
      // ride as xxhash64 of their string form instead of the strings
      // themselves (the hashed-key trade the dedup family documents:
      // ~20 bytes/row through the shuffle instead of 50+, counts
      // preserved; the oracle keeps exact strings), and the rule NAME
      // rejoins as a literal-map projection on the 6-row result
      val rules = Seq(
        ("orders: custkey->orderstatus", "orders",
          "o_custkey", "o_orderstatus"),
        ("lineitem: orderkey->returnflag", "lineitem",
          "l_orderkey", "l_returnflag"),
        ("lineitem: partkey->quantity", "lineitem",
          "l_partkey", "l_quantity"),
        ("events: user_id->event_type", "events",
          "user_id", "event_type"),
        ("documents: source->lang", "documents", "source", "lang"),
        ("part: brand->type", "part", "p_brand", "p_type"))
      val stream = rules.zipWithIndex.map { case ((_, tbl, a, b), i) =>
        t(s, d, tbl).select(lit(i).as("rid"),
          xxhash64(col(a).cast("string")).as("lhs"),
          xxhash64(col(b).cast("string")).as("rhs"))
      }.reduce(_ unionByName _)
      val ruleName = element_at(
        map(rules.zipWithIndex.flatMap { case ((r, _, _, _), i) =>
          Seq(lit(i), lit(r)) }: _*), col("rid"))
      def dd(c: String) = col(c).cast(DoubleType)
      stream
        .groupBy("rid", "lhs").agg(countDistinct("rhs").as("n_rhs"))
        .groupBy("rid")
        .agg(count(lit(1)).as("n_lhs"),
          sum(when(col("n_rhs") > 1, 1L).otherwise(0L)).cast(LongType)
            .as("violating_lhs"),
          max("n_rhs").cast(LongType).as("max_rhs_fanout"))
        .select(ruleName.as("rule"), col("n_lhs"), col("violating_lhs"),
          col("max_rhs_fanout"),
          round(dd("violating_lhs") * 1e6 / dd("n_lhs"), 0)
            .cast(LongType).as("violation_share_micro"),
          (col("violating_lhs") === 0).cast(LongType).as("holds"))
        .coalesce(1).sortWithinPartitions("rule")
    },
    Some {
      def cand(rule: String, tbl: String, a: String, b: String) =
        s"""SELECT '$rule' AS rule, CAST($a AS VARCHAR) AS lhs,
                   CAST($b AS VARCHAR) AS rhs FROM $tbl"""
      val stream = Seq(
        cand("orders: custkey->orderstatus", "orders",
          "o_custkey", "o_orderstatus"),
        cand("lineitem: orderkey->returnflag", "lineitem",
          "l_orderkey", "l_returnflag"),
        cand("lineitem: partkey->quantity", "lineitem",
          "l_partkey", "l_quantity"),
        cand("events: user_id->event_type", "events",
          "user_id", "event_type"),
        cand("documents: source->lang", "documents", "source", "lang"),
        cand("part: brand->type", "part", "p_brand", "p_type"))
        .mkString("(", " UNION ALL ", ")")
      s"""WITH stream AS $stream,
            per_lhs AS (
              SELECT rule, lhs,
                     CAST(count(DISTINCT rhs) AS BIGINT) AS n_rhs
              FROM stream GROUP BY 1, 2)
            SELECT rule, CAST(count(*) AS BIGINT) AS n_lhs,
                   CAST(sum(CASE WHEN n_rhs > 1 THEN 1 ELSE 0 END)
                     AS BIGINT) AS violating_lhs,
                   CAST(max(n_rhs) AS BIGINT) AS max_rhs_fanout,
                   CAST(round(CAST(sum(CASE WHEN n_rhs > 1 THEN 1
                       ELSE 0 END) AS DOUBLE) * 1e6 / count(*), 0)
                     AS BIGINT) AS violation_share_micro,
                   CAST(sum(CASE WHEN n_rhs > 1 THEN 1 ELSE 0 END) = 0
                     AS BIGINT) AS holds
            FROM per_lhs GROUP BY rule ORDER BY rule"""
    })

  // ------- stat_gumbel_maxima: extreme-value fit on block maxima

  private val gumbel = Q(
    "stat_gumbel_maxima",
    "Extreme-value analysis by block maxima: monthly maxima of daily " +
      "order revenue, Gumbel fit by the method of moments (β = sd·√6/π, " +
      "μ = mean − γβ with γ, π inlined as literals — no libm surface " +
      "beyond sqrt/ln), and the 12/60/120-month return levels μ − " +
      "β·ln(−ln(1−1/T)) — the 'how bad can a peak day get' planning " +
      "number, complementing stat_hill_tail's tail index. Daily and " +
      "monthly rollups are exact cents; the moment fold runs over the " +
      "calendar-bounded monthly frame.",
    (s, d) => {
      val daily = t(s, d, "orders")
        .groupBy(date_format(col("o_orderdate"), "yyyy-MM-dd").as("day"),
          date_format(col("o_orderdate"), "yyyy-MM").as("month"))
        .agg(sum(round(col("o_totalprice") * 100, 0).cast(LongType))
          .as("rev"))
      val monthly = daily.groupBy("month").agg(max("rev").as("mx"))
      val m = monthly.agg(count(lit(1)).as("n"), sum("mx").as("s1"),
        sum(expr("CAST(mx AS DECIMAL(38,0)) * mx")).as("s2"))
      def dd(c: String) = col(c).cast(DoubleType)
      val mean = dd("s1") / dd("n")
      val varE = (dd("s2") - dd("s1") * dd("s1") / dd("n")) /
        (dd("n") - 1)
      val beta = sqrt(varE) * 2.449489742783178 / 3.141592653589793
      val mu = mean - lit(0.5772156649015329) * beta
      def retLevel(tp: Int) =
        round(mu - beta * log(-log(lit(1.0) - 1.0 / tp)), 0)
          .cast(LongType)
      m.select(col("n").as("n_months"),
        round(mean, 0).cast(LongType).as("mean_max_cents"),
        round(sqrt(varE), 0).cast(LongType).as("sd_max_cents"),
        round(mu, 0).cast(LongType).as("gumbel_mu_cents"),
        round(beta, 0).cast(LongType).as("gumbel_beta_cents"),
        retLevel(12).as("rl_12mo_cents"),
        retLevel(60).as("rl_60mo_cents"),
        retLevel(120).as("rl_120mo_cents"))
    },
    Some("""WITH daily AS (
              SELECT strftime(o_orderdate, '%Y-%m-%d') AS day,
                     strftime(o_orderdate, '%Y-%m') AS month,
                     CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                       AS BIGINT) AS rev
              FROM orders GROUP BY 1, 2),
            monthly AS (
              SELECT month, CAST(max(rev) AS BIGINT) AS mx
              FROM daily GROUP BY 1),
            m AS (
              SELECT CAST(count(*) AS BIGINT) AS n,
                     CAST(sum(mx) AS BIGINT) AS s1,
                     sum(CAST(mx AS HUGEINT) * mx) AS s2
              FROM monthly),
            fit AS (
              SELECT n,
                     CAST(s1 AS DOUBLE) / n AS mean,
                     sqrt((CAST(s2 AS DOUBLE) -
                           CAST(s1 AS DOUBLE) * s1 / n) / (n - 1)) AS sd,
                     sqrt((CAST(s2 AS DOUBLE) -
                           CAST(s1 AS DOUBLE) * s1 / n) / (n - 1)) *
                       2.449489742783178 / 3.141592653589793 AS beta
              FROM m)
            SELECT n AS n_months,
                   CAST(round(mean, 0) AS BIGINT) AS mean_max_cents,
                   CAST(round(sd, 0) AS BIGINT) AS sd_max_cents,
                   CAST(round(mean - 0.5772156649015329 * beta, 0)
                     AS BIGINT) AS gumbel_mu_cents,
                   CAST(round(beta, 0) AS BIGINT) AS gumbel_beta_cents,
                   CAST(round(mean - 0.5772156649015329 * beta -
                     beta * ln(-ln(1.0 - 1.0 / 12)), 0) AS BIGINT)
                     AS rl_12mo_cents,
                   CAST(round(mean - 0.5772156649015329 * beta -
                     beta * ln(-ln(1.0 - 1.0 / 60)), 0) AS BIGINT)
                     AS rl_60mo_cents,
                   CAST(round(mean - 0.5772156649015329 * beta -
                     beta * ln(-ln(1.0 - 1.0 / 120)), 0) AS BIGINT)
                     AS rl_120mo_cents
            FROM fit"""))

  // ------- g16_modularity: partition quality of the nation communities

  private val modularity = Q(
    "g16_modularity",
    "Newman modularity of the nation partition on the co-purchase " +
      "backbone — the quality score for ANY community assignment " +
      "(g8's label propagation, g9's cut family): per community c, " +
      "Q_c = e_c/m − (d_c/2m)², from exact integer edge/degree counts " +
      "(e_c = within-community edges, d_c = community degree sum, m = " +
      "backbone size). One broadcast supplier→nation map onto the " +
      "memoized ≤2000-edge backbone, two tiny rollups; Q contributions " +
      "micro-rounded per community so the total is reconstructible " +
      "exactly.",
    (s, d) => {
      val nat = t(s, d, "supplier")
        .select(col("s_suppkey").as("node"),
          col("s_nationkey").cast(LongType).as("com"))
      val ed = Graph.backbone(s, d).select("a", "b")
        .join(broadcast(nat.withColumnRenamed("node", "a")
          .withColumnRenamed("com", "ca")), "a")
        .join(broadcast(nat.withColumnRenamed("node", "b")
          .withColumnRenamed("com", "cb")), "b")
        // lazy (round 9; was eager): the count() below is the single
        // materializing job — an eager checkpoint here was a second
        // blocking job for the same blocks
        .ckpt(false)
      val m = ed.count()
      val internal = ed.filter(col("ca") === col("cb"))
        .groupBy(col("ca").as("com")).agg(count(lit(1)).as("e_in"))
      val degree = ed.select(col("ca").as("com"))
        .unionAll(ed.select(col("cb").as("com")))
        .groupBy("com").agg(count(lit(1)).as("d_sum"))
      def dd(c: String) = col(c).cast(DoubleType)
      degree.join(internal, Seq("com"), "left").na.fill(0L, Seq("e_in"))
        .select(col("com").as("community"), col("e_in"), col("d_sum"),
          round((dd("e_in") / m -
            (dd("d_sum") / (2.0 * m)) * (dd("d_sum") / (2.0 * m))) * 1e6,
            0).cast(LongType).as("q_contrib_micro"))
        .transform(graft.engine.Ops.reportSort("community"))
    },
    Some("""WITH ed0 AS MATERIALIZED (
                SELECT DISTINCT o_custkey AS c, l_suppkey AS s
                FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
            cap AS (SELECT c, list_sort(list(DISTINCT s))[1:20] AS ss
                    FROM ed0 GROUP BY c),
            pr AS (SELECT unnest(flatten(list_transform(range(1, len(ss)),
                     i -> list_transform(range(i + 1, len(ss) + 1),
                       j -> {'a': ss[i], 'b': ss[j]})))) AS p
                   FROM cap WHERE len(ss) >= 2),
            e0 AS MATERIALIZED (
                SELECT a, b FROM (SELECT p.a AS a, p.b AS b,
                                         count(*) AS n
                                  FROM pr GROUP BY p.a, p.b
                                  ORDER BY n DESC, a, b LIMIT 2000)),
            tagged AS MATERIALIZED (
                SELECT a, b, na.s_nationkey AS ca, nb.s_nationkey AS cb
                FROM e0
                JOIN supplier na ON e0.a = na.s_suppkey
                JOIN supplier nb ON e0.b = nb.s_suppkey),
            m AS (SELECT CAST(count(*) AS BIGINT) AS m FROM tagged),
            internal AS (
                SELECT ca AS com, CAST(count(*) AS BIGINT) AS e_in
                FROM tagged WHERE ca = cb GROUP BY 1),
            degree AS (
                SELECT com, CAST(count(*) AS BIGINT) AS d_sum FROM (
                  SELECT ca AS com FROM tagged
                  UNION ALL SELECT cb AS com FROM tagged)
                GROUP BY 1)
            SELECT CAST(degree.com AS BIGINT) AS community,
                   coalesce(e_in, 0) AS e_in, d_sum,
                   CAST(round((CAST(coalesce(e_in, 0) AS DOUBLE) / m -
                     (CAST(d_sum AS DOUBLE) / (2.0 * m)) *
                     (CAST(d_sum AS DOUBLE) / (2.0 * m))) * 1e6, 0)
                     AS BIGINT) AS q_contrib_micro
            FROM degree LEFT JOIN internal ON degree.com = internal.com
            CROSS JOIN m
            ORDER BY community"""))

  val all: Seq[Q] = Seq(fdDiscovery, gumbel, modularity)
}
