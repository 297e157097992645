package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.{DoubleType, LongType}

import graft.engine.Engine

/** Round-5 batch 7: Hodges-Lehmann shift estimator, Granger-lite lag
  * regression, step-indexed event flow, interval-to-calendar proration.
  */
object QueriesR5i {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Engine.table(s, dir, name)

  // ------- stat_hodges_lehmann: robust two-sample shift per nation

  private val hodgesLehmann = Q(
    "stat_hodges_lehmann",
    "Hodges-Lehmann two-sample shift estimate per nation — the robust " +
      "median-of-pairwise-differences complement to the inventory's " +
      "Mann-Whitney (which only says WHETHER groups differ, not by how " +
      "much): per nation, the median over all (supplier acctbal − " +
      "customer acctbal) pairs, in exact cents. The pair space is " +
      "bounded by a deterministic per-nation panel cap (first 100 " +
      "customers by key — the audit-on-a-sample shape, since HL is " +
      "O(n·m) by construction); groups are keyed on nation so every " +
      "nation's pair block shuffles independently. The median of " +
      "integer cents interpolates at worst to a half-cent — exact in " +
      "IEEE double on both engines.",
    (s, d) => {
      val wCap = Window.partitionBy("c_nationkey").orderBy("c_custkey")
      val cust = t(s, d, "customer")
        .select(col("c_nationkey").as("nk"), col("c_custkey"),
          round(col("c_acctbal") * 100, 0).cast(LongType).as("cb"))
        .withColumn("rk", row_number().over(
          Window.partitionBy("nk").orderBy("c_custkey")))
        .filter(col("rk") <= 100)
        .select("nk", "cb")
      val supp = t(s, d, "supplier")
        .select(col("s_nationkey").as("nk"),
          round(col("s_acctbal") * 100, 0).cast(LongType).as("sb"))
      cust.join(supp, "nk")
        .select(col("nk"), (col("sb") - col("cb")).as("diff"))
        .groupBy("nk")
        .agg(count(lit(1)).as("n_pairs"),
          round(expr("percentile(diff, 0.5)"), 1).as("hl_shift_cents"))
        .select(col("nk").as("nationkey"), col("n_pairs"),
          round(col("hl_shift_cents") * 10, 0).cast(LongType)
            .as("hl_shift_decicents"))
        .transform(graft.engine.Ops.reportSort("nationkey"))
    },
    Some("""WITH cust AS (
              SELECT nk, cb FROM (
                SELECT c_nationkey AS nk,
                       CAST(round(c_acctbal * 100, 0) AS BIGINT) AS cb,
                       row_number() OVER (PARTITION BY c_nationkey
                                          ORDER BY c_custkey) AS rk
                FROM customer)
              WHERE rk <= 100),
            supp AS (
              SELECT s_nationkey AS nk,
                     CAST(round(s_acctbal * 100, 0) AS BIGINT) AS sb
              FROM supplier),
            pairs AS (
              SELECT cust.nk, sb - cb AS diff
              FROM cust JOIN supp ON cust.nk = supp.nk)
            SELECT nk AS nationkey, CAST(count(*) AS BIGINT) AS n_pairs,
                   CAST(round(round(quantile_cont(diff, 0.5), 1) * 10, 0)
                     AS BIGINT) AS hl_shift_decicents
            FROM pairs GROUP BY 1 ORDER BY 1"""))

  // ------- stat_granger_lite: does yesterday's clicks predict today's buys?

  private val grangerLite = Q(
    "stat_granger_lite",
    "Granger-style lag-1 predictivity test: does yesterday's CLICK " +
      "count improve today's PURCHASE-revenue prediction beyond " +
      "yesterday's revenue alone? Closed-form two-regressor OLS on the " +
      "daily series — b = Σ⁻¹·a assembled from exact whole-dollar " +
      "BIGINT moment sums (no iterative fit), comparing R² of the " +
      "full model vs the AR(1) baseline. The lag and the moment fold " +
      "ride the DAILY frame (calendar-bounded, ~2.4k rows at any " +
      "corpus size); the raw events table is reduced by one keyed day " +
      "rollup first. Output is a single row of micro-rounded " +
      "coefficients — flat BIGINT moments make every float op " +
      "identical on both engines.",
    (s, d) => {
      val ev = t(s, d, "events")
      val daily = ev
        .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
        .agg(
          sum(when(col("event_type") === "purchase",
            round(col("value"), 0).cast(LongType)).otherwise(0L)).as("y"),
          sum(when(col("event_type") === "click", 1L).otherwise(0L))
            .as("x"))
      val wLag = Window.partitionBy(lit(1)).orderBy("day")
      val lagged = daily
        .withColumn("z", lag("y", 1).over(wLag))
        .withColumn("xl", lag("x", 1).over(wLag))
        .filter(col("z").isNotNull)
      val m = lagged.agg(count(lit(1)).as("n"),
        sum("y").as("sy"), sum("z").as("sz"), sum("xl").as("sx"),
        sum(col("y") * col("y")).as("syy"),
        sum(col("z") * col("z")).as("szz"),
        sum(col("xl") * col("xl")).as("sxx"),
        sum(col("z") * col("y")).as("szy"),
        sum(col("xl") * col("y")).as("sxy"),
        sum(col("z") * col("xl")).as("szx"))
      def dd(c: String) = col(c).cast(DoubleType)
      val withCov = m.select(col("n"),
        (dd("szy") - dd("sz") * dd("sy") / dd("n")).as("a1"),
        (dd("sxy") - dd("sx") * dd("sy") / dd("n")).as("a2"),
        (dd("szz") - dd("sz") * dd("sz") / dd("n")).as("s11"),
        (dd("sxx") - dd("sx") * dd("sx") / dd("n")).as("s22"),
        (dd("szx") - dd("sz") * dd("sx") / dd("n")).as("s12"),
        (dd("syy") - dd("sy") * dd("sy") / dd("n")).as("svy"))
      withCov.select(col("n"),
          round(((col("a1") * col("s22") - col("a2") * col("s12")) /
            (col("s11") * col("s22") - col("s12") * col("s12"))) * 1e6, 0)
            .cast(LongType).as("b_ar_micro"),
          round(((col("a2") * col("s11") - col("a1") * col("s12")) /
            (col("s11") * col("s22") - col("s12") * col("s12"))) * 1e6, 0)
            .cast(LongType).as("b_x_micro"),
          round(col("a1") * col("a1") / (col("s11") * col("svy")) * 1e6, 0)
            .cast(LongType).as("r2_ar1_micro"),
          round(((col("a1") * col("s22") - col("a2") * col("s12")) *
            col("a1") +
            (col("a2") * col("s11") - col("a1") * col("s12")) *
              col("a2")) /
            ((col("s11") * col("s22") - col("s12") * col("s12")) *
              col("svy")) * 1e6, 0)
            .cast(LongType).as("r2_full_micro"))
    },
    Some("""WITH daily AS (
              SELECT strftime(ts, '%Y-%m-%d') AS day,
                     CAST(sum(CASE WHEN event_type = 'purchase'
                       THEN CAST(round(value, 0) AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS y,
                     CAST(sum(CASE WHEN event_type = 'click'
                       THEN 1 ELSE 0 END) AS BIGINT) AS x
              FROM events GROUP BY 1),
            lagged AS (
              SELECT y, lag(y) OVER (ORDER BY day) AS z,
                     lag(x) OVER (ORDER BY day) AS xl
              FROM daily
              QUALIFY z IS NOT NULL),
            m AS (
              SELECT CAST(count(*) AS BIGINT) AS n,
                     CAST(sum(y) AS BIGINT) AS sy,
                     CAST(sum(z) AS BIGINT) AS sz,
                     CAST(sum(xl) AS BIGINT) AS sx,
                     CAST(sum(y * y) AS BIGINT) AS syy,
                     CAST(sum(z * z) AS BIGINT) AS szz,
                     CAST(sum(xl * xl) AS BIGINT) AS sxx,
                     CAST(sum(z * y) AS BIGINT) AS szy,
                     CAST(sum(xl * y) AS BIGINT) AS sxy,
                     CAST(sum(z * xl) AS BIGINT) AS szx
              FROM lagged),
            cov AS (
              SELECT n,
                     CAST(szy AS DOUBLE) - CAST(sz AS DOUBLE) * sy / n
                       AS a1,
                     CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy / n
                       AS a2,
                     CAST(szz AS DOUBLE) - CAST(sz AS DOUBLE) * sz / n
                       AS s11,
                     CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / n
                       AS s22,
                     CAST(szx AS DOUBLE) - CAST(sz AS DOUBLE) * sx / n
                       AS s12,
                     CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / n
                       AS svy
              FROM m)
            SELECT n,
                   CAST(round((a1 * s22 - a2 * s12) /
                     (s11 * s22 - s12 * s12) * 1e6, 0) AS BIGINT)
                     AS b_ar_micro,
                   CAST(round((a2 * s11 - a1 * s12) /
                     (s11 * s22 - s12 * s12) * 1e6, 0) AS BIGINT)
                     AS b_x_micro,
                   CAST(round(a1 * a1 / (s11 * svy) * 1e6, 0) AS BIGINT)
                     AS r2_ar1_micro,
                   CAST(round(((a1 * s22 - a2 * s12) * a1 +
                     (a2 * s11 - a1 * s12) * a2) /
                     ((s11 * s22 - s12 * s12) * svy) * 1e6, 0) AS BIGINT)
                     AS r2_full_micro
            FROM cov"""))

  // ------- seq_step_flow: step-indexed event-type flow (sankey feed)

  private val stepFlow = Q(
    "seq_step_flow",
    "Step-indexed behavioral flow: each user's first 4 events by time " +
      "yield (step, from_type, to_type) transition counts with a " +
      "per-step share — the exact frame a funnel/sankey visual " +
      "consumes, and the step-resolved refinement of w10's global " +
      "Markov transition matrix. One user-keyed ranking window (scale-" +
      "partitioned by user), a self-lag via (user, step) equi-join — " +
      "no unbounded window — and a 3×k² rollup. Share denominators " +
      "ride the tiny per-step rollup via a broadcast join.",
    (s, d) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val steps = t(s, d, "events")
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type"))
        .withColumn("step", row_number().over(w))
        .filter(col("step") <= 4)
        .select(col("user_id"), col("step"), col("event_type"))
      val trans = steps.as("f").join(
          steps.select(col("user_id"),
            (col("step") - 1).as("step"), col("event_type").as("to_type"))
            .as("n"),
          Seq("user_id", "step"))
        .groupBy(col("step"), col("event_type").as("from_type"),
          col("to_type"))
        .agg(count(lit(1)).as("n_users"))
      val perStep = trans.groupBy("step")
        .agg(sum("n_users").as("step_total"))
      def dd(c: String) = col(c).cast(DoubleType)
      trans.join(broadcast(perStep), "step")
        .select(col("step").cast(LongType).as("step"), col("from_type"),
          col("to_type"), col("n_users"),
          round(dd("n_users") * 1e6 / dd("step_total"), 0)
            .cast(LongType).as("share_micro"))
        .transform(graft.engine.Ops.reportSort("step", "from_type", "to_type"))
    },
    Some("""WITH steps AS (
              SELECT user_id, step, event_type FROM (
                SELECT user_id, event_type,
                       row_number() OVER (PARTITION BY user_id
                         ORDER BY ts, event_id) AS step
                FROM events)
              WHERE step <= 4),
            trans AS (
              SELECT f.step, f.event_type AS from_type,
                     n.event_type AS to_type,
                     CAST(count(*) AS BIGINT) AS n_users
              FROM steps f JOIN steps n
                ON f.user_id = n.user_id AND n.step = f.step + 1
              GROUP BY 1, 2, 3),
            per_step AS (
              SELECT step, CAST(sum(n_users) AS BIGINT) AS step_total
              FROM trans GROUP BY 1)
            SELECT CAST(trans.step AS BIGINT) AS step, from_type, to_type,
                   n_users,
                   CAST(round(CAST(n_users AS DOUBLE) * 1e6 / step_total,
                     0) AS BIGINT) AS share_micro
            FROM trans JOIN per_step ON trans.step = per_step.step
            ORDER BY step, from_type, to_type"""))

  // ------- j25_interval_allocate: prorate order value across months

  private val intervalAllocate = Q(
    "j25_interval_allocate",
    "Interval-to-calendar proration — the warehouse allocation join " +
      "j16's overlap test stops short of: each order's 30-day revenue " +
      "window is split across the calendar months it overlaps, " +
      "allocating cents by round(total · overlap_days / 30). The month " +
      "list per order comes from a bounded sequence explode (≤2 months " +
      "for a 30-day window — map-side, never a calendar×orders cross " +
      "join); overlap day counts are pure date arithmetic; the rollup " +
      "is one keyed agg on month. Allocation rounding happens per " +
      "(order, month) from exact integers, so sums are engine-stable.",
    (s, d) => {
      val orders = t(s, d, "orders")
        .select(col("o_orderkey"), col("o_orderdate").cast("date").as("d0"),
          round(col("o_totalprice") * 100, 0).cast(LongType).as("cents"))
        .withColumn("d1", date_add(col("d0"), 29))
      val exploded = orders
        .select(col("o_orderkey"), col("d0"), col("d1"), col("cents"),
          explode(expr(
            "sequence(trunc(d0, 'MM'), trunc(d1, 'MM'), interval 1 month)"))
            .as("m0"))
        .withColumn("m1", last_day(col("m0")))
        .withColumn("ov",
          datediff(least(col("d1"), col("m1")),
            greatest(col("d0"), col("m0"))) + 1)
      def dd(c: String) = col(c).cast(DoubleType)
      exploded
        .select(col("o_orderkey"),
          date_format(col("m0"), "yyyy-MM").as("month"),
          round(dd("cents") * dd("ov") / 30.0, 0).cast(LongType)
            .as("alloc"))
        .groupBy("month")
        .agg(count(lit(1)).as("n_slices"), sum("alloc").as("alloc_cents"))
        .transform(graft.engine.Ops.reportSort("month"))
    },
    Some("""WITH o AS (
              SELECT o_orderkey, CAST(o_orderdate AS DATE) AS d0,
                     CAST(o_orderdate AS DATE) + INTERVAL 29 DAY AS d1,
                     CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
              FROM orders),
            ex AS (
              SELECT o_orderkey, d0, d1, cents,
                     unnest(generate_series(date_trunc('month', d0),
                       date_trunc('month', d1), INTERVAL 1 MONTH)) AS m0
              FROM o),
            ov AS (
              SELECT o_orderkey, strftime(m0, '%Y-%m') AS month, cents,
                     date_diff('day',
                       greatest(d0, CAST(m0 AS DATE)),
                       least(d1, CAST(last_day(CAST(m0 AS DATE))
                         AS DATE))) + 1 AS ovd
              FROM ex)
            SELECT month, CAST(count(*) AS BIGINT) AS n_slices,
                   CAST(sum(CAST(round(CAST(cents AS DOUBLE) * ovd / 30.0,
                     0) AS BIGINT)) AS BIGINT) AS alloc_cents
            FROM ov GROUP BY 1 ORDER BY 1"""))

  val all: Seq[Q] =
    Seq(hodgesLehmann, grangerLite, stepFlow, intervalAllocate)
}
