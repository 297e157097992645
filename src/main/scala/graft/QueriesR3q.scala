package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

import graft.engine.Engine
import graft.operators.AsofJoin

/** Round-3 batch 17: nearest-direction as-of join (completing the
  * backward/forward family), lag-k autocorrelation of a daily series,
  * and Adamic–Adar link prediction with the standard degree cap.
  */
object QueriesR3q {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Engine.table(s, dir, name)

  // ------------- j21_asof_nearest: nearest as-of (either direction)

  private val asofNearest = Q(
    "j21_asof_nearest",
    "NEAREST as-of join — the third member of the family (j12 " +
      "backward, j17 forward): each sampled event takes whichever " +
      "same-key order is closer in days, backward winning distance " +
      "ties (earlier date) and the forward side's smallest-okey rule " +
      "deciding exact-day ties — semantics pinned to the oracle's " +
      "min(struct(gap, date, key)). Two union-merge as-of passes " +
      "(each one O(n) shuffle on the key, never the pair space) and " +
      "a per-event 2-way pick.",
    (s, d) => {
      val ev = t(s, d, "events")
        .filter(col("event_id") % 4 === 0)
        .select(col("event_id"), (col("user_id") % 100).as("k"),
          date_trunc("day", col("ts")).as("day"))
      val ord = t(s, d, "orders")
        .select((col("o_custkey") % 100).as("k"),
          col("o_orderdate").as("odate"), col("o_orderkey").as("okey"))
      // backward's last-wins traversal resolves equal-time ties to the
      // LARGEST rightOrder value; ordering on the negated key flips that
      // to the smallest okey, matching the oracle's struct min
      val back = AsofJoin.backward(ev,
          ord.withColumn("okey_neg", -col("okey")),
          keyCols = Seq("k"), leftTime = "day", rightTime = "odate",
          carryCols = Seq("odate", "okey", "okey_neg"),
          rightOrder = Seq("okey_neg"))
        .select(col("event_id"), col("k"), col("day"),
          col("asof_odate").as("bdate"), col("asof_okey").as("bkey"))
      val fwd = AsofJoin.forward(ev, ord,
          keyCols = Seq("k"), leftTime = "day", rightTime = "odate",
          carryCols = Seq("odate", "okey"), rightOrder = Seq("okey"))
        .select(col("event_id"), col("asof_odate").as("fdate"),
          col("asof_okey").as("fkey"))
      val gapB = datediff(to_date(col("day")), to_date(col("bdate")))
        .cast(LongType)
      val gapF = datediff(to_date(col("fdate")), to_date(col("day")))
        .cast(LongType)
      // backward wins distance ties: at equal nonzero gap its odate is
      // earlier (the struct min's second field); at gap 0 both sides
      // hold odate == day and the same smallest okey, so the pick is
      // moot. A missing side loses automatically.
      val takeBack = col("bdate").isNotNull &&
        (col("fdate").isNull || (gapB <= gapF))
      val takeFwd = col("fdate").isNotNull &&
        (col("bdate").isNull || (gapF < gapB))
      back.join(fwd, "event_id")
        .select(col("event_id"), col("k"),
          when(takeBack, date_format(col("bdate"), "yyyy-MM-dd"))
            .when(takeFwd, date_format(col("fdate"), "yyyy-MM-dd"))
            .as("near_date"),
          when(takeBack, col("bkey")).when(takeFwd, col("fkey"))
            .as("near_order"),
          when(takeBack, gapB).when(takeFwd, gapF).as("gap_days"))
        .orderBy("event_id")
    },
    Some("""SELECT event_id, k,
                   strftime(m.odate, '%Y-%m-%d') AS near_date,
                   m.okey AS near_order,
                   m.gap AS gap_days
            FROM (
              SELECT e.event_id, e.k,
                     min(struct_pack(
                       gap := abs(date_diff('day', o.odate, e.day)),
                       odate := o.odate,
                       okey := o.o_orderkey)) AS m
              FROM (SELECT event_id, user_id % 100 AS k,
                           date_trunc('day', ts) AS day
                    FROM events WHERE event_id % 4 = 0) e
              LEFT JOIN (SELECT o_custkey % 100 AS k,
                                o_orderdate AS odate, o_orderkey
                         FROM orders) o
                ON e.k = o.k
              GROUP BY e.event_id, e.k)
            ORDER BY event_id"""))

  // ------------- stat_autocorr: lag-k ACF of the daily revenue series

  private val autocorr = Q(
    "stat_autocorr",
    "Lag-k autocorrelation (k = 1..7) of the daily purchase-revenue " +
      "series — the seasonality probe run before any forecast: one " +
      "groupBy folds events to |days| rows of exact cents (the only " +
      "pass that touches event volume), each lag is an equi-join on " +
      "a computed date key (no theta join), and Pearson r per lag " +
      "comes from exact DECIMAL sufficient statistics via one " +
      "micro-rounded double tree. Output is 7 rows whatever the " +
      "event count.",
    (s, d) => {
      val daily = t(s, d, "events")
        .filter(col("event_type") === "purchase")
        .groupBy(to_date(col("ts")).as("day"))
        .agg(sum(round(col("value") * 100, 0).cast(LongType)).as("x"))
      val lags = daily
        .select(col("day"), col("x"),
          explode(sequence(lit(1), lit(7))).as("k"))
        .select(col("k"), expr("date_sub(day, k)").as("jday"), col("x"))
      val pairs = lags.join(
        daily.select(col("day").as("jday"), col("x").as("y")), "jday")
      val agg = pairs.groupBy("k").agg(
        count(lit(1)).as("n"),
        sum("x").as("sx"), sum("y").as("sy"),
        sum((col("x") * col("y")).cast(DecimalType(38, 0))).as("sxy"),
        sum((col("x") * col("x")).cast(DecimalType(38, 0))).as("sxx"),
        sum((col("y") * col("y")).cast(DecimalType(38, 0))).as("syy"))
      def dd(c: String) = col(c).cast(DoubleType)
      agg.select(col("k"), col("n").as("n_pairs"),
          round((dd("n") * dd("sxy") - dd("sx") * dd("sy")) /
            sqrt((dd("n") * dd("sxx") - dd("sx") * dd("sx")) *
                 (dd("n") * dd("syy") - dd("sy") * dd("sy"))) * 1e6, 0)
            .cast(LongType).as("r_micro"))
        .transform(graft.engine.Ops.reportSort("k"))
    },
    Some("""WITH daily AS (
              SELECT CAST(ts AS DATE) AS day,
                     CAST(sum(CAST(round(value * 100, 0) AS BIGINT))
                       AS BIGINT) AS x
              FROM events WHERE event_type = 'purchase' GROUP BY 1),
            lags AS (SELECT k, day - to_days(CAST(k AS INT)) AS jday, x
                     FROM daily
                     CROSS JOIN (SELECT unnest(range(1, 8)) AS k)),
            pairs AS (SELECT k, l.x AS x, d2.x AS y
                      FROM lags l
                      JOIN daily d2 ON l.jday = d2.day),
            agg AS (SELECT k,
                           CAST(count(*) AS BIGINT) AS n,
                           CAST(sum(x) AS BIGINT) AS sx,
                           CAST(sum(y) AS BIGINT) AS sy,
                           sum(x * y) AS sxy,
                           sum(x * x) AS sxx,
                           sum(y * y) AS syy
                    FROM pairs GROUP BY 1)
            SELECT CAST(k AS INT) AS k, n AS n_pairs,
                   CAST(round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                       - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
                     sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
                          (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                         - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
                     * 1e6, 0) AS BIGINT) AS r_micro
            FROM agg ORDER BY k"""))

  // ------------- g5_adamic_adar: link prediction over the trade graph

  private val adamicAdar = Q(
    "g5_adamic_adar",
    "Adamic–Adar link prediction for supplier pairs over the shared-" +
      "customer graph: each common customer contributes 1/ln(deg) — " +
      "micro-rounded ONCE per customer, so pair scores sum exactly — " +
      "and the standard DEGREE CAP (2..12) prunes hub customers " +
      "before pair enumeration: 1/ln(deg) of a hub is ≈0 signal but " +
      "deg² pairs of cost (uncapped this fixture alone is 830k " +
      "pairs; capped it is ~1k). Distinct edges, a capped self-join " +
      "on the customer, one groupBy on the pair — top 20.",
    (s, d) => {
      // memoized distinct (c, s) trade edges — shared with g1/g7 and the
      // co-purchase backbone family (Graph.tradeEdges)
      val edges = graft.operators.Graph.tradeEdges(s, d)
      val deg = edges.groupBy("c").agg(count(lit(1)).as("d"))
        .filter(col("d").between(2, 12))
        .select(col("c"),
          round(lit(1e6) / log(col("d").cast(DoubleType)), 0)
            .cast(LongType).as("term_micro"))
      val capped = edges.join(deg, "c")
      capped.as("x")
        .join(capped.as("y"),
          col("x.c") === col("y.c") && col("x.s") < col("y.s"))
        .groupBy(col("x.s").as("s1"), col("y.s").as("s2"))
        .agg(count(lit(1)).as("common"),
          sum(col("x.term_micro")).as("aa_micro"))
        .orderBy(desc("aa_micro"), col("s1"), col("s2")).limit(20)
    },
    Some("""WITH edges AS (
              SELECT DISTINCT o_custkey AS c, l_suppkey AS s
              FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
            deg AS (SELECT c,
                           CAST(round(1e6 / ln(CAST(count(*) AS DOUBLE)),
                             0) AS BIGINT) AS term_micro
                    FROM edges GROUP BY c
                    HAVING count(*) BETWEEN 2 AND 12),
            capped AS (SELECT edges.c, s, term_micro
                       FROM edges JOIN deg USING (c))
            SELECT x.s AS s1, y.s AS s2,
                   CAST(count(*) AS BIGINT) AS common,
                   CAST(sum(x.term_micro) AS BIGINT) AS aa_micro
            FROM capped x JOIN capped y
              ON x.c = y.c AND x.s < y.s
            GROUP BY 1, 2
            ORDER BY aa_micro DESC, s1, s2 LIMIT 20"""))

  val all: Seq[Q] = Seq(asofNearest, autocorr, adamicAdar)
}
