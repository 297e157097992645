package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.{DoubleType, IntegerType, StringType}

import graft.engine.{Engine, Ops}
import graft.functions.F

/** The graded query inventory: every SURVEY §2 operator expressed as a
  * deterministic query over the driver's TPC-H-ish parquet fixtures
  * (`/root/testdata/sf*`), each paired with equivalent DuckDB SQL for the
  * driver's oracle hash-compare.
  *
  * Determinism rules (hash-stability vs DuckDB):
  *  - every result carries a unique ordering key and an ORDER BY on it;
  *  - fractional literals in oracle SQL are CAST(... AS DOUBLE) (DuckDB
  *    would otherwise type them DECIMAL and hash differently);
  *  - double aggregates either sum integral-valued columns (exact in IEEE
  *    double regardless of order) or are rounded identically on both sides;
  *  - trig-derived values are rounded to 3 decimals (libm ulp differences).
  */
final case class Q(
    name: String,
    doc: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Engine.table(s, dir, name)

  // ---------------------------------------------------------------- sources

  private val s2 = Q(
    "s2_scan_project",
    "S2 tolerant scan: columnar parquet scan with projection + filter " +
      "pushed to the reader (reference safe_read, enrich_features.py:17-18)",
    (s, d) =>
      t(s, d, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
        .filter(col("l_orderkey") % 100 === 0)
        .orderBy("l_orderkey", "l_linenumber"),
    Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
            FROM lineitem WHERE l_orderkey % 100 = 0
            ORDER BY l_orderkey, l_linenumber"""))

  // ------------------------------------------------------------- projection

  private val p1 = Q(
    "p1_select_reorder",
    "P1 canonical column select + reorder (build_hist_and_upcoming.py:8-21)",
    (s, d) =>
      t(s, d, "orders")
        .select("o_orderkey", "o_orderdate", "o_orderstatus", "o_totalprice", "o_custkey")
        .orderBy("o_orderkey"),
    Some("""SELECT o_orderkey, o_orderdate, o_orderstatus, o_totalprice, o_custkey
            FROM orders ORDER BY o_orderkey"""))

  private val p2 = Q(
    "p2_rename_bulk",
    "P2 bulk rename (enrich_features.py:94-99)",
    (s, d) => {
      val mapping = Seq("o_orderkey" -> "order_id", "o_custkey" -> "customer_id",
        "o_totalprice" -> "amount")
      t(s, d, "orders")
        .select(mapping.map { case (o, n) => col(o).as(n) }: _*)
        .orderBy("order_id")
    },
    Some("""SELECT o_orderkey AS order_id, o_custkey AS customer_id,
            o_totalprice AS amount FROM orders ORDER BY order_id"""))

  private val p3 = Q(
    "p3_prefix_all",
    "P3 add_prefix on an entire dimension table (enrich_features.py:53-54)",
    (s, d) => {
      val df = t(s, d, "nation")
      df.select(df.columns.map(c => col(c).as(s"dim_$c")): _*)
        .transform(graft.engine.Ops.reportSort("dim_n_nationkey"))
    },
    Some("""SELECT n_nationkey AS dim_n_nationkey, n_name AS dim_n_name,
            n_regionkey AS dim_n_regionkey FROM nation ORDER BY dim_n_nationkey"""))

  private val p4 = Q(
    "p4_ensure_cols",
    "P4 add-missing-columns-with-defaults; schema-driven, no-op when present",
    (s, d) => {
      val base = t(s, d, "customer").select("c_custkey", "c_name")
      Ops.ensureCols(base, Seq(
        "rest_days" -> lit(4),
        "injury_index" -> lit(0.3),
        "crowd_index" -> lit(0.7),
        // already present → must be a no-op:
        "c_name" -> lit("SHOULD_NOT_APPEAR")))
        .transform(graft.engine.Ops.reportSort("c_custkey"))
    },
    Some("""SELECT c_custkey, c_name, 4 AS rest_days,
            CAST(0.3 AS DOUBLE) AS injury_index, CAST(0.7 AS DOUBLE) AS crowd_index
            FROM customer ORDER BY c_custkey"""))

  private val p5 = Q(
    "p5_drop_null_keys",
    "P5 dropna on key columns (fetch_football_data.py:44,46)",
    (s, d) =>
      t(s, d, "events")
        .withColumn("etype",
          when(col("event_type") === "error", lit(null).cast(StringType))
            .otherwise(col("event_type")))
        .na.drop(Seq("etype"))
        .select("event_id", "etype", "value")
        .orderBy("event_id"),
    Some("""SELECT event_id, nullif(event_type, 'error') AS etype, value
            FROM events WHERE nullif(event_type, 'error') IS NOT NULL
            ORDER BY event_id"""))

  private val p6 = Q(
    "p6_masked_update",
    "P6 conditional row update: only null slots receive the computed value " +
      "(enrich_features.py:118-119)",
    (s, d) => {
      val base = t(s, d, "events")
        .withColumn("t",
          when(col("event_type") === "click", lit(null).cast(DoubleType))
            .otherwise(col("value")))
      base
        .withColumn("filled",
          when(col("t").isNull, col("value") * 2).otherwise(col("t")))
        .select("event_id", "filled")
        .orderBy("event_id")
    },
    Some("""SELECT event_id,
            CASE WHEN t IS NULL THEN value * 2 ELSE t END AS filled
            FROM (SELECT event_id, value,
                    CASE WHEN event_type = 'click' THEN NULL ELSE value END AS t
                  FROM events)
            ORDER BY event_id"""))

  private val p7 = Q(
    "p7_upper_headers",
    "P7 header normalization to UPPER (fetch_football_data.py:31-32)",
    (s, d) => {
      val df = t(s, d, "lineitem").select("l_orderkey", "l_linenumber", "l_quantity")
      df.toDF(df.columns.map(_.toUpperCase): _*)
        .orderBy("L_ORDERKEY", "L_LINENUMBER")
    },
    Some("""SELECT l_orderkey AS "L_ORDERKEY", l_linenumber AS "L_LINENUMBER",
            l_quantity AS "L_QUANTITY"
            FROM lineitem ORDER BY 1, 2"""))

  private val p8 = Q(
    "p8_first_present",
    "P8 first-available odds column fallback, schema-driven (wholesale " +
      "pick of the first EXISTING candidate — Ops.firstPresent)",
    (s, d) => {
      val df = t(s, d, "orders")
      df.select(col("o_orderkey"),
          Ops.firstPresent(df, Seq("b365_h", "ps_h", "o_totalprice", "iw_h"),
            lit(null).cast(DoubleType)).as("odds_dec"))
        .orderBy("o_orderkey")
    },
    Some("SELECT o_orderkey, o_totalprice AS odds_dec FROM orders ORDER BY o_orderkey"))

  private val p9 = Q(
    "p9_drop_cols",
    "P9 drop helper columns after coalescing (enrich_features.py:32-33)",
    (s, d) =>
      t(s, d, "customer")
        .drop("c_name", "c_acctbal", "not_a_column")
        .orderBy("c_custkey"),
    Some("SELECT c_custkey, c_nationkey, c_mktsegment FROM customer ORDER BY c_custkey"))

  // ------------------------------------------------------------------ joins

  private val j1 = Q(
    "j1_broadcast_left_dim",
    "J1 left join fact × small dim, broadcast (enrich_features.py:46-62). " +
      "At 100 TB the dim stays broadcast — no shuffle of the fact side.",
    (s, d) => {
      val cust = t(s, d, "customer")
        .select(col("c_custkey"), col("c_name").as("cust_name"),
          col("c_mktsegment").as("cust_segment"))
      t(s, d, "orders")
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"), "left")
        .select("o_orderkey", "o_custkey", "o_totalprice", "cust_name", "cust_segment")
        .orderBy("o_orderkey")
    },
    Some("""SELECT o_orderkey, o_custkey, o_totalprice,
            c_name AS cust_name, c_mktsegment AS cust_segment
            FROM orders LEFT JOIN customer ON o_custkey = c_custkey
            ORDER BY o_orderkey"""))

  private val j3 = Q(
    "j3_composite_key_left",
    "J3 left join on a composite key (date, entity) (enrich_features.py:73-85)",
    (s, d) => {
      val dim = t(s, d, "orders")
        .groupBy("o_custkey", "o_orderdate")
        .agg(min("o_totalprice").as("day_min"))
      t(s, d, "orders")
        .join(dim, Seq("o_custkey", "o_orderdate"), "left")
        .select("o_orderkey", "o_custkey", "o_orderdate", "day_min")
        .orderBy("o_orderkey")
    },
    Some("""SELECT o_orderkey, o.o_custkey AS o_custkey, o.o_orderdate AS o_orderdate, day_min
            FROM orders o LEFT JOIN (
              SELECT o_custkey, o_orderdate, min(o_totalprice) AS day_min
              FROM orders GROUP BY o_custkey, o_orderdate) d
            ON o.o_custkey = d.o_custkey AND o.o_orderdate = d.o_orderdate
            ORDER BY o_orderkey"""))

  private val j8 = Q(
    "j8_full_outer",
    "J8 full outer join of two seasons' aggregates (fetch_fbr_team_xg.py:104-106)",
    (s, d) => {
      val li = t(s, d, "lineitem")
      val cur = li.filter(col("l_returnflag") === "R")
        .groupBy(col("l_suppkey").as("sk_r"))
        .agg(sum("l_quantity").as("qty_r"))
      val last = li.filter(col("l_returnflag") === "A")
        .groupBy(col("l_suppkey").as("sk_a"))
        .agg(sum("l_quantity").as("qty_a"))
      cur.join(last, col("sk_r") === col("sk_a"), "full_outer")
        .select(coalesce(col("sk_r"), col("sk_a")).as("suppkey"),
          col("qty_r"), col("qty_a"))
        .transform(graft.engine.Ops.reportSort("suppkey"))
    },
    Some("""SELECT coalesce(a.l_suppkey, b.l_suppkey) AS suppkey, qty_r, qty_a
            FROM (SELECT l_suppkey, sum(l_quantity) AS qty_r FROM lineitem
                  WHERE l_returnflag = 'R' GROUP BY l_suppkey) a
            FULL OUTER JOIN
                 (SELECT l_suppkey, sum(l_quantity) AS qty_a FROM lineitem
                  WHERE l_returnflag = 'A' GROUP BY l_suppkey) b
            ON a.l_suppkey = b.l_suppkey
            ORDER BY suppkey"""))

  // ------------------------------------------------- set ops / sort / dedup

  private val a3 = Q(
    "a3_dedup_keep_first",
    "A3 drop_duplicates keep-first, made deterministic with a window " +
      "(bootstrap_team_priors.py:35; SURVEY §4 pandas-delta (a))",
    (s, d) => {
      val w = Window.partitionBy("c_mktsegment").orderBy("c_custkey")
      t(s, d, "customer")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("c_mktsegment", "c_custkey", "c_name")
        .transform(graft.engine.Ops.reportSort("c_mktsegment"))
    },
    Some("""SELECT c_mktsegment, c_custkey, c_name
            FROM (SELECT c_mktsegment, c_custkey, c_name,
                    row_number() OVER (PARTITION BY c_mktsegment ORDER BY c_custkey) AS rn
                  FROM customer) x
            WHERE rn = 1 ORDER BY c_mktsegment"""))

  private val a5 = Q(
    "a5_count_groups",
    "A5 counts (validate_data.py:13) as grouped aggregation",
    (s, d) =>
      t(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"), sum("l_quantity").as("sum_qty"))
        .orderBy("l_returnflag"),
    Some("""SELECT l_returnflag, count(*) AS n, sum(l_quantity) AS sum_qty
            FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  // -------------------------------------------------------------- functions

  private val f7 = Q(
    "f7_fractional_odds",
    "F7 fractional→decimal odds: 'a/b' → 1+a/b, numerics pass, junk → null " +
      "(utils.py:10-17)",
    (s, d) => {
      val raw = t(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          when(col("l_linenumber") % 3 === 0,
            concat(col("l_linenumber").cast(StringType), lit("/"), lit("4")))
            .when(col("l_linenumber") % 3 === 1, lit("2.5"))
            .otherwise(lit("junk")).as("s"))
      raw.select(col("l_orderkey"), col("l_linenumber"),
          F.fractionalToDecimal(col("s")).as("odds_dec"))
        .orderBy("l_orderkey", "l_linenumber")
    },
    Some("""SELECT l_orderkey, l_linenumber,
            CASE WHEN s LIKE '%/%'
                 THEN 1.0 + TRY_CAST(split_part(s,'/',1) AS DOUBLE)
                          / TRY_CAST(split_part(s,'/',2) AS DOUBLE)
                 ELSE TRY_CAST(s AS DOUBLE) END AS odds_dec
            FROM (SELECT l_orderkey, l_linenumber,
                    CASE l_linenumber % 3
                      WHEN 0 THEN CAST(l_linenumber AS VARCHAR) || '/4'
                      WHEN 1 THEN '2.5'
                      ELSE 'junk' END AS s
                  FROM lineitem)
            ORDER BY l_orderkey, l_linenumber"""))

  private val f8 = Q(
    "f8_haversine",
    "F8 haversine km as pure column math — no UDF, codegen'd " +
      "(enrich_features.py:8-15); coords synthesized from keys",
    (s, d) => {
      val c = t(s, d, "customer")
        .select(col("c_custkey"),
          (col("c_custkey") % 181 - 90).cast(DoubleType).as("lat1"),
          (col("c_custkey") % 361 - 180).cast(DoubleType).as("lon1"),
          (col("c_nationkey") * 7 - 84).cast(DoubleType).as("lat2"),
          (col("c_nationkey") * 14 - 168).cast(DoubleType).as("lon2"))
      c.select(col("c_custkey"),
          round(F.haversineKm(col("lat1"), col("lon1"), col("lat2"), col("lon2")), 3)
            .as("dist_km"))
        .transform(graft.engine.Ops.reportSort("c_custkey"))
    },
    Some("""SELECT c_custkey,
            round(2 * 6371 * asin(sqrt(least(CAST(1.0 AS DOUBLE),
              pow(sin(radians(lat2-lat1)/2), 2) +
              cos(radians(lat1)) * cos(radians(lat2)) *
              pow(sin(radians(lon2-lon1)/2), 2)))), 3) AS dist_km
            FROM (SELECT c_custkey,
                    CAST(c_custkey % 181 - 90  AS DOUBLE) AS lat1,
                    CAST(c_custkey % 361 - 180 AS DOUBLE) AS lon1,
                    CAST(c_nationkey * 7 - 84  AS DOUBLE) AS lat2,
                    CAST(c_nationkey * 14 - 168 AS DOUBLE) AS lon2
                  FROM customer)
            ORDER BY c_custkey"""))

  // ------------------------------------------------------------------- all

  val all: Seq[Q] = Seq(
    s2, p1, p2, p3, p4, p5, p6, p7, p8, p9,
    j1, j3, j8,
    a3, a5,
    f7, f8) ++ Queries2.all ++ QueriesExt.all ++ QueriesPipe.all ++
    QueriesWin.all ++ QueriesMore.all ++ QueriesNext.all ++ QueriesCorpus.all ++
    QueriesR3.all ++ QueriesR3b.all ++ QueriesR3c.all ++ QueriesR3d.all ++
    QueriesR3e.all ++ QueriesR3f.all ++ QueriesR3g.all ++ QueriesR3h.all ++
    QueriesR3i.all ++ QueriesR3j.all ++ QueriesR3k.all ++ QueriesR3l.all ++
    QueriesR3m.all ++ QueriesR3n.all ++ QueriesR3o.all ++ QueriesR3p.all ++
    QueriesR3q.all ++ QueriesR3r.all ++ QueriesR3s.all ++ QueriesR3t.all ++
    QueriesR3u.all ++ QueriesR3v.all ++ QueriesR3w.all ++ QueriesR3x.all ++ QueriesR3y.all ++ QueriesR3z.all ++ QueriesR4a.all ++ QueriesR4b.all ++ QueriesR4c.all ++ QueriesR4d.all ++
    QueriesR4e.all ++ QueriesR4f.all ++ QueriesR4g.all ++ QueriesR4h.all ++
    QueriesR4i.all ++ QueriesR4j.all ++ QueriesR4k.all ++ QueriesR4l.all ++
    QueriesR4m.all ++ QueriesR4n.all ++ QueriesR4o.all ++ QueriesR4p.all ++ QueriesR4q.all ++ QueriesR4r.all ++ QueriesR4s.all ++ QueriesR4t.all ++ QueriesR4u.all ++ QueriesR4v.all ++
    QueriesR5a.all ++ QueriesR5b.all ++ QueriesR5c.all ++ QueriesR5d.all ++
    QueriesR5e.all ++ QueriesR5f.all ++ QueriesR5g.all ++ QueriesR5h.all ++
    QueriesR5i.all ++ QueriesR5j.all ++ QueriesR5k.all ++ QueriesR5l.all ++
    QueriesR5m.all ++ QueriesR5n.all ++ QueriesR5o.all ++ QueriesR5p.all ++
    QueriesR5q.all ++ QueriesR5r.all ++ QueriesR5s.all ++ QueriesR5t.all ++
    QueriesR5u.all ++ QueriesR6a.all ++ QueriesR7a.all ++ QueriesR8a.all ++
    QueriesR9a.all ++ QueriesR10a.all ++ QueriesR11a.all ++ QueriesR12a.all ++
    QueriesR13a.all

  lazy val byName: Map[String, Q] = all.map(q => q.name -> q).toMap
}
