package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType, StringType, DateType}

import graft.engine.{Engine, Ops}
import graft.functions.F

/** SURVEY §2 inventory, part 2: the join/set-op/scalar rows not covered in
  * [[Queries]] — J2, J4–J6, J9, A1/A2/A4/A6, F1–F6, F9–F16, V1.
  * Same determinism rules as [[Queries]] (unique order key, DOUBLE-cast
  * fractional literals, exact integral sums or identical rounding).
  */
object Queries2 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Engine.table(s, dir, name)

  // ------------------------------------------------------------------ joins

  private val j2 = Q(
    "j2_conditional_join",
    "J2 join only if the key column exists on the fact, else constant " +
      "default (enrich_features.py:64-71); key present here → join path",
    (s, d) => {
      val dim = t(s, d, "customer")
        .select(col("c_custkey").as("o_custkey"), col("c_acctbal").as("ref_pen_rate"))
      Ops.joinIfKeyed(t(s, d, "orders"), dim, "o_custkey"
          , Seq("ref_pen_rate" -> lit(F.Defaults.refPenRate)))
        .select(col("o_orderkey"),
          coalesce(col("ref_pen_rate"), lit(F.Defaults.refPenRate)).as("pen_rate"))
        .orderBy("o_orderkey")
    },
    Some("""SELECT o_orderkey,
            coalesce(c_acctbal, CAST(0.30 AS DOUBLE)) AS pen_rate
            FROM orders LEFT JOIN customer ON o_custkey = c_custkey
            ORDER BY o_orderkey"""))

  private val j4 = Q(
    "j4_flags_composite_join",
    "J4 composite-key (entity, day) left join of per-day flags; " +
      "nulls→0→int (enrich_features.py:87-103)",
    (s, d) => {
      val ev = t(s, d, "events")
      val dim = ev.filter(col("event_type") === "purchase")
        .groupBy(col("user_id"), date_trunc("day", col("ts")).as("day"))
        .agg(lit(1).as("purchased"), count(lit(1)).cast(IntegerType).as("n_purchases"))
      ev.select(col("event_id"), col("user_id"),
          date_trunc("day", col("ts")).as("day"))
        .join(dim, Seq("user_id", "day"), "left")
        .select(col("event_id"), col("user_id"), col("day"),
          F.flagInt(col("purchased")).as("purchased"),
          F.flagInt(col("n_purchases")).as("n_purchases"))
        .orderBy("event_id")
    },
    Some("""SELECT e.event_id, e.user_id, date_trunc('day', e.ts) AS day,
            CAST(coalesce(d.purchased, 0) AS INT) AS purchased,
            CAST(coalesce(d.n_purchases, 0) AS INT) AS n_purchases
            FROM events e LEFT JOIN (
              SELECT user_id, date_trunc('day', ts) AS day,
                     1 AS purchased, CAST(count(*) AS INT) AS n_purchases
              FROM events WHERE event_type = 'purchase'
              GROUP BY 1, 2) d
            ON e.user_id = d.user_id AND date_trunc('day', e.ts) = d.day
            ORDER BY e.event_id"""))

  private val j5 = Q(
    "j5_coalesce_precedence",
    "J5 pandas merge-suffix precedence done as coalesce: pre-existing fact " +
      "value ▸ joined dim value ▸ default (enrich_features.py:26-34)",
    (s, d) => {
      val fact = t(s, d, "orders")
        .withColumn("score",
          when(col("o_orderstatus") === "O", lit(null).cast(DoubleType))
            .otherwise(col("o_totalprice")))
      val dim = t(s, d, "customer")
        .withColumn("dim_score",
          when(col("c_custkey") % 3 === 0, lit(null).cast(DoubleType))
            .otherwise(col("c_acctbal")))
        .select(col("c_custkey"), col("dim_score"))
      fact.join(broadcast(dim), col("o_custkey") === col("c_custkey"), "left")
        .select(col("o_orderkey"),
          Ops.precedence(col("score"), col("dim_score"), lit(-1.0)).as("score"))
        .orderBy("o_orderkey")
    },
    Some("""SELECT o_orderkey,
            coalesce(CASE WHEN o_orderstatus = 'O' THEN NULL ELSE o_totalprice END,
                     CASE WHEN c_custkey % 3 = 0 THEN NULL ELSE c_acctbal END,
                     CAST(-1.0 AS DOUBLE)) AS score
            FROM orders LEFT JOIN customer ON o_custkey = c_custkey
            ORDER BY o_orderkey"""))

  private val j6 = Q(
    "j6_join_derived_distance",
    "J6 stadium-style join + haversine where coords present, 200 km " +
      "fallback on nulls (enrich_features.py:105-120)",
    (s, d) => {
      val dim = t(s, d, "nation").select(col("n_nationkey"),
        when(col("n_nationkey") % 5 === 0, lit(null).cast(DoubleType))
          .otherwise((col("n_nationkey") * 7 - 84).cast(DoubleType)).as("lat"),
        (col("n_nationkey") * 14 - 168).cast(DoubleType).as("lon"))
      t(s, d, "customer")
        .join(broadcast(dim), col("c_nationkey") === col("n_nationkey"), "left")
        .select(col("c_custkey"),
          round(F.haversineKmOrDefault(
            (col("c_custkey") % 181 - 90).cast(DoubleType),
            (col("c_custkey") % 361 - 180).cast(DoubleType),
            col("lat"), col("lon")), 3).as("travel_km"))
        .transform(graft.engine.Ops.reportSort("c_custkey"))
    },
    Some("""SELECT c_custkey,
            CASE WHEN lat IS NULL THEN CAST(200.0 AS DOUBLE)
                 ELSE round(2 * 6371 * asin(sqrt(least(CAST(1.0 AS DOUBLE),
                   pow(sin(radians(lat - lat1)/2), 2) +
                   cos(radians(lat1)) * cos(radians(lat)) *
                   pow(sin(radians(lon - lon1)/2), 2)))), 3) END AS travel_km
            FROM (SELECT c_custkey,
                    CAST(c_custkey % 181 - 90  AS DOUBLE) AS lat1,
                    CAST(c_custkey % 361 - 180 AS DOUBLE) AS lon1,
                    lat, lon
                  FROM customer LEFT JOIN (
                    SELECT n_nationkey,
                      CASE WHEN n_nationkey % 5 = 0 THEN NULL
                           ELSE CAST(n_nationkey * 7 - 84 AS DOUBLE) END AS lat,
                      CAST(n_nationkey * 14 - 168 AS DOUBLE) AS lon
                    FROM nation) n ON c_nationkey = n_nationkey)
            ORDER BY c_custkey"""))

  private val j9 = Q(
    "j9_name_map_join",
    "J9 canonical-name lookup join with identity fallback + trim on both " +
      "sides (enrich_features.py:37-43). Broadcast join, stays in Catalyst.",
    (s, d) => {
      val nameMap = t(s, d, "region")
        .select(trim(col("r_name")).as("raw"),
          lower(trim(col("r_name"))).as("canonical"))
      val fact = t(s, d, "nation").join(broadcast(
          t(s, d, "region").select(col("r_regionkey"), col("r_name"))),
          col("n_regionkey") === col("r_regionkey"), "left")
        .select(col("n_nationkey"), concat(lit("  "), col("r_name")).as("raw_name"))
      fact.join(broadcast(nameMap), trim(col("raw_name")) === col("raw"), "left")
        .select(col("n_nationkey"),
          coalesce(col("canonical"), trim(col("raw_name"))).as("name_norm"))
        .transform(graft.engine.Ops.reportSort("n_nationkey"))
    },
    Some("""SELECT n_nationkey,
            coalesce(m.canonical, trim(f.raw_name)) AS name_norm
            FROM (SELECT n_nationkey, '  ' || r_name AS raw_name
                  FROM nation LEFT JOIN region ON n_regionkey = r_regionkey) f
            LEFT JOIN (SELECT trim(r_name) AS raw, lower(trim(r_name)) AS canonical
                       FROM region) m
            ON trim(f.raw_name) = m.raw
            ORDER BY n_nationkey"""))

  // ----------------------------------------------------- set ops / sort / k

  private val a1 = Q(
    "a1_union_tolerant",
    "A1 union-all of N normalized frames, missing columns null-filled " +
      "(fetch_football_data.py:56-69 pd.concat)",
    (s, d) => {
      val li = t(s, d, "lineitem")
      val a = li.filter(col("l_returnflag") === "R")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("l_extendedprice"))
      val b = li.filter(col("l_returnflag") =!= "R")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
      Ops.unionTolerant(Seq(a, b)).orderBy("l_orderkey", "l_linenumber")
    },
    Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
            FROM lineitem WHERE l_returnflag = 'R'
            UNION ALL
            SELECT l_orderkey, l_linenumber, l_quantity, NULL
            FROM lineitem WHERE l_returnflag <> 'R'
            ORDER BY l_orderkey, l_linenumber"""))

  private val a2 = Q(
    "a2_global_sort",
    "A2 global sort by date (range-partitioned total sort at scale) " +
      "(build_hist_and_upcoming.py:26-27)",
    (s, d) =>
      t(s, d, "orders")
        .orderBy("o_orderdate", "o_orderkey")
        .select("o_orderkey", "o_orderdate", "o_totalprice"),
    Some("""SELECT o_orderkey, o_orderdate, o_totalprice FROM orders
            ORDER BY o_orderdate, o_orderkey"""))

  private val a4 = Q(
    "a4_head_n",
    "A4 deterministic head-N preview (validate_data.py:5-7)",
    (s, d) =>
      t(s, d, "orders").orderBy("o_orderkey").limit(5)
        .select("o_orderkey", "o_orderstatus", "o_totalprice"),
    Some("""SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
            ORDER BY o_orderkey LIMIT 5"""))

  private val a6 = Q(
    "a6_topk_after_sort",
    "A6 current/previous epoch = sort desc + limit 2 " +
      "(fetch_fbr_team_xg.py:28-34)",
    (s, d) =>
      t(s, d, "orders")
        .select(date_trunc("month", col("o_orderdate")).as("month"))
        .distinct()
        .orderBy(desc("month"))
        .limit(2),
    Some("""SELECT DISTINCT date_trunc('month', o_orderdate) AS month
            FROM orders ORDER BY month DESC LIMIT 2"""))

  private val a7 = Q(
    "a7_window_hourly",
    "Tumbling-window event aggregation (the batch shape of the streaming " +
      "path; SURVEY §7 M3). Sum made exact via cents-as-long.",
    (s, d) =>
      t(s, d, "events")
        .groupBy(window(col("ts"), "1 hour"))
        .agg(count(lit(1)).as("n"),
          (sum(round(col("value") * 100, 0).cast(LongType)) / 100.0).as("sum_value"))
        .select(col("window.start").as("hour"), col("n"), col("sum_value"))
        .orderBy("hour"),
    Some("""SELECT date_trunc('hour', ts) AS hour, count(*) AS n,
            sum(CAST(round(value * 100, 0) AS BIGINT)) / 100.0 AS sum_value
            FROM events GROUP BY 1 ORDER BY hour"""))

  // -------------------------------------------------------------- functions

  private val f1 = Q(
    "f1_dayfirst_coerce",
    "F1 coercing day-first date parse: dd/MM/yyyy, junk → null " +
      "(fetch_football_data.py:45)",
    (s, d) => {
      val raw = t(s, d, "orders").select(col("o_orderkey"),
        when(col("o_orderkey") % 10 === 0, lit("not a date"))
          .otherwise(date_format(col("o_orderdate"), "dd/MM/yyyy")).as("ds"))
      raw.select(col("o_orderkey"), F.parseDateDayFirst(col("ds")).as("parsed"))
        .orderBy("o_orderkey")
    },
    Some("""SELECT o_orderkey, try_strptime(ds, '%d/%m/%Y') AS parsed
            FROM (SELECT o_orderkey,
                    CASE WHEN o_orderkey % 10 = 0 THEN 'not a date'
                         ELSE strftime(o_orderdate, '%d/%m/%Y') END AS ds
                  FROM orders)
            ORDER BY o_orderkey"""))

  private val f2 = Q(
    "f2_iso_parse",
    "F2 ISO-8601 parse, tz-naive under UTC session " +
      "(fetch_the_odds_api.py:46,148)",
    (s, d) => {
      val raw = t(s, d, "events").select(col("event_id"),
        date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss").as("iso"))
      raw.select(col("event_id"), F.parseIso(col("iso")).as("parsed"))
        .orderBy("event_id")
    },
    Some("""SELECT event_id,
            try_strptime(strftime(ts, '%Y-%m-%dT%H:%M:%S'), '%Y-%m-%dT%H:%M:%S') AS parsed
            FROM events ORDER BY event_id"""))

  private val f3f4 = Q(
    "f3_f4_null_defaults",
    "F3 fillna + F4 conditional keep (enrich_features.py:29-31)",
    (s, d) => {
      val base = t(s, d, "customer").select(col("c_custkey"),
        when(col("c_custkey") % 4 === 0, lit(null).cast(DoubleType))
          .otherwise(col("c_acctbal")).as("bal"))
      base.select(col("c_custkey"),
          F.fillNull(col("bal"), lit(0.0)).as("bal_filled"),
          F.keepOr(col("bal"), lit(-999.0)).as("bal_kept"))
        .transform(graft.engine.Ops.reportSort("c_custkey"))
    },
    Some("""SELECT c_custkey,
            coalesce(bal, CAST(0.0 AS DOUBLE)) AS bal_filled,
            CASE WHEN bal IS NOT NULL THEN bal ELSE CAST(-999.0 AS DOUBLE) END AS bal_kept
            FROM (SELECT c_custkey,
                    CASE WHEN c_custkey % 4 = 0 THEN NULL ELSE c_acctbal END AS bal
                  FROM customer)
            ORDER BY c_custkey"""))

  private val f5f6 = Q(
    "f5_f6_trim_strip_suffix",
    "F5 trim + F6 strip trailing parenthesized tag " +
      "(enrich_features.py:40,43; fetch_fbr_team_xg.py:61)",
    (s, d) => {
      val raw = t(s, d, "customer").select(col("c_custkey"),
        concat(lit("  "), col("c_name"), lit(" (ENG) "), lit(" ")).as("messy"))
      raw.select(col("c_custkey"),
          F.stripParenSuffix(F.strip(col("messy"))).as("clean"))
        .transform(graft.engine.Ops.reportSort("c_custkey"))
    },
    Some("""SELECT c_custkey,
            regexp_replace(trim('  ' || c_name || ' (ENG)  '), '\s+\(.*\)$', '') AS clean
            FROM customer ORDER BY c_custkey"""))

  private val f9 = Q(
    "f9_numeric_coerce",
    "F9 to_numeric(errors=coerce): junk → null via try_cast " +
      "(fetch_fbr_team_xg.py:110-111)",
    (s, d) => {
      val raw = t(s, d, "lineitem").select(col("l_orderkey"), col("l_linenumber"),
        when(col("l_linenumber") % 4 === 0, lit("n/a"))
          .otherwise(col("l_quantity").cast(StringType)).as("qs"))
      raw.select(col("l_orderkey"), col("l_linenumber"),
          F.toDouble(col("qs")).as("q"))
        .orderBy("l_orderkey", "l_linenumber")
    },
    Some("""SELECT l_orderkey, l_linenumber, TRY_CAST(qs AS DOUBLE) AS q
            FROM (SELECT l_orderkey, l_linenumber,
                    CASE WHEN l_linenumber % 4 = 0 THEN 'n/a'
                         ELSE CAST(l_quantity AS VARCHAR) END AS qs
                  FROM lineitem)
            ORDER BY l_orderkey, l_linenumber"""))

  private val f10 = Q(
    "f10_weighted_blend",
    "F10 null-tolerant 0.60/0.40 blend of two epochs " +
      "(fetch_fbr_team_xg.py:113-123)",
    (s, d) => {
      val li = t(s, d, "lineitem")
      val cur = li.filter(col("l_returnflag") === "R")
        .groupBy(col("l_suppkey")).agg(sum("l_quantity").as("q_cur"))
      val last = li.filter(col("l_returnflag") === "A")
        .groupBy(col("l_suppkey")).agg(sum("l_quantity").as("q_last"))
      cur.join(last, Seq("l_suppkey"), "full_outer")
        .select(col("l_suppkey"),
          F.weightedBlend(col("q_cur"), col("q_last")).as("q_hybrid"))
        .transform(graft.engine.Ops.reportSort("l_suppkey"))
    },
    Some("""SELECT coalesce(a.l_suppkey, b.l_suppkey) AS l_suppkey,
            CASE WHEN q_cur IS NOT NULL AND q_last IS NOT NULL
                 THEN CAST(0.60 AS DOUBLE) * q_cur + CAST(0.40 AS DOUBLE) * q_last
                 ELSE coalesce(q_cur, q_last) END AS q_hybrid
            FROM (SELECT l_suppkey, sum(l_quantity) AS q_cur FROM lineitem
                  WHERE l_returnflag = 'R' GROUP BY 1) a
            FULL OUTER JOIN
                 (SELECT l_suppkey, sum(l_quantity) AS q_last FROM lineitem
                  WHERE l_returnflag = 'A' GROUP BY 1) b
            ON a.l_suppkey = b.l_suppkey
            ORDER BY l_suppkey"""))

  private val f11 = Q(
    "f11_clamp_mid",
    "F11 clamp to [lo,hi], null → midpoint (bootstrap_team_priors.py:8-11)",
    (s, d) => {
      val raw = t(s, d, "customer").select(col("c_custkey"),
        when(col("c_custkey") % 7 === 0, lit(null).cast(DoubleType))
          .otherwise(col("c_acctbal")).as("bal"))
      raw.select(col("c_custkey"),
          F.clampMid(col("bal"), 0.0, 1000.0).as("clamped"))
        .transform(graft.engine.Ops.reportSort("c_custkey"))
    },
    Some("""SELECT c_custkey,
            CASE WHEN bal IS NULL THEN CAST(500.0 AS DOUBLE)
                 ELSE least(greatest(bal, CAST(0.0 AS DOUBLE)),
                            CAST(1000.0 AS DOUBLE)) END AS clamped
            FROM (SELECT c_custkey,
                    CASE WHEN c_custkey % 7 = 0 THEN NULL ELSE c_acctbal END AS bal
                  FROM customer)
            ORDER BY c_custkey"""))

  private val f12f13 = Q(
    "f12_f13_prior_heuristics",
    "F12 sign-step + F13 floored decay rate (bootstrap_team_priors.py:27-28)",
    (s, d) =>
      t(s, d, "supplier")
        .select(col("s_suppkey"),
          F.signStep(col("s_acctbal") - 5000.0).as("setpiece_rating"),
          round(F.floorRate(col("s_acctbal") / 100.0), 6).as("gk_rating"))
        .orderBy("s_suppkey"),
    Some("""SELECT s_suppkey,
            CAST(0.55 AS DOUBLE) + CAST(0.10 AS DOUBLE) *
              (CASE WHEN s_acctbal - 5000.0 > 0 THEN 1
                    WHEN s_acctbal - 5000.0 < 0 THEN -1 ELSE 0 END) AS setpiece_rating,
            round(CAST(0.80 AS DOUBLE) - CAST(0.15 AS DOUBLE) *
              greatest(CAST(0.0 AS DOUBLE),
                       coalesce(s_acctbal / 100.0, CAST(0.0 AS DOUBLE)) / 34.0), 6)
              AS gk_rating
            FROM supplier ORDER BY s_suppkey"""))

  private val f14f15 = Q(
    "f14_f15_flags_defaults",
    "F14 flag int-cast + F15 centralized constant defaults " +
      "(enrich_features.py:102,160-168)",
    (s, d) => {
      val raw = t(s, d, "events").select(col("event_id"),
        when(col("event_type") === "click", lit(1)).as("clicked_raw"))
      raw.select(col("event_id"),
          F.flagInt(col("clicked_raw")).as("clicked"),
          lit(F.Defaults.restDays).as("rest_days"),
          lit(F.Defaults.injuryIndex).as("injury_index"),
          lit(F.Defaults.crowdIndex).as("crowd_index"))
        .orderBy("event_id")
    },
    Some("""SELECT event_id,
            CAST(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS INT) AS clicked,
            4 AS rest_days, CAST(0.3 AS DOUBLE) AS injury_index,
            CAST(0.7 AS DOUBLE) AS crowd_index
            FROM events ORDER BY event_id"""))

  private val f16 = Q(
    "f16_first_match_nested",
    "F16 first-bookmaker-wins nested-array extraction: build ordered " +
      "nested structs, filter, take first — higher-order functions, not " +
      "explode (fetch_the_odds_api.py:118-143)",
    (s, d) => {
      val nested = t(s, d, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(sort_array(collect_list(struct(
          col("l_linenumber").as("ln"),
          col("l_returnflag").as("rf"),
          col("l_extendedprice").as("ep")))).as("items"))
      nested.select(col("l_orderkey"),
          try_element_at(filter(col("items"), x => x.getField("rf") === lit("R")), lit(1))
            .getField("ep").as("first_r_price"))
        .orderBy("l_orderkey")
    },
    Some("""SELECT l_orderkey,
            (list_filter(items, x -> x.rf = 'R')[1]).ep AS first_r_price
            FROM (SELECT l_orderkey,
                    list(struct_pack(ln := l_linenumber, rf := l_returnflag,
                                     ep := l_extendedprice)
                         ORDER BY l_linenumber, l_returnflag, l_extendedprice) AS items
                  FROM lineitem GROUP BY l_orderkey)
            ORDER BY l_orderkey"""))

  private val f16b = Q(
    "f16b_json_extract",
    "F16b JSON field extraction from a string column " +
      "(fetch_the_odds_api.py:119-132 shape)",
    (s, d) =>
      t(s, d, "events")
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast(IntegerType).as("k"))
        .orderBy("event_id"),
    Some("""SELECT event_id, CAST(props ->> '$.k' AS INT) AS k
            FROM events ORDER BY event_id"""))

  private val v1 = Q(
    "v1_schema_contract",
    "V1 required-column contract check, resolved at plan time " +
      "(validate_data.py:16-18,29-36)",
    (s, d) => {
      import s.implicits._
      val df = t(s, d, "lineitem")
      val required = Seq("l_orderkey", "l_quantity", "xg_home", "ref_name")
      val missing = Ops.missingColumns(df, required).toSet
      required.map(c => (c, !missing.contains(c)))
        .toDF("col_name", "present")
        .transform(graft.engine.Ops.reportSort("col_name"))
    },
    Some("""SELECT * FROM (VALUES
              ('l_orderkey', TRUE), ('l_quantity', TRUE),
              ('ref_name', FALSE), ('xg_home', FALSE)) AS t(col_name, present)
            ORDER BY col_name"""))

  val all: Seq[Q] = Seq(
    j2, j4, j5, j6, j9,
    a1, a2, a4, a6, a7,
    f1, f2, f3f4, f5f6, f9, f10, f11, f12f13, f14f15, f16, f16b,
    v1)
}
