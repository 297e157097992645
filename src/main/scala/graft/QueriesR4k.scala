package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.LongType

import graft.engine.Engine

/** Round-3 batch 37: Theil-Sen robust trend over bounded pair sets,
  * exact weighted median by integer threshold rule, and an
  * order-insensitive row-digest reconciliation audit.
  */
object QueriesR4k {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Engine.table(s, dir, name)

  // ------------- stat_theil_sen: robust slope, bounded pairs

  private val theilSen = Q(
    "stat_theil_sen",
    "Theil-Sen robust trend per user over the LAST 15 days of daily " +
      "volume: the median of all pairwise slopes (Δcount/Δdays) — the " +
      "estimator that shrugs off the outlier days that wreck OLS. The " +
      "pair space is BOUNDED by construction (≤105 pairs/user from 15 " +
      "days), so the per-user self-join cannot explode at any corpus " +
      "size; the median is the lower-median rule (⌈n/2⌉-th smallest, " +
      "ties broken by the pair's day coordinates) — a deterministic " +
      "row pick, not an interpolation, so engines cannot drift. One " +
      "shuffle on user_id end to end.",
    (s, d) => {
      // whole estimator as ONE per-user generator row (the
      // coPurchasePairs idiom): the ≤15 recent days collect into an
      // array, the ≤105 pair slopes enumerate inside the row, and the
      // lower-median is a struct-sort + element pick — one scan, two
      // keyed shuffles, zero windows/self-joins (the previous shape
      // re-derived the events scan 3× and ran two ranking windows).
      // Struct sort order (slope, da, db) is Spark's native lexicographic
      // array_sort — identical to the oracle's ORDER BY.
      val daily = t(s, d, "events")
        .groupBy(col("user_id"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("y"))
      daily.groupBy("user_id")
        .agg(slice(sort_array(collect_list(struct(col("day"), col("y"))),
          asc = false), 1, 15).as("ds"))
        // every i<j pair emits exactly one slope struct, so
        // size(sl) > 0 ⇔ size(ds) >= 2 — filtering on ds BEFORE the
        // pairwise-slope projection keeps the pushed-down predicate
        // from enumerating all 105 slopes per user twice (round-13
        // TokProbe finding on filter-above-project duplication)
        .filter(size(col("ds")) >= 2)
        .select(col("user_id"), size(col("ds")).as("n_days"),
          expr("""array_sort(flatten(transform(
              sequence(0, size(ds) - 2), i -> transform(
                sequence(i + 1, size(ds) - 1), j -> struct(
                  CAST(ds[i].y - ds[j].y AS DOUBLE) /
                    CAST(datediff(ds[i].day, ds[j].day) AS DOUBLE)
                    AS slope,
                  ds[j].day AS da, ds[i].day AS db)))))""").as("sl"))
        .filter(size(col("sl")) > 0)
        .select(col("user_id"), col("n_days").cast(LongType).as("n_days"),
          size(col("sl")).cast(LongType).as("n_pairs"),
          round(expr(
            "sl[(size(sl) + size(sl) % 2) div 2 - 1].slope"), 6)
            .as("ts_slope"))
        .transform(graft.engine.Ops.reportSort("user_id"))
    },
    Some("""WITH daily AS (
              SELECT user_id, CAST(ts AS DATE) AS day,
                     CAST(count(*) AS BIGINT) AS y
              FROM events GROUP BY 1, 2),
            recent AS (
              SELECT user_id, day, y FROM daily
              QUALIFY row_number() OVER (PARTITION BY user_id
                ORDER BY day DESC) <= 15),
            nd AS (
              SELECT user_id, CAST(count(*) AS BIGINT) AS n_days
              FROM recent GROUP BY 1),
            pairs AS (
              SELECT a.user_id, a.day AS da, b.day AS db,
                     CAST(b.y - a.y AS DOUBLE) /
                       date_diff('day', a.day, b.day) AS slope
              FROM recent a JOIN recent b
                ON a.user_id = b.user_id AND a.day < b.day),
            med AS (
              SELECT user_id, slope,
                     CAST(count(*) OVER (PARTITION BY user_id) AS BIGINT)
                       AS n_pairs,
                     row_number() OVER (PARTITION BY user_id
                       ORDER BY slope, da, db) AS rns
              FROM pairs)
            SELECT user_id, n_days, n_pairs,
                   round(slope, 6) AS ts_slope
            FROM med JOIN nd USING (user_id)
            WHERE rns * 2 = n_pairs + (n_pairs % 2)
            ORDER BY user_id"""))

  // ------------- a27_weighted_median: exact threshold rule

  private val weightedMedian = Q(
    "a27_weighted_median",
    "Exact weighted median of event value per event type, weights " +
      "pulled from the JSON props payload: sort by (value, event_id), " +
      "running weight via a rows-frame window, and the median is the " +
      "FIRST row where 2·cum_weight ≥ total — a pure integer " +
      "threshold on exact BIGINT sums, no interpolation, so the " +
      "picked row (and its value) is identical on every engine and " +
      "every partitioning. One window + one broadcast total per " +
      "type; the deterministic tiebreak makes reruns byte-stable.",
    (s, d) => {
      val base = t(s, d, "events")
        .select(col("event_type"), col("event_id"), col("value"),
          get_json_object(col("props"), "$.k").cast(LongType).as("w"))
      val wCum = Window.partitionBy("event_type")
        .orderBy("value", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wTot = Window.partitionBy("event_type")
      base
        .withColumn("cumw", sum("w").over(wCum).cast(LongType))
        .withColumn("totw", sum("w").over(wTot).cast(LongType))
        .withColumn("n", count(lit(1)).over(wTot).cast(LongType))
        .filter(col("cumw") * 2 >= col("totw"))
        .withColumn("rn", row_number().over(
          Window.partitionBy("event_type").orderBy("value", "event_id")))
        .filter(col("rn") === 1)
        .select(col("event_type"), col("n").as("n_events"),
          col("totw").as("total_w"), col("value").as("w_median_value"),
          col("cumw").as("cum_at_median"))
        .transform(graft.engine.Ops.reportSort("event_type"))
    },
    Some("""WITH base AS (
              SELECT event_type, event_id, value,
                     CAST(props ->> '$.k' AS BIGINT) AS w
              FROM events),
            cum AS (
              SELECT event_type, event_id, value,
                     CAST(sum(w) OVER (PARTITION BY event_type
                       ORDER BY value, event_id
                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cumw,
                     CAST(sum(w) OVER (PARTITION BY event_type)
                       AS BIGINT) AS totw,
                     CAST(count(*) OVER (PARTITION BY event_type)
                       AS BIGINT) AS n
              FROM base),
            hit AS (
              SELECT event_type, n, totw, value, cumw,
                     row_number() OVER (PARTITION BY event_type
                       ORDER BY value, event_id) AS rn
              FROM cum WHERE cumw * 2 >= totw)
            SELECT event_type, n AS n_events, totw AS total_w,
                   value AS w_median_value, cumw AS cum_at_median
            FROM hit WHERE rn = 1 ORDER BY event_type"""))

  // ------------- dq_row_digest: reconciliation checksum

  private val rowDigest = Q(
    "dq_row_digest",
    "Order-insensitive row-digest reconciliation between two replicas " +
      "of the orders table — the cross-engine diff primitive a " +
      "migration (or this very test harness) runs to localize drift " +
      "WITHOUT sorting or moving rows: each row folds to a 60-bit " +
      "md5-prefix integer over its canonical key string, and a " +
      "partition's digest is the XOR of its row hashes (commutative, " +
      "so no ordering, no shuffle beyond the per-status groupBy). " +
      "Replica B is replica A with fulfilled-order dates shifted one " +
      "day (a simulated bad backfill): the audit pins the drift to " +
      "status F and certifies O and P byte-identical — count equality " +
      "alone would have missed it.",
    (s, d) => {
      def digest(df: DataFrame): DataFrame = df
        .select(col("o_orderstatus").as("status"),
          conv(substring(md5(concat_ws("|",
            col("o_orderkey"),
            date_format(col("day"), "yyyy-MM-dd"),
            col("o_orderstatus"))), 1, 15), 16, 10)
            .cast(LongType).as("h"))
        .groupBy("status")
        .agg(count(lit(1)).as("n"), expr("bit_xor(h)").as("digest"))
      val a = t(s, d, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"),
          to_date(col("o_orderdate")).as("day"))
      val b = a.withColumn("day",
        when(col("o_orderstatus") === "F", date_add(col("day"), 1))
          .otherwise(col("day")))
      digest(a).withColumnRenamed("n", "n_a")
        .withColumnRenamed("digest", "digest_a")
        .join(digest(b).withColumnRenamed("n", "n_b")
          .withColumnRenamed("digest", "digest_b"), "status")
        .select(col("status"), col("n_a"), col("n_b"),
          col("digest_a"), col("digest_b"),
          (col("digest_a") === col("digest_b") &&
            col("n_a") === col("n_b")).as("in_sync"))
        .transform(graft.engine.Ops.reportSort("status"))
    },
    Some("""WITH a AS (
              SELECT o_orderkey, o_orderstatus AS status,
                     CAST(o_orderdate AS DATE) AS day
              FROM orders),
            b AS (
              SELECT o_orderkey, status,
                     CASE WHEN status = 'F' THEN day + INTERVAL 1 DAY
                          ELSE day END AS day
              FROM a),
            da AS (
              SELECT status, CAST(count(*) AS BIGINT) AS n_a,
                     bit_xor(('0x' || substr(md5(
                       o_orderkey || '|' || strftime(day, '%Y-%m-%d')
                         || '|' || status), 1, 15))::BIGINT) AS digest_a
              FROM a GROUP BY 1),
            db AS (
              SELECT status, CAST(count(*) AS BIGINT) AS n_b,
                     bit_xor(('0x' || substr(md5(
                       o_orderkey || '|' || strftime(CAST(day AS DATE),
                         '%Y-%m-%d') || '|' || status), 1, 15))::BIGINT)
                       AS digest_b
              FROM b GROUP BY 1)
            SELECT status, n_a, n_b, digest_a, digest_b,
                   digest_a = digest_b AND n_a = n_b AS in_sync
            FROM da JOIN db USING (status)
            ORDER BY status"""))

  val all: Seq[Q] = Seq(theilSen, weightedMedian, rowDigest)
}
