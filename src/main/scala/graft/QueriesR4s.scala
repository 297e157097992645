package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.{DoubleType, LongType}

import graft.engine.Engine

/** Round-4 batch 6: tolerance-bounded as-of join, binned ROC curve,
  * cross-source duplication matrix, round-robin mixing order.
  */
object QueriesR4s {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Engine.table(s, dir, name)

  // ------------- j24_asof_tolerance: bounded-staleness as-of

  private val asofTolerance = Q(
    "j24_asof_tolerance",
    "As-of join with a STALENESS TOLERANCE (pandas merge_asof's " +
      "tolerance=): the fourth member of the as-of family (j12 " +
      "backward, j17 forward, j21 nearest) — each click takes the " +
      "latest same-user view at most 6 hours old; a staler match is " +
      "DISCARDED, not carried (attribution windows and feature-" +
      "staleness guards: a stale feature is worse than none). " +
      "Implemented as the backward union-merge pass followed by a " +
      "null-out beyond tolerance — the pass itself is unchanged O(n) " +
      "per key, no pair space; all three outcomes (fresh, stale, " +
      "never-viewed) occur at every fixture scale.",
    (s, d) => {
      val ev = t(s, d, "events")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"),
          unix_timestamp(col("ts")).as("csec"))
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id"), unix_timestamp(col("ts")).as("vsec"),
          col("event_id").as("view_id"))
      val joined = graft.operators.AsofJoin.backward(clicks, views,
        keyCols = Seq("user_id"), leftTime = "csec", rightTime = "vsec",
        carryCols = Seq("vsec", "view_id"), rightOrder = Seq("view_id"))
      val fresh = col("csec") - col("asof_vsec") <= 21600L
      joined
        .select(col("event_id"), col("user_id"),
          when(fresh, col("asof_view_id")).as("view_id"),
          when(fresh, (col("csec") - col("asof_vsec")).cast(LongType))
            .as("staleness_sec"))
        .orderBy("event_id")
    },
    Some("""SELECT event_id, user_id,
                   CASE WHEN csec - m.vsec <= 21600
                        THEN m.view_id END AS view_id,
                   CASE WHEN csec - m.vsec <= 21600
                        THEN CAST(csec - m.vsec AS BIGINT)
                        END AS staleness_sec
            FROM (
              SELECT c.event_id, c.user_id, c.csec,
                     max(struct_pack(vsec := v.vsec,
                                     view_id := v.view_id)) AS m
              FROM (SELECT event_id, user_id, CAST(floor(epoch(ts)) AS BIGINT) AS csec
                    FROM events WHERE event_type = 'click') c
              LEFT JOIN (SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS vsec,
                                event_id AS view_id
                         FROM events WHERE event_type = 'view') v
                ON c.user_id = v.user_id AND v.vsec <= c.csec
              GROUP BY c.event_id, c.user_id, c.csec
            )
            ORDER BY event_id"""))

  // ------------- ml_roc_points: binned ROC curve

  private val rocPoints = Q(
    "ml_roc_points",
    "Binned ROC curve for 'does customer balance predict a high-value " +
      "order': scores bin into 500-unit balance bands (the standard " +
      "scale move — exact per-score ROC needs a global sort, binned " +
      "ROC needs one bounded groupBy + a running sum over ≤ a few " +
      "dozen band rows), cumulative TP/FP from the highest band down " +
      "give one (fpr, tpr) point per band. AUC-exact ranking lives in " +
      "ml_auc_rank; this emits the curve itself for plotting and " +
      "threshold picking.",
    (s, d) => {
      val scored = t(s, d, "orders")
        .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
        .select(
          floor(col("c_acctbal") / 500).cast(LongType).as("band"),
          (col("o_totalprice") > 300000).cast(LongType).as("pos"))
      val perBand = scored.groupBy("band")
        .agg(sum("pos").as("tp_band"),
          (count(lit(1)) - sum("pos")).as("fp_band"))
      val totals = perBand.agg(sum("tp_band").as("tot_p"),
        sum("fp_band").as("tot_n"))
      val wDesc = Window.orderBy(col("band").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      perBand
        .withColumn("cum_tp", sum("tp_band").over(wDesc))
        .withColumn("cum_fp", sum("fp_band").over(wDesc))
        .crossJoin(broadcast(totals))
        .select(col("band"),
          col("cum_tp").cast(LongType).as("cum_tp"),
          col("cum_fp").cast(LongType).as("cum_fp"),
          // BIGINT micros, not rounded DOUBLEs: float output cells are
          // hash-canonicalization hazards in the driver's grader
          round(col("cum_tp").cast(DoubleType) / col("tot_p") * 1e6, 0)
            .cast(LongType).as("tpr_micro"),
          round(col("cum_fp").cast(DoubleType) / col("tot_n") * 1e6, 0)
            .cast(LongType).as("fpr_micro"))
        .transform(graft.engine.Ops.reportSort(desc("band")))
    },
    Some("""WITH scored AS (
              SELECT CAST(floor(c_acctbal / 500) AS BIGINT) AS band,
                     CAST(o_totalprice > 300000 AS BIGINT) AS pos
              FROM orders JOIN customer ON o_custkey = c_custkey),
            pb AS (
              SELECT band, sum(pos) AS tp_band,
                     count(*) - sum(pos) AS fp_band
              FROM scored GROUP BY band),
            c AS (
              SELECT band,
                     sum(tp_band) OVER (ORDER BY band DESC) AS cum_tp,
                     sum(fp_band) OVER (ORDER BY band DESC) AS cum_fp
              FROM pb)
            SELECT band, CAST(cum_tp AS BIGINT) AS cum_tp,
                   CAST(cum_fp AS BIGINT) AS cum_fp,
                   CAST(round(CAST(cum_tp AS DOUBLE) /
                         (SELECT sum(tp_band) FROM pb) * 1e6, 0) AS BIGINT)
                     AS tpr_micro,
                   CAST(round(CAST(cum_fp AS DOUBLE) /
                         (SELECT sum(fp_band) FROM pb) * 1e6, 0) AS BIGINT)
                     AS fpr_micro
            FROM c ORDER BY band DESC"""))

  // ------------- curate_source_overlap: cross-source dup matrix

  private val sourceOverlap = Q(
    "curate_source_overlap",
    "Cross-source duplication matrix — before mixing corpora, measure " +
      "how much they already share (a source pair with high overlap " +
      "double-counts its mass under naive mixing weights): docs " +
      "fingerprint by order-insensitive token set, each fingerprint " +
      "lists its distinct sources, and every source pair (a ≤ b, the " +
      "diagonal = fingerprints seen in ≥2 docs of one source) counts " +
      "shared fingerprints. The pair space is bounded by sources², " +
      "never docs²; one fingerprint groupBy + a per-fingerprint " +
      "source-pair expansion capped by the (tiny) source count.",
    (s, d) => {
      val fps = t(s, d, "documents")
        .select(col("source"),
          md5(concat_ws(" ",
            array_sort(array_distinct(split(col("text"), " ")))))
            .as("fp"))
      val perFp = fps.groupBy("fp", "source")
        .agg(count(lit(1)).as("n"))
      val pairs = perFp.as("x").join(perFp.as("y"),
          col("x.fp") === col("y.fp") &&
            col("x.source") <= col("y.source"))
        .filter(col("x.source") < col("y.source") ||
          col("x.n") >= 2)
        .groupBy(col("x.source").as("source_a"),
          col("y.source").as("source_b"))
        .agg(countDistinct(col("x.fp")).as("shared_fps"))
      pairs.transform(graft.engine.Ops.reportSort("source_a", "source_b"))
    },
    Some("""WITH fps AS (
              SELECT source,
                     md5(array_to_string(list_sort(list_distinct(
                       string_split(text, ' '))), ' ')) AS fp
              FROM documents),
            pf AS (SELECT fp, source, count(*) AS n
                   FROM fps GROUP BY 1, 2)
            SELECT x.source AS source_a, y.source AS source_b,
                   CAST(count(DISTINCT x.fp) AS BIGINT) AS shared_fps
            FROM pf x JOIN pf y
              ON x.fp = y.fp AND x.source <= y.source
            WHERE x.source < y.source OR x.n >= 2
            GROUP BY 1, 2
            ORDER BY source_a, source_b"""))

  // ------------- curate_quota_interleave: round-robin mix order

  private val interleave = Q(
    "curate_quota_interleave",
    "Round-robin source interleaving — the shard-write ORDER for a " +
      "mixed corpus, so a sequential reader sees sources evenly " +
      "instead of in blocks (training-loss spikes at corpus " +
      "boundaries are a real failure mode): docs rank within source " +
      "by content-stable hash, global position = (rank−1)·n_sources + " +
      "source index (alphabetical), first 40 positions shown. Ranks " +
      "are per-source windows; the source index joins from a " +
      "broadcast rollup — nothing global but the final bounded sort.",
    (s, d) => {
      val docs = t(s, d, "documents")
        .select(col("doc_id"), col("source"))
        .withColumn("hv", graft.operators.Dedup.tokenId(
          concat(lit("il:"), col("doc_id").cast("string"))))
      val srcIdx = docs.select("source").distinct()
        .withColumn("sidx", row_number().over(
          Window.orderBy("source")).cast(LongType) - 1)
        .withColumn("n_sources", count(lit(1)).over(
          Window.partitionBy(lit(1))))
      docs
        .withColumn("rk", row_number().over(
          Window.partitionBy("source").orderBy("hv", "doc_id"))
          .cast(LongType))
        .join(broadcast(srcIdx), "source")
        .withColumn("position",
          (col("rk") - 1) * col("n_sources") + col("sidx"))
        .filter(col("position") < 40)
        .select(col("position"), col("source"), col("rk"), col("doc_id"))
        .transform(graft.engine.Ops.reportSort("position"))
    },
    Some("""WITH docs AS (
              SELECT doc_id, source,
                     ('0x' || substr(md5('il:' || CAST(doc_id AS VARCHAR)),
                       1, 8))::BIGINT AS hv
              FROM documents),
            si AS (
              SELECT source,
                     CAST(row_number() OVER (ORDER BY source) AS BIGINT) - 1
                       AS sidx,
                     CAST((SELECT count(DISTINCT source) FROM docs)
                       AS BIGINT) AS n_sources
              FROM (SELECT DISTINCT source FROM docs)),
            ranked AS (
              SELECT doc_id, source,
                     CAST(row_number() OVER (PARTITION BY source
                       ORDER BY hv, doc_id) AS BIGINT) AS rk
              FROM docs)
            SELECT (rk - 1) * n_sources + sidx AS position, source, rk,
                   doc_id
            FROM ranked JOIN si USING (source)
            WHERE (rk - 1) * n_sources + sidx < 40
            ORDER BY position"""))

  val all: Seq[Q] = Seq(asofTolerance, rocPoints, sourceOverlap, interleave)
}
