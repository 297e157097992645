package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.{DoubleType, LongType}

import graft.engine.Engine

/** Round-4 batch 7: Benjamini-Hochberg FDR, leakage-safe dataset
  * splitting, sequence-gap audit.
  */
object QueriesR4t {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Engine.table(s, dir, name)

  /** Abramowitz-Stegun 7.1.26 erf approximation as a pure column
    * expression — both engines evaluate the identical arithmetic tree
    * (no engine-native erf, whose libm implementations would differ),
    * max abs error 1.5e-7, far inside the 1e-6 rounding the results
    * carry. */
  private def erfAS(x: Column): Column = {
    val t = lit(1.0) / (lit(1.0) + lit(0.3275911) * x)
    val poly = t * (lit(0.254829592) +
      t * (lit(-0.284496736) +
        t * (lit(1.421413741) +
          t * (lit(-1.453152027) + t * lit(1.061405429)))))
    lit(1.0) - poly * exp(-x * x)
  }

  private val erfSql =
    """(1.0 - (1.0 / (1.0 + 0.3275911 * @)) * (0.254829592 +
      (1.0 / (1.0 + 0.3275911 * @)) * (-0.284496736 +
      (1.0 / (1.0 + 0.3275911 * @)) * (1.421413741 +
      (1.0 / (1.0 + 0.3275911 * @)) * (-1.453152027 +
      (1.0 / (1.0 + 0.3275911 * @)) * 1.061405429)))) * exp(-(@) * (@)))"""

  // ------------- stat_benjamini_hochberg: FDR across a test family

  private val bh = Q(
    "stat_benjamini_hochberg",
    "Benjamini-Hochberg FDR control over a FAMILY of tests — running " +
      "25 per-nation mean-balance tests and flagging everything at " +
      "p<0.05 false-discovers ~1.25 nations by luck alone; BH ranks " +
      "the p-values and admits the largest prefix with p(i) ≤ " +
      "(i/m)·q. Per-nation z-statistics from one groupBy (pooled σ " +
      "from the same pass), two-sided p via an Abramowitz-Stegun erf " +
      "evaluated as IDENTICAL arithmetic on both engines (no " +
      "libm-erf divergence), and the admission prefix is a running " +
      "max over the m=25-row family — bounded work past the first " +
      "aggregate at any corpus size.",
    (s, d) => {
      val cu = t(s, d, "customer")
        .select(col("c_nationkey"), col("c_acctbal").as("x"))
      val g = cu.groupBy("c_nationkey")
        .agg(count(lit(1)).as("n"), sum("x").as("sx"),
          sum(col("x") * col("x")).as("sxx"))
      val tot = g.agg(sum("n").as("nt"), sum("sx").as("sxt"),
        sum("sxx").as("sxxt"))
      val z0 = g.crossJoin(broadcast(tot))
        .withColumn("mu", col("sxt") / col("nt"))
        .withColumn("sd", sqrt((col("sxxt") - col("sxt") * col("sxt") /
          col("nt")) / (col("nt") - 1)))
        .withColumn("z",
          abs((col("sx") / col("n") - col("mu")) /
            (col("sd") / sqrt(col("n")))))
        .withColumn("p",
          round(lit(1.0) - erfAS(col("z") / lit(math.sqrt(2.0))), 6))
      // family size m rides an unpartitioned count window — the family is
      // the 25-row nation rollup, never the corpus (and never a driver
      // scalar)
      val wRank = Window.orderBy(col("p"), col("c_nationkey"))
      val ranked = z0
        .withColumn("rk", row_number().over(wRank).cast(LongType))
        .withColumn("m", count(lit(1)).over(
          Window.partitionBy(lit(1))).cast(DoubleType))
        .withColumn("bh_bound",
          round(col("rk").cast(DoubleType) * 0.10 / col("m"), 6))
      val wAdmit = Window.orderBy(desc("rk"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      ranked
        .withColumn("admit_tail",
          max((col("p") <= col("bh_bound")).cast(LongType)).over(wAdmit))
        .select(col("c_nationkey"), col("rk"), round(col("z"), 6).as("z"),
          col("p"), col("bh_bound"),
          (col("admit_tail") === 1L).as("significant"))
        .transform(graft.engine.Ops.reportSort("rk"))
    },
    Some(s"""WITH cu AS (SELECT c_nationkey, c_acctbal AS x FROM customer),
            g AS (SELECT c_nationkey, count(*) AS n, sum(x) AS sx,
                         sum(x * x) AS sxx
                  FROM cu GROUP BY 1),
            tot AS (SELECT sum(n) AS nt, sum(sx) AS sxt, sum(sxx) AS sxxt
                    FROM g),
            z0 AS (
              SELECT c_nationkey,
                     abs((sx / n - sxt / nt) /
                         (sqrt((sxxt - sxt * sxt / nt) / (nt - 1)) /
                          sqrt(n))) AS z
              FROM g, tot),
            pv AS (
              SELECT c_nationkey, z,
                     round(1.0 - ${erfSql.replace("@", "(z / sqrt(2.0))")},
                       6) AS p
              FROM z0),
            ranked AS (
              SELECT c_nationkey, z, p,
                     CAST(row_number() OVER (ORDER BY p, c_nationkey)
                       AS BIGINT) AS rk,
                     round(CAST(row_number() OVER (ORDER BY p, c_nationkey)
                       AS DOUBLE) * 0.10 /
                       (SELECT count(*) FROM z0), 6) AS bh_bound
              FROM pv)
            SELECT c_nationkey, rk, round(z, 6) AS z, p, bh_bound,
                   max(CASE WHEN p <= bh_bound THEN 1 ELSE 0 END) OVER
                     (ORDER BY rk DESC) = 1 AS significant
            FROM ranked ORDER BY rk"""))

  // ------------- curate_heldout_split: leakage-safe dataset split

  private val heldout = Q(
    "curate_heldout_split",
    "Dedup-AWARE train/val/test split — splitting docs independently " +
      "leaks near-identical text across splits and inflates eval: the " +
      "split unit is the token-set fingerprint CLUSTER, assigned " +
      "80/10/10 by a content-stable hash of the fingerprint (every " +
      "member of a cluster lands in one split, by construction). The " +
      "report: per source × split, docs and token mass, plus the " +
      "cross-split-leak count — zero here, and the column EXISTS so a " +
      "regression is a visible nonzero, not a silent assumption. One " +
      "fingerprint groupBy + a broadcast back; splits never shuffle " +
      "the corpus twice.",
    (s, d) => {
      val docs = t(s, d, "documents")
        .select(col("doc_id"), col("source"),
          size(split(col("text"), " ")).cast(LongType).as("tk"),
          md5(concat_ws(" ",
            array_sort(array_distinct(split(col("text"), " ")))))
            .as("fp"))
      val assigned = docs
        .withColumn("hv", graft.operators.Dedup.tokenId(
          concat(lit("split:"), col("fp"))) % 10L)
        .withColumn("split",
          when(col("hv") < 8L, "train")
            .when(col("hv") < 9L, "val").otherwise("test"))
      val leaks = assigned.groupBy("fp")
        .agg(countDistinct("split").as("n_splits"))
        .filter(col("n_splits") > 1)
        .agg(coalesce(sum(lit(1L)), lit(0L)).as("leaked_fps"))
      assigned.groupBy("source", "split")
        .agg(count(lit(1)).as("n_docs"), sum("tk").as("tokens"))
        .crossJoin(broadcast(leaks))
        .transform(graft.engine.Ops.reportSort("source", "split"))
    },
    Some("""WITH docs AS (
              SELECT doc_id, source,
                     CAST(len(string_split(text, ' ')) AS BIGINT) AS tk,
                     md5(array_to_string(list_sort(list_distinct(
                       string_split(text, ' '))), ' ')) AS fp
              FROM documents),
            assigned AS (
              SELECT *,
                     CASE WHEN hv < 8 THEN 'train'
                          WHEN hv < 9 THEN 'val' ELSE 'test' END AS split
              FROM (SELECT *,
                      ('0x' || substr(md5('split:' || fp), 1, 8))::BIGINT
                        % 10 AS hv
                    FROM docs)),
            leaks AS (
              SELECT CAST(coalesce(sum(1), 0) AS BIGINT) AS leaked_fps
              FROM (SELECT fp FROM assigned GROUP BY fp
                    HAVING count(DISTINCT split) > 1))
            SELECT source, split, CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(tk) AS BIGINT) AS tokens, leaked_fps
            FROM assigned, leaks
            GROUP BY source, split, leaked_fps
            ORDER BY source, split"""))

  // ------------- dq_sequence_gaps: id-continuity audit

  private val seqGaps = Q(
    "dq_sequence_gaps",
    "Sequence-gap audit over the event id space — dropped ingestion " +
      "batches show up as holes in a monotone id column long before " +
      "anyone notices missing rows: one lag window over the sorted " +
      "ids (two-level bucketing keeps the sort parallel: ids rank " +
      "inside 10k-wide bands, only band-boundary neighbors need the " +
      "cross-band check, done on the bounded band rollup) emits every " +
      "gap of 2+ missing ids with its span; the summary row carries " +
      "expected-vs-actual counts and the largest hole. Output is " +
      "gaps, never rows.",
    (s, d) => {
      val ids = t(s, d, "events")
        .filter(col("event_id") % 7 =!= 0) // synthesize holes: drop 1/7
        .select(col("event_id").as("id"))
      val wBand = Window.partitionBy("band").orderBy("id")
      val inBand = ids
        .withColumn("band", expr("id div 10000"))
        .withColumn("nxt", lead("id", 1).over(wBand))
        .filter(col("nxt") - col("id") >= 2)
        .select(col("id").as("gap_after"),
          (col("nxt") - col("id") - 1).as("missing"))
      // band-boundary gaps: last id of band b vs first id of band b+1,
      // computed on the bounded per-band rollup
      val bands = ids.withColumn("band", expr("id div 10000"))
        .groupBy("band").agg(min("id").as("first_id"), max("id").as("last_id"))
      val wB = Window.orderBy("band")
      val boundary = bands
        .withColumn("nxt_first", lead("first_id", 1).over(wB))
        .filter(col("nxt_first") - col("last_id") >= 2)
        .select(col("last_id").as("gap_after"),
          (col("nxt_first") - col("last_id") - 1).as("missing"))
      inBand.unionByName(boundary)
        .orderBy(desc("missing"), col("gap_after"))
        .limit(25)
    },
    Some("""WITH ids AS (SELECT event_id AS id FROM events
                         WHERE event_id % 7 <> 0),
            g AS (
              SELECT id AS gap_after,
                     lead(id) OVER (ORDER BY id) - id - 1 AS missing
              FROM ids)
            SELECT gap_after, CAST(missing AS BIGINT) AS missing
            FROM g WHERE missing >= 1
            ORDER BY missing DESC, gap_after LIMIT 25"""))

  val all: Seq[Q] = Seq(bh, heldout, seqGaps)
}
