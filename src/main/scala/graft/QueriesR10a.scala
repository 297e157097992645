package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

import graft.engine.Engine

/** Round-10 batch 1: eval-tier completion — ROUGE-L (VERDICT r9 task 7),
  * the LCS-based summarization-eval staple next to BLEU / chrF / token-F1.
  */
object QueriesR10a {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Engine.table(s, dir, name)

  // ------------- eval_rouge_l: LCS-based summarization metric

  private val rougeL = Q(
    "eval_rouge_l",
    "Corpus ROUGE-L (Lin 2004) — the longest-common-subsequence F-score " +
      "that rewards in-order (not necessarily contiguous) token overlap, " +
      "completing the eval tier next to BLEU/chrF/token-F1. The " +
      "hypothesis is the shared eval generator (every 5th doc verbatim, " +
      "rest drop-last + corrupt-every-7th), both sides truncated to " +
      "their leading 40 tokens (the DP is O(m·n) per doc — the cap " +
      "bounds it at 1600 cells regardless of document length, the " +
      "standard long-input discipline for quadratic eval metrics). LCS " +
      "runs as a WITHIN-ROW dynamic program: the classic rolling-row " +
      "recurrence dp_new[j] = if hyp_i = ref_j then dp_old[j-1]+1 else " +
      "max(dp_new[j-1], dp_old[j]), expressed as a nested higher-order " +
      "aggregate (outer fold over hypothesis tokens carries the DP row; " +
      "inner fold over reference positions rebuilds it — the j-1 " +
      "self-reference rules out a flat transform). P = LCS/m, R = " +
      "LCS/n, F = 2·LCS/(m+n) — each ONE IEEE division from exact " +
      "integers, micro-quantized per doc BEFORE the cross-doc mean " +
      "(BIGINT sums, the float-sum discipline), macro-averaged per " +
      "language. Runs on the deterministic doc_id ≡ 0 (mod 8) eval " +
      "slice (the chrF convention; filter pushes to the scan). Scale " +
      "shape: the DP is per-row compute with ZERO shuffle — only the " +
      "per-language rollup exchanges, so the query scales with corpus " +
      "bytes like any narrow map, the 100 TB-safe shape for eval " +
      "sweeps.",
    (s, d) => {
      val toks = t(s, d, "documents")
        .filter(col("doc_id") % 8 === 0 &&
          // spaces >= 4 ⇔ size(split) >= 5; cheap predicate stays out
          // of the split projection (round-13 TokProbe finding)
          length(col("text")) - length(translate(col("text"), " ", "")) >= 4)
        .select(col("doc_id"), col("lang"),
          split(col("text"), " ").as("ref0"))
        .withColumn("hyp0", when(col("doc_id") % 5 === 0, col("ref0"))
          .otherwise(expr("transform(slice(ref0, 1, size(ref0) - 1), " +
            "(t, i) -> CASE WHEN (i + 1) % 7 = 0 THEN 'xxx' ELSE t END)")))
        .select(col("doc_id"), col("lang"),
          expr("slice(ref0, 1, 40)").as("ref"),
          expr("slice(hyp0, 1, 40)").as("hyp"))
      // rolling-row LCS: dp holds row i as BIGINTs at positions 1..n+1
      // (dp[0..n]); the inner fold's accumulator holds the PREFIX of the
      // new row, so element_at(dpn, j) is exactly dp_new[j-1]
      val scored = toks.withColumn("lcs", expr(
        """element_at(
             aggregate(hyp,
               array_repeat(0L, size(ref) + 1),
               (dpo, tk) -> aggregate(
                 sequence(1, size(ref)),
                 array(0L),
                 (dpn, j) -> concat(dpn, array(
                   CASE WHEN tk = element_at(ref, j)
                        THEN element_at(dpo, j) + 1L
                        ELSE greatest(element_at(dpn, j),
                                      element_at(dpo, j + 1)) END)))),
             size(ref) + 1)"""))
        .select(col("lang"),
          col("lcs"),
          size(col("hyp")).cast(LongType).as("m"),
          size(col("ref")).cast(LongType).as("n"))
      def dd(c: org.apache.spark.sql.Column) = c.cast(DoubleType)
      scored
        .select(col("lang"),
          round(dd(col("lcs")) / dd(col("m")) * 1e6, 0)
            .cast(LongType).as("p_micro"),
          round(dd(col("lcs")) / dd(col("n")) * 1e6, 0)
            .cast(LongType).as("r_micro"),
          round(lit(2.0) * dd(col("lcs")) / dd(col("m") + col("n")) * 1e6, 0)
            .cast(LongType).as("f_micro"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          round(sum(col("p_micro")).cast(DoubleType) / count(lit(1)) / 1e6, 6)
            .as("mean_p"),
          round(sum(col("r_micro")).cast(DoubleType) / count(lit(1)) / 1e6, 6)
            .as("mean_r"),
          round(sum(col("f_micro")).cast(DoubleType) / count(lit(1)) / 1e6, 6)
            .as("mean_rouge_l"))
        // ≤5-row output: one-partition sort, no range-sample job
        .coalesce(1).sortWithinPartitions("lang")
    },
    Some("""WITH toks AS (
              SELECT doc_id, lang,
                     (string_split(text, ' '))[1:40] AS ref,
                     (CASE WHEN doc_id % 5 = 0 THEN string_split(text, ' ')
                      ELSE list_transform(
                        range(1, len(string_split(text, ' '))),
                        i -> CASE WHEN i % 7 = 0 THEN 'xxx'
                             ELSE string_split(text, ' ')[i] END)
                      END)[1:40] AS hyp
              FROM documents
              WHERE doc_id % 8 = 0
                AND len(string_split(text, ' ')) >= 5),
            lcs_t AS (
              SELECT lang,
                     list_reduce(
                       list_concat(
                         [list_transform(range(0, len(ref) + 1),
                                         z -> CAST(0 AS BIGINT))],
                         list_transform(range(1, len(hyp) + 1),
                                        i -> [CAST(i AS BIGINT)])),
                       (dpo, xi) -> list_reduce(
                         list_concat([[CAST(0 AS BIGINT)]],
                           list_transform(range(1, len(ref) + 1),
                                          j -> [CAST(j AS BIGINT)])),
                         (dpn, xj) -> list_append(dpn,
                           CASE WHEN hyp[CAST(xi[1] AS INT)]
                                     = ref[CAST(xj[1] AS INT)]
                                THEN dpo[CAST(xj[1] AS INT)] + 1
                                ELSE greatest(dpn[-1],
                                  dpo[CAST(xj[1] AS INT) + 1]) END))
                     )[-1] AS lcs,
                     CAST(len(hyp) AS BIGINT) AS m,
                     CAST(len(ref) AS BIGINT) AS n
              FROM toks),
            scored AS (
              SELECT lang,
                     CAST(round(CAST(lcs AS DOUBLE) / CAST(m AS DOUBLE)
                       * 1e6, 0) AS BIGINT) AS p_micro,
                     CAST(round(CAST(lcs AS DOUBLE) / CAST(n AS DOUBLE)
                       * 1e6, 0) AS BIGINT) AS r_micro,
                     CAST(round(CAST(2.0 AS DOUBLE) * CAST(lcs AS DOUBLE) /
                       CAST(m + n AS DOUBLE) * 1e6, 0) AS BIGINT) AS f_micro
              FROM lcs_t)
            SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
                   round(CAST(sum(p_micro) AS DOUBLE) / count(*) / 1e6, 6)
                     AS mean_p,
                   round(CAST(sum(r_micro) AS DOUBLE) / count(*) / 1e6, 6)
                     AS mean_r,
                   round(CAST(sum(f_micro) AS DOUBLE) / count(*) / 1e6, 6)
                     AS mean_rouge_l
            FROM scored GROUP BY lang ORDER BY lang"""))

  val all: Seq[Q] = Seq(rougeL)
}
