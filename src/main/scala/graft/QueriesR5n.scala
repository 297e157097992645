package graft

import graft.engine.Ck.Ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

import graft.engine.Engine

/** Round-5 batch 12: sample-ratio-mismatch guardrail, readability
  * scoring, LSH parameter planning.
  */
object QueriesR5n {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Engine.table(s, dir, name)

  // ------- stat_srm_check: the A/B sample-ratio-mismatch guardrail

  private val srmCheck = Q(
    "stat_srm_check",
    "Sample-ratio-mismatch check — the first guardrail every " +
      "experimentation platform runs before reading an A/B result: " +
      "users hash into arms by the deterministic integer mixer (the " +
      "bootstrap/permutation idiom, no RNG), observed arm counts test " +
      "against the intended 50/50 split with a chi² goodness-of-fit " +
      "(one dof) — not the contingency chi² of stat_chi2_indep. One " +
      "distinct-user rollup, a 2-row fold, exact integer counts; the " +
      "verdict flag applies the 3.84 (α=0.05) critical value.",
    (s, d) => {
      val arms = t(s, d, "events")
        .select(col("user_id")).distinct()
        .withColumn("a1", expr("(user_id * 2654435761L) % 2147483648L"))
        .withColumn("a2", expr(
          "(((a1 div 1024 + a1) % 2147483648L) * 2246822519L) % 2147483648L"))
        .select(col("user_id"),
          expr("(a2 div 64 + a2) % 2").as("arm"))
      val fold = arms.groupBy("arm").agg(count(lit(1)).as("n"))
        .agg(sum("n").as("nt"),
          sum(when(col("arm") === 1, col("n")).otherwise(0L)).as("n1"))
      def dd(c: String) = col(c).cast(DoubleType)
      val exp = dd("nt") / 2.0
      val chi = (dd("n1") - exp) * (dd("n1") - exp) / exp +
        (dd("nt") - dd("n1") - exp) * (dd("nt") - dd("n1") - exp) / exp
      fold.select(col("nt").as("n_users"), col("n1").as("n_arm1"),
        (col("nt") - col("n1")).as("n_arm0"),
        round(chi * 1e6, 0).cast(LongType).as("chi2_micro"),
        (chi > 3.841458820694124).cast(LongType).as("srm_flag"))
    },
    Some("""WITH mixed AS (
              SELECT user_id,
                     (user_id * 2654435761) % 2147483648 AS a1
              FROM (SELECT DISTINCT user_id FROM events)),
            arms AS (
              SELECT user_id,
                     ((((a1 // 1024 + a1) % 2147483648) * 2246822519)
                        % 2147483648 // 64 +
                      (((a1 // 1024 + a1) % 2147483648) * 2246822519)
                        % 2147483648) % 2 AS arm
              FROM mixed),
            fold AS (
              SELECT CAST(count(*) AS BIGINT) AS nt,
                     CAST(sum(arm) AS BIGINT) AS n1
              FROM arms)
            SELECT nt AS n_users, n1 AS n_arm1, nt - n1 AS n_arm0,
                   CAST(round(((n1 - nt / 2.0) * (n1 - nt / 2.0) /
                       (nt / 2.0) +
                     ((nt - n1) - nt / 2.0) * ((nt - n1) - nt / 2.0) /
                       (nt / 2.0)) * 1e6, 0) AS BIGINT) AS chi2_micro,
                   CAST(((n1 - nt / 2.0) * (n1 - nt / 2.0) / (nt / 2.0) +
                     ((nt - n1) - nt / 2.0) * ((nt - n1) - nt / 2.0) /
                       (nt / 2.0)) > 3.841458820694124 AS BIGINT)
                     AS srm_flag
            FROM fold"""))

  // ------- text_readability: Flesch scores from syllable heuristics

  private val readability = Q(
    "text_readability",
    "Readability scoring per source — Flesch Reading Ease and " +
      "Flesch-Kincaid grade from the classic vowel-group syllable " +
      "heuristic (a syllable ≈ a maximal [aeiouy]+ run — the standard " +
      "cheap proxy; real hyphenation is locale lexicons, not a data " +
      "pipeline's job): words = whitespace tokens, sentences = " +
      "[.!?]+ runs (min 1), syllables = vowel-group count per doc via " +
      "one codegen'd regexp pass. Per-doc integer triples roll up per " +
      "source; the two scores assemble from exact sums and are " +
      "micro-rounded — the curation signal that flags both " +
      "keyword-stuffed and run-on text.",
    (s, d) => {
      val perDoc = t(s, d, "documents")
        .select(col("source"),
          size(split(col("text"), " ")).cast(LongType).as("w"),
          greatest(size(expr(
            "regexp_extract_all(text, '[.!?]+', 0)")), lit(1))
            .cast(LongType).as("sen"),
          size(expr(
            "regexp_extract_all(lower(text), '[aeiouy]+', 0)"))
            .cast(LongType).as("syl"))
      def dd(c: String) = col(c).cast(DoubleType)
      perDoc.groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum("w").as("words"),
          sum("sen").as("sentences"), sum("syl").as("syllables"))
        .select(col("source"), col("n_docs"), col("words"),
          col("sentences"), col("syllables"),
          round((lit(206.835) - lit(1.015) * dd("words") / dd("sentences") -
            lit(84.6) * dd("syllables") / dd("words")) * 1e3, 0)
            .cast(LongType).as("flesch_ease_milli"),
          round((lit(0.39) * dd("words") / dd("sentences") +
            lit(11.8) * dd("syllables") / dd("words") - lit(15.59)) * 1e3,
            0).cast(LongType).as("fk_grade_milli"))
        .transform(graft.engine.Ops.reportSort("source"))
    },
    Some("""WITH per_doc AS (
              SELECT source,
                     CAST(len(string_split(text, ' ')) AS BIGINT) AS w,
                     CAST(greatest(len(regexp_extract_all(text,
                       '[.!?]+')), 1) AS BIGINT) AS sen,
                     CAST(len(regexp_extract_all(lower(text),
                       '[aeiouy]+')) AS BIGINT) AS syl
              FROM documents)
            SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(w) AS BIGINT) AS words,
                   CAST(sum(sen) AS BIGINT) AS sentences,
                   CAST(sum(syl) AS BIGINT) AS syllables,
                   CAST(round((206.835 -
                     1.015 * CAST(sum(w) AS DOUBLE) / sum(sen) -
                     84.6 * CAST(sum(syl) AS DOUBLE) / sum(w)) * 1e3, 0)
                     AS BIGINT) AS flesch_ease_milli,
                   CAST(round((0.39 * CAST(sum(w) AS DOUBLE) / sum(sen) +
                     11.8 * CAST(sum(syl) AS DOUBLE) / sum(w) - 15.59)
                     * 1e3, 0) AS BIGINT) AS fk_grade_milli
            FROM per_doc GROUP BY 1 ORDER BY 1"""))

  // ------- dedup_lsh_planner: the (bands, rows) s-curve planner

  private val lshPlanner = Q(
    "dedup_lsh_planner",
    "LSH parameter planning from MEASURED similarity, not guesswork: " +
      "over a bounded doc panel's exact pairwise token-set Jaccards, " +
      "each 8-hash budget split (b bands × r rows ∈ {8×1, 4×2, 2×4}) " +
      "scores its s-curve P(candidate) = 1−(1−s^r)^b pair by pair, " +
      "yielding expected candidate volume, expected recall on true " +
      "near-dups (J ≥ 0.7), and expected false-candidate share — the " +
      "table that picks banding before an LSH run at corpus scale. " +
      "Panel pairs are |panel|² bounded (the audit-on-a-sample " +
      "shape); the sweep is a ×3 explode over the scored pair frame.",
    (s, d) => {
      val panel = t(s, d, "documents")
        .filter(col("doc_id") % 31 === 0)
        .select(col("doc_id").as("id"),
          array_distinct(split(col("text"), " ")).as("tk"))
        .ckpt(true)
      val pairs = panel.as("x").join(
          panel.select(col("id").as("jid"), col("tk").as("jtk")),
          col("id") < col("jid"))
        .select(col("id"), col("jid"),
          (size(array_intersect(col("tk"), col("jtk"))).cast(DoubleType) /
            size(array_union(col("tk"), col("jtk"))).cast(DoubleType))
            .as("s"))
      val swept = pairs.select(col("s"),
        explode(expr("array(struct(8 AS b, 1 AS r), " +
          "struct(4 AS b, 2 AS r), struct(2 AS b, 4 AS r))")).as("cfg"))
        .select(col("s"), col("cfg.b").as("b"), col("cfg.r").as("r"),
          (lit(1.0) - pow(lit(1.0) - pow(col("s"), col("r")),
            col("b"))).as("p"))
      def dd(c: String) = col(c).cast(DoubleType)
      // nano-rounded per-pair s-curve terms, exact integer sums (pow is
      // libm-ulp-sensitive and pair-sum order is engine-dependent); the
      // double reconstructs via one identical division per output
      swept.groupBy("b", "r")
        .agg(count(lit(1)).as("n_pairs"),
          round(sum(round(col("p") * 1e9, 0).cast(LongType))
            .cast(DoubleType) / 1e9, 3).as("exp_cand"),
          (sum(when(col("s") >= 0.7,
            round(col("p") * 1e9, 0).cast(LongType)))
            .cast(DoubleType) / 1e9).as("hit"),
          sum(when(col("s") >= 0.7, 1.0)).as("trueDup"),
          round(sum(when(col("s") < 0.7,
            round(col("p") * 1e9, 0).cast(LongType)))
            .cast(DoubleType) / 1e9, 3).as("falseCand"))
        .select(col("b").cast(LongType).as("bands"),
          col("r").cast(LongType).as("rows_per_band"), col("n_pairs"),
          round(col("exp_cand") * 1e3, 0).cast(LongType)
            .as("exp_candidates_milli"),
          round(col("hit") * 1e6 / col("trueDup"), 0).cast(LongType)
            .as("exp_recall_micro"),
          round(col("falseCand") * 1e3, 0).cast(LongType)
            .as("exp_false_cand_milli"))
        .transform(graft.engine.Ops.reportSort(desc("bands")))
    },
    Some("""WITH panel AS (
              SELECT doc_id AS id,
                     list_distinct(string_split(text, ' ')) AS tk
              FROM documents WHERE doc_id % 31 = 0),
            pairs AS (
              SELECT x.id, y.id AS jid,
                     CAST(len(list_intersect(x.tk, y.tk)) AS DOUBLE) /
                       len(list_distinct(list_concat(x.tk, y.tk))) AS s
              FROM panel x JOIN panel y ON x.id < y.id),
            swept AS (
              SELECT s, b, r,
                     1.0 - pow(1.0 - pow(s, r), b) AS p
              FROM pairs
              CROSS JOIN (SELECT unnest([{'b': 8, 'r': 1},
                {'b': 4, 'r': 2}, {'b': 2, 'r': 4}],
                recursive := true)))
            SELECT CAST(b AS BIGINT) AS bands,
                   CAST(r AS BIGINT) AS rows_per_band,
                   CAST(count(*) AS BIGINT) AS n_pairs,
                   CAST(round(round(CAST(sum(CAST(round(p * 1e9, 0)
                       AS BIGINT)) AS DOUBLE) / 1e9, 3) * 1e3, 0)
                     AS BIGINT) AS exp_candidates_milli,
                   CAST(round(CAST(sum(CASE WHEN s >= 0.7 THEN
                       CAST(round(p * 1e9, 0) AS BIGINT) END)
                       AS DOUBLE) / 1e9 * 1e6 /
                     sum(CASE WHEN s >= 0.7 THEN 1.0 END), 0) AS BIGINT)
                     AS exp_recall_micro,
                   CAST(round(round(CAST(sum(CASE WHEN s < 0.7 THEN
                       CAST(round(p * 1e9, 0) AS BIGINT) END)
                       AS DOUBLE) / 1e9, 3) * 1e3, 0) AS BIGINT)
                     AS exp_false_cand_milli
            FROM swept GROUP BY b, r ORDER BY bands DESC"""))

  val all: Seq[Q] = Seq(srmCheck, readability, lshPlanner)
}
