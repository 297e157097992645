package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.engine.Engine
import graft.operators.{TextAnalysis => TA}

/** Round-3 batch 27 — the classifier-evaluation & encoding tier:
  * leave-one-out target encoding, precision/recall/F1 in exact integer
  * basis points, and Cohen's kappa for agreement beyond chance.
  */
object QueriesR4a {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Engine.table(s, dir, name)

  // ------------- ml_target_encode: leave-one-out target encoding

  private val targetEncode = Q(
    "ml_target_encode",
    "Leave-one-out target encoding of a categorical feature — the " +
      "standard trick for feeding high-cardinality categoricals to " +
      "gradient boosting WITHOUT leaking each row's own label: every " +
      "lineitem gets the return-rate of its (supplier) group computed " +
      "from all OTHER rows, (group_pos - own) * 10000 div (group_n - 1), " +
      "kept integer-exact in basis points. One groupBy builds the " +
      "per-key sums, one hash join fans them back — no window over the " +
      "fact table, so nothing single-partitions at any scale; " +
      "singleton groups (no peers) fall back to the global rate " +
      "EXCLUDING the row, the same no-leak contract. Output is a " +
      "deterministic 5%-hash sample of encoded rows.",
    (s, d) => {
      val li = t(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_suppkey"),
          (col("l_returnflag") === "R").cast(LongType).as("pos"))
      val grp = li.groupBy("l_suppkey")
        .agg(count(lit(1)).as("n_grp"), sum("pos").cast(LongType).as("p_grp"))
      val tot = li.agg(count(lit(1)).as("n_all"),
        sum("pos").cast(LongType).as("p_all"))
      li.join(grp, "l_suppkey").crossJoin(broadcast(tot))
        .filter(
          graft.operators.Dedup.tokenId(
            concat_ws("#", col("l_orderkey"), col("l_linenumber"))) % 100 < 5)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_suppkey"),
          col("pos"),
          when(col("n_grp") > 1L,
            expr("((p_grp - pos) * 10000) div (n_grp - 1)"))
            .otherwise(expr("((p_all - pos) * 10000) div (n_all - 1)"))
            .as("loo_rate_bp"))
        .orderBy("l_orderkey", "l_linenumber")
    },
    Some("""WITH li AS (SELECT l_orderkey, l_linenumber, l_suppkey,
                               CAST(l_returnflag = 'R' AS BIGINT) AS pos
                        FROM lineitem),
            grp AS (SELECT l_suppkey, CAST(count(*) AS BIGINT) AS n_grp,
                           CAST(sum(pos) AS BIGINT) AS p_grp
                    FROM li GROUP BY 1),
            tot AS (SELECT CAST(count(*) AS BIGINT) AS n_all,
                           CAST(sum(pos) AS BIGINT) AS p_all
                    FROM li)
            SELECT l_orderkey, l_linenumber, l_suppkey, pos,
                   CASE WHEN n_grp > 1
                        THEN ((p_grp - pos) * 10000) // (n_grp - 1)
                        ELSE ((p_all - pos) * 10000) // (n_all - 1)
                   END AS loo_rate_bp
            FROM li JOIN grp USING (l_suppkey) CROSS JOIN tot
            WHERE ('0x' || substr(md5(l_orderkey || '#' || l_linenumber),
                     1, 8))::BIGINT % 100 < 5
            ORDER BY l_orderkey, l_linenumber"""))

  // ------------- ml_prf_metrics: P/R/F1 in exact basis points

  private val prf = Q(
    "ml_prf_metrics",
    "Precision / recall / F1 of the heuristic language-ID against gold " +
      "labels, per class and kept EXACT: tp/fp/fn are one conditional " +
      "aggregate over the scored corpus, and every metric is an " +
      "integer-bp rational of counts — prec = tp*10000 div (tp+fp), " +
      "f1 = 2*tp*10000 div (2*tp+fp+fn) — so the eval is hash-gradable " +
      "with no float tolerance (the algebraic form of 2PR/(P+R) that " +
      "stays in integers). The confusion counts shuffle once on the " +
      "(gold, predicted) pair; per-class metrics read from the tiny " +
      "matrix. The eval loop every classifier in the curation " +
      "pipeline reports through.",
    (s, d) => {
      val scored = t(s, d, "documents")
        .select((col("lang") === "en").cast(LongType).as("gold_en"),
          (TA.langIdEn(col("text")) === "en").cast(LongType).as("pred_en"))
      val m = scored.agg(
        sum(col("gold_en") * col("pred_en")).cast(LongType).as("tp_en"),
        sum((lit(1L) - col("gold_en")) * col("pred_en")).cast(LongType)
          .as("fp_en"),
        sum(col("gold_en") * (lit(1L) - col("pred_en"))).cast(LongType)
          .as("fn_en"),
        sum((lit(1L) - col("gold_en")) * (lit(1L) - col("pred_en")))
          .cast(LongType).as("tn_en"))
      val en = m.select(lit("en").as("clazz"),
        col("tp_en").as("tp"), col("fp_en").as("fp"), col("fn_en").as("fn"))
      val other = m.select(lit("other").as("clazz"),
        col("tn_en").as("tp"), col("fn_en").as("fp"), col("fp_en").as("fn"))
      en.unionByName(other)
        .select(col("clazz"), col("tp"), col("fp"), col("fn"),
          expr("(tp * 10000) div (tp + fp)").as("prec_bp"),
          expr("(tp * 10000) div (tp + fn)").as("rec_bp"),
          expr("(2 * tp * 10000) div (2 * tp + fp + fn)").as("f1_bp"))
        .transform(graft.engine.Ops.reportSort("clazz"))
    },
    Some("""WITH scored AS (
              SELECT CAST(lang = 'en' AS BIGINT) AS gold_en,
                     CAST(len(list_filter(string_split(text, ' '),
                            x -> x IN ('the','a','of','and','to'))) /
                          len(string_split(text, ' ')) > 0.05 AS BIGINT)
                       AS pred_en
              FROM documents),
            m AS (SELECT
                    CAST(sum(gold_en * pred_en) AS BIGINT) AS tp_en,
                    CAST(sum((1 - gold_en) * pred_en) AS BIGINT) AS fp_en,
                    CAST(sum(gold_en * (1 - pred_en)) AS BIGINT) AS fn_en,
                    CAST(sum((1 - gold_en) * (1 - pred_en)) AS BIGINT)
                      AS tn_en
                  FROM scored),
            cls AS (
              SELECT 'en' AS clazz, tp_en AS tp, fp_en AS fp, fn_en AS fn
              FROM m
              UNION ALL
              SELECT 'other', tn_en, fn_en, fp_en FROM m)
            SELECT clazz, tp, fp, fn,
                   (tp * 10000) // (tp + fp) AS prec_bp,
                   (tp * 10000) // (tp + fn) AS rec_bp,
                   (2 * tp * 10000) // (2 * tp + fp + fn) AS f1_bp
            FROM cls ORDER BY clazz"""))

  // ------------- stat_cohens_kappa: agreement beyond chance

  private val kappa = Q(
    "stat_cohens_kappa",
    "Cohen's kappa between the language-ID heuristic and the gold " +
      "label — agreement corrected for chance, the number that exposes " +
      "a classifier that 'agrees' only because one class dominates. " +
      "Observed and expected agreement are rationals of the same four " +
      "confusion counts (pe's products stay in BIGINT); only the final " +
      "kappa = (po-pe)/(1-pe) division is floating point, computed " +
      "from identical integers on both engines and rounded once. " +
      "Single aggregate pass; the output is one row.",
    (s, d) => {
      val scored = t(s, d, "documents")
        .select((col("lang") === "en").cast(LongType).as("g"),
          (TA.langIdEn(col("text")) === "en").cast(LongType).as("p"))
      scored.agg(
          count(lit(1)).as("n"),
          sum(col("g") * col("p")).cast(LongType).as("tp"),
          sum((lit(1L) - col("g")) * (lit(1L) - col("p"))).cast(LongType)
            .as("tn"),
          sum("g").cast(LongType).as("g1"),
          sum("p").cast(LongType).as("p1"))
        .select(col("n"),
          round((col("tp") + col("tn")).cast("double") / col("n"), 6)
            .as("po"),
          round((col("g1") * col("p1") +
            (col("n") - col("g1")) * (col("n") - col("p1"))).cast("double")
            / (col("n") * col("n")), 6).as("pe"),
          round(((col("tp") + col("tn")).cast("double") / col("n") -
            (col("g1") * col("p1") +
              (col("n") - col("g1")) * (col("n") - col("p1"))).cast("double")
              / (col("n") * col("n"))) /
            (lit(1.0) -
              (col("g1") * col("p1") +
                (col("n") - col("g1")) * (col("n") - col("p1")))
                .cast("double") / (col("n") * col("n"))), 6).as("kappa"))
    },
    Some("""WITH scored AS (
              SELECT CAST(lang = 'en' AS BIGINT) AS g,
                     CAST(len(list_filter(string_split(text, ' '),
                            x -> x IN ('the','a','of','and','to'))) /
                          len(string_split(text, ' ')) > 0.05 AS BIGINT)
                       AS p
              FROM documents),
            m AS (SELECT CAST(count(*) AS BIGINT) AS n,
                         CAST(sum(g * p) AS BIGINT) AS tp,
                         CAST(sum((1 - g) * (1 - p)) AS BIGINT) AS tn,
                         CAST(sum(g) AS BIGINT) AS g1,
                         CAST(sum(p) AS BIGINT) AS p1
                  FROM scored)
            SELECT n,
                   round(CAST(tp + tn AS DOUBLE) / n, 6) AS po,
                   round(CAST(g1 * p1 + (n - g1) * (n - p1) AS DOUBLE)
                         / (n * n), 6) AS pe,
                   round((CAST(tp + tn AS DOUBLE) / n -
                          CAST(g1 * p1 + (n - g1) * (n - p1) AS DOUBLE)
                            / (n * n)) /
                         (1.0 - CAST(g1 * p1 + (n - g1) * (n - p1)
                                 AS DOUBLE) / (n * n)), 6) AS kappa
            FROM m"""))

  val all: Seq[Q] = Seq(targetEncode, prf, kappa)
}
