package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

import graft.engine.Engine

/** Round-9 batch 1: eval-tier additions.
  */
object QueriesR9a {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Engine.table(s, dir, name)

  // ------------- eval_token_f1: SQuAD-style token F1 + exact match

  private val tokenF1 = Q(
    "eval_token_f1",
    "Token-level F1 + exact match — the SQuAD-style extractive-QA " +
      "metric pair, over a deterministic synthetic prediction (every " +
      "5th doc predicts its reference verbatim, so exact-match is " +
      "exercised; the rest drop the last token and corrupt every 7th — " +
      "the eval_bleu_corpus generator, reused): per-doc token-multiset " +
      "overlap num_same = Σ_tok min(cnt_pred, cnt_gold) via ONE tagged " +
      "unigram explode (the BLEU machinery at n = 1), per-doc " +
      "F1 = 2·num_same/(len_pred + len_gold) — algebraically 2PR/(P+R), " +
      "one IEEE division so both engines agree bit-for-bit — quantized " +
      "to micro units BEFORE the cross-doc mean (BIGINT sum, the " +
      "float-sum discipline), exact match compared on the token ARRAYS " +
      "(order-sensitive, not the multiset), macro-averaged per " +
      "language. Scale shape: both lengths fold out of the same tagged " +
      "aggregation (len_pred = Σ h, len_gold = Σ r — no separate " +
      "length pass, no reuse materialization), two keyed exchanges " +
      "plus the per-language rollup; nothing global, nothing per-doc " +
      "past the second aggregation.",
    (s, d) => {
      val toks = t(s, d, "documents")
        .select(col("doc_id"), col("lang"), split(col("text"), " ").as("ref"))
        .filter(size(col("ref")) >= 5)
        .withColumn("hyp", when(col("doc_id") % 5 === 0, col("ref"))
          .otherwise(expr("transform(slice(ref, 1, size(ref) - 1), " +
            "(t, i) -> CASE WHEN (i + 1) % 7 = 0 THEN 'xxx' ELSE t END)")))
        .withColumn("em",
          when(col("hyp") === col("ref"), 1L).otherwise(0L))
      // one tagged explode carries both sides; lang/em ride the grouping
      // key (constant per doc, so they add no cardinality)
      val tags = toks.select(col("doc_id"), col("lang"), col("em"),
        explode(expr(
          """concat(transform(hyp, t -> named_struct('side', 'h', 'tok', t)),
                    transform(ref, t -> named_struct('side', 'r', 'tok', t)))"""))
          .as("x"))
        .select(col("doc_id"), col("lang"), col("em"),
          col("x.side").as("side"), col("x.tok").as("tok"))
      val perDoc = tags.groupBy("doc_id", "lang", "em", "tok")
        .agg(sum(when(col("side") === "h", 1L).otherwise(0L)).as("h"),
          sum(when(col("side") === "r", 1L).otherwise(0L)).as("r"))
        .groupBy("doc_id", "lang", "em")
        .agg(sum(least(col("h"), col("r"))).as("ns"),
          sum(col("h")).as("hl"), sum(col("r")).as("rl"))
      val f1 = when(col("ns") === 0, lit(0.0))
        .otherwise(lit(2.0) * col("ns").cast(DoubleType) /
          (col("hl") + col("rl")).cast(DoubleType))
      perDoc
        .select(col("lang"), col("em"),
          round(f1 * 1e6, 0).cast(LongType).as("f1_micro"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          round(sum(col("em")).cast(DoubleType) / count(lit(1)), 6)
            .as("em_rate"),
          round(sum(col("f1_micro")).cast(DoubleType) / count(lit(1)) / 1e6, 6)
            .as("mean_f1"))
        .orderBy("lang")
    },
    Some("""WITH toks AS (
              SELECT doc_id, lang, string_split(text, ' ') AS ref,
                     CASE WHEN doc_id % 5 = 0 THEN string_split(text, ' ')
                     ELSE list_transform(
                       range(1, len(string_split(text, ' '))),
                       i -> CASE WHEN i % 7 = 0 THEN 'xxx'
                            ELSE string_split(text, ' ')[i] END)
                     END AS hyp
              FROM documents
              WHERE len(string_split(text, ' ')) >= 5),
            tagged AS (
              SELECT doc_id, lang,
                     CASE WHEN hyp = ref THEN 1 ELSE 0 END AS em,
                     'h' AS side, unnest(hyp) AS tok
              FROM toks
              UNION ALL
              SELECT doc_id, lang,
                     CASE WHEN hyp = ref THEN 1 ELSE 0 END AS em,
                     'r' AS side, unnest(ref) AS tok
              FROM toks),
            cnt AS (
              SELECT doc_id, lang, em, tok,
                     sum(CASE WHEN side = 'h' THEN 1 ELSE 0 END) AS h,
                     sum(CASE WHEN side = 'r' THEN 1 ELSE 0 END) AS r
              FROM tagged GROUP BY 1, 2, 3, 4),
            per_doc AS (
              SELECT doc_id, lang, em,
                     CAST(sum(least(h, r)) AS BIGINT) AS ns,
                     CAST(sum(h) AS BIGINT) AS hl,
                     CAST(sum(r) AS BIGINT) AS rl
              FROM cnt GROUP BY 1, 2, 3),
            scored AS (
              SELECT lang, em,
                     CAST(round(CASE WHEN ns = 0 THEN CAST(0.0 AS DOUBLE)
                       ELSE CAST(2.0 AS DOUBLE) * CAST(ns AS DOUBLE) /
                            CAST(hl + rl AS DOUBLE) END * 1e6, 0) AS BIGINT)
                       AS f1_micro
              FROM per_doc)
            SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
                   round(CAST(sum(em) AS DOUBLE) / count(*), 6) AS em_rate,
                   round(CAST(sum(f1_micro) AS DOUBLE) / count(*) / 1e6, 6)
                     AS mean_f1
            FROM scored GROUP BY lang ORDER BY lang"""))

  val all: Seq[Q] = Seq(tokenF1)
}
