package graft

import graft.engine.Ck.Ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

import graft.engine.Engine
import graft.operators.Dedup

/** Round-3 batch 9: bigram-LM perplexity scoring (the KenLM-style
  * quality filter, conditioning on the previous token), a join-key skew
  * diagnostic (what you run BEFORE reaching for the salted join), and a
  * dataset-card summary report.
  */
object QueriesR3i {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Engine.table(s, dir, name)

  /** Adjacent-token pairs per doc — the same extraction as
    * text_textrank, fresh lineage per call. */
  private def docPairs(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents")
      // contains(" ") ⇔ size(split) >= 2; raw-text predicate avoids the
      // pushed-down filter re-running the split (round-13 TokProbe)
      .filter(col("text").contains(" "))
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(toks) - 2), " +
          "i -> struct(toks[i] AS a, toks[i+1] AS b))")).as("p"))
      .select(col("doc_id"), col("p.a").as("a"), col("p.b").as("b"))

  // ---------------- text_bigram_lm: conditional-LM perplexity filter

  private val bigramLm = Q(
    "text_bigram_lm",
    "Bigram language-model scoring — the step up from unigram surprisal " +
      "that perplexity-based curation actually uses (KenLM-style, " +
      "conditioning each token on its predecessor): corpus bigram and " +
      "unigram counts form the model, add-one smoothing over the " +
      "vocabulary V gives p(b|a) = (c(a,b)+1)/(c(a)+V), and each " +
      "model entry's -log2 p is rounded ONCE to BIGINT micro-bits, so " +
      "per-doc sums are exact integers (accumulation-order-proof, the " +
      "repo's standard float bridge). Two token-stream groupBys build " +
      "the model, scoring is one hash join from doc pairs to model " +
      "entries — every piece linear, the model itself shardable by " +
      "bigram key at 100 TB. avg_bits = integer div of the sum.",
    (s, d) => {
      // the bigram stream feeds THREE consumers (bigram counts, unigram
      // counts, the scoring join) — lazy-checkpointed once so the
      // tokenize+explode pipeline runs one time instead of three, and
      // the 1-row vocab rides a cartesian instead of a broadcast build
      // job (round 9: 5 → 3 jobs)
      val pairs = docPairs(s, d).ckpt(false)
      val big = pairs.groupBy("a", "b")
        .agg(count(lit(1)).as("cab"))
      val uni = pairs.groupBy(col("a"))
        .agg(count(lit(1)).as("ca"))
      val vocab = t(s, d, "documents")
        .select(explode(split(col("text"), " ")).as("tok"))
        .agg(countDistinct("tok").as("v"))
      val model = big.join(uni, "a")
        .hint("shuffle_replicate_nl").crossJoin(vocab)
        .select(col("a"), col("b"),
          round(-log2((col("cab") + 1).cast(DoubleType) /
            (col("ca") + col("v")).cast(DoubleType)) * 1e6, 0)
            .cast(LongType).as("nll_micro"))
      pairs.join(model, Seq("a", "b"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_pairs"),
          sum("nll_micro").as("nll_sum_micro"))
        .select(col("doc_id"), col("n_pairs"), col("nll_sum_micro"),
          expr("nll_sum_micro div n_pairs").as("avg_bits_micro"))
        .transform(graft.engine.Ops.reportSort("doc_id"))
    },
    Some("""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS l
                          FROM documents),
            pairs AS (SELECT doc_id, l[i] AS a, l[i+1] AS b
                      FROM (SELECT doc_id, l,
                                   unnest(range(1, len(l))) AS i
                            FROM toks WHERE len(l) >= 2)),
            big AS (SELECT a, b, count(*) AS cab FROM pairs GROUP BY 1, 2),
            uni AS (SELECT a, count(*) AS ca FROM pairs GROUP BY 1),
            vocab AS (SELECT count(DISTINCT tok) AS v
                      FROM (SELECT unnest(string_split(text, ' ')) AS tok
                            FROM documents)),
            model AS (SELECT a, b,
                             CAST(round(-log2(CAST(cab + 1 AS DOUBLE) /
                                              CAST(ca + v AS DOUBLE))
                                        * 1000000, 0) AS BIGINT)
                               AS nll_micro
                      FROM big JOIN uni USING (a) CROSS JOIN vocab)
            SELECT doc_id, count(*) AS n_pairs,
                   CAST(sum(nll_micro) AS BIGINT) AS nll_sum_micro,
                   CAST(sum(nll_micro) AS BIGINT) // count(*)
                     AS avg_bits_micro
            FROM pairs JOIN model USING (a, b)
            GROUP BY doc_id ORDER BY doc_id"""))

  // ---------------- dq_skew_stats: join-key skew diagnostic

  private val skewStats = Q(
    "dq_skew_stats",
    "Join-key skew diagnostic — the measurement that decides whether a " +
      "key needs the salted join (j13) BEFORE the job ever stalls: " +
      "group sizes for lineitem.l_suppkey, the 10 heaviest keys with " +
      "their share in basis points (integer: cnt·10000 div total), and " +
      "each key's multiple of the mean group size (×100). One groupBy " +
      "over the fact table + a TakeOrdered top-10; totals ride a 1-row " +
      "broadcast crossJoin, never a driver scalar.",
    (s, d) => {
      val g = t(s, d, "lineitem").groupBy(col("l_suppkey"))
        .agg(count(lit(1)).as("cnt"))
      val tot = g.agg(sum("cnt").as("total"),
        count(lit(1)).as("n_keys"))
      g.crossJoin(broadcast(tot))
        .orderBy(desc("cnt"), col("l_suppkey")).limit(10)
        .select(col("l_suppkey"), col("cnt"),
          expr("(cnt * 10000) div total").as("share_bp"),
          expr("(cnt * n_keys * 100) div total").as("x_mean_x100"))
        .withColumn("rank", row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy(desc("cnt"), col("l_suppkey"))))
        .select("rank", "l_suppkey", "cnt", "share_bp", "x_mean_x100")
        .transform(graft.engine.Ops.reportSort("rank"))
    },
    Some("""WITH g AS (SELECT l_suppkey, count(*) AS cnt
                       FROM lineitem GROUP BY 1),
            tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total,
                           count(*) AS n_keys
                    FROM g),
            top AS (SELECT l_suppkey, cnt, total, n_keys
                    FROM g CROSS JOIN tot
                    ORDER BY cnt DESC, l_suppkey LIMIT 10)
            SELECT row_number() OVER (ORDER BY cnt DESC, l_suppkey)
                     AS rank,
                   l_suppkey, cnt,
                   (cnt * 10000) // total AS share_bp,
                   (cnt * n_keys * 100) // total AS x_mean_x100
            FROM top ORDER BY rank"""))

  // ---------------- curate_dataset_card: corpus summary report

  private val datasetCard = Q(
    "curate_dataset_card",
    "Dataset-card summary — the one-stop corpus report a training-data " +
      "release ships with: doc/token/char volumes, vocabulary and " +
      "source/language breadth, exact-duplicate text count, and length " +
      "extremes, emitted as (metric, value) rows. ONE pass over the " +
      "corpus computes every per-doc quantity (token counts come from " +
      "the materialized split — no re-tokenization per metric), a " +
      "second tiny aggregate folds them; distincts are separate " +
      "shuffles by nature but each moves only its key space.",
    (s, d) => {
      val docs = t(s, d, "documents")
        .select(col("doc_id"), col("text"), col("lang"), col("source"),
          size(split(col("text"), " ")).cast(LongType).as("n_toks"),
          length(col("text")).cast(LongType).as("n_chars"))
      val base = docs.agg(
        count(lit(1)).as("n_docs"),
        sum("n_toks").as("n_tokens"),
        sum("n_chars").as("n_chars"),
        countDistinct("lang").as("n_langs"),
        countDistinct("source").as("n_sources"),
        countDistinct("text").as("n_distinct_texts"),
        max("n_toks").as("max_doc_tokens"),
        min("n_toks").as("min_doc_tokens"))
      val vocab = docs.select(explode(split(col("text"), " ")).as("tok"))
        .agg(countDistinct("tok").as("vocab_size"))
      base.crossJoin(vocab)
        .select(explode(array(
          struct(lit("n_docs").as("metric"), col("n_docs").as("value")),
          struct(lit("n_tokens").as("metric"), col("n_tokens").as("value")),
          struct(lit("n_chars").as("metric"), col("n_chars").as("value")),
          struct(lit("n_langs").as("metric"), col("n_langs").as("value")),
          struct(lit("n_sources").as("metric"),
            col("n_sources").as("value")),
          struct(lit("n_distinct_texts").as("metric"),
            col("n_distinct_texts").as("value")),
          struct(lit("max_doc_tokens").as("metric"),
            col("max_doc_tokens").as("value")),
          struct(lit("min_doc_tokens").as("metric"),
            col("min_doc_tokens").as("value")),
          struct(lit("vocab_size").as("metric"),
            col("vocab_size").as("value")))).as("r"))
        .select(col("r.metric").as("metric"), col("r.value").as("value"))
        .transform(graft.engine.Ops.reportSort("metric"))
    },
    Some("""WITH docs AS (
              SELECT doc_id, text, lang, source,
                     CAST(len(string_split(text, ' ')) AS BIGINT)
                       AS n_toks,
                     CAST(length(text) AS BIGINT) AS n_chars
              FROM documents),
            base AS (SELECT
              CAST(count(*) AS BIGINT) AS n_docs,
              CAST(sum(n_toks) AS BIGINT) AS n_tokens,
              CAST(sum(n_chars) AS BIGINT) AS n_chars,
              CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
              CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
              CAST(count(DISTINCT text) AS BIGINT) AS n_distinct_texts,
              CAST(max(n_toks) AS BIGINT) AS max_doc_tokens,
              CAST(min(n_toks) AS BIGINT) AS min_doc_tokens
              FROM docs),
            vocab AS (SELECT CAST(count(DISTINCT tok) AS BIGINT)
                               AS vocab_size
                      FROM (SELECT unnest(string_split(text, ' ')) AS tok
                            FROM documents)),
            rows_ AS (
              SELECT 'n_docs' AS metric, n_docs AS value FROM base
              UNION ALL SELECT 'n_tokens', n_tokens FROM base
              UNION ALL SELECT 'n_chars', n_chars FROM base
              UNION ALL SELECT 'n_langs', n_langs FROM base
              UNION ALL SELECT 'n_sources', n_sources FROM base
              UNION ALL SELECT 'n_distinct_texts', n_distinct_texts
                FROM base
              UNION ALL SELECT 'max_doc_tokens', max_doc_tokens FROM base
              UNION ALL SELECT 'min_doc_tokens', min_doc_tokens FROM base
              UNION ALL SELECT 'vocab_size', vocab_size FROM vocab)
            SELECT metric, value FROM rows_ ORDER BY metric"""))

  val all: Seq[Q] = Seq(bigramLm, skewStats, datasetCard)
}
