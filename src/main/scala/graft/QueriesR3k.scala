package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.{DoubleType, LongType}

import graft.engine.Engine
import graft.operators.Similarity

/** Round-3 batch 11: a chi-squared independence test over a contingency
  * table, a trained-and-applied multinomial naive-Bayes language
  * classifier, and a kNN majority-vote labeler on embeddings — the
  * statistics/ML-evaluation tier, all from relational plans.
  */
object QueriesR3k {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Engine.table(s, dir, name)

  // ------------- stat_chi2_indep: chi-squared test of independence

  private val chi2 = Q(
    "stat_chi2_indep",
    "Chi-squared test of independence on the event_type × value-band " +
      "contingency table (band = value >= 50): observed cell counts, " +
      "expected counts e = rowTot·colTot/n, and per-cell contribution " +
      "(o−e)²/e — the A/B-test significance workhorse. One groupBy " +
      "builds the cells; marginals are two tiny re-aggregations joined " +
      "back (the n scalar rides a 1-row broadcast crossJoin, never a " +
      "driver collect). Expected/contribution are micro-rounded double " +
      "trees over exact BIGINT counts — bit-identical on both engines " +
      "(IEEE +,-,*,/ are correctly rounded).",
    (s, d) => {
      val cells = t(s, d, "events")
        .select(col("event_type").as("etype"),
          (col("value") >= 50.0).cast("int").as("band"))
        .groupBy("etype", "band").agg(count(lit(1)).as("obs"))
      val rt = cells.groupBy("etype").agg(sum("obs").as("rt"))
      val ct = cells.groupBy("band").agg(sum("obs").as("ct"))
      val n = cells.agg(sum("obs").as("n"))
      def dd(c: String) = col(c).cast(DoubleType)
      val e = dd("rt") * dd("ct") / dd("n")
      cells.join(rt, "etype").join(ct, "band").crossJoin(broadcast(n))
        .select(col("etype"), col("band"), col("obs"),
          round(e * 1e6, 0).cast(LongType).as("exp_micro"),
          round((dd("obs") - e) * (dd("obs") - e) / e * 1e6, 0)
            .cast(LongType).as("contrib_micro"))
        .orderBy("etype", "band")
    },
    Some("""WITH cells AS (
              SELECT event_type AS etype,
                     CAST(value >= 50 AS INT) AS band,
                     CAST(count(*) AS BIGINT) AS obs
              FROM events GROUP BY 1, 2),
            rt AS (SELECT etype, CAST(sum(obs) AS BIGINT) AS rt
                   FROM cells GROUP BY 1),
            ct AS (SELECT band, CAST(sum(obs) AS BIGINT) AS ct
                   FROM cells GROUP BY 1),
            n AS (SELECT CAST(sum(obs) AS BIGINT) AS n FROM cells)
            SELECT etype, band, obs,
                   CAST(round(CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE)
                          / CAST(n AS DOUBLE) * 1e6, 0) AS BIGINT)
                     AS exp_micro,
                   CAST(round((CAST(obs AS DOUBLE)
                            - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE)
                              / CAST(n AS DOUBLE))
                          * (CAST(obs AS DOUBLE)
                            - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE)
                              / CAST(n AS DOUBLE))
                          / (CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE)
                              / CAST(n AS DOUBLE)) * 1e6, 0) AS BIGINT)
                     AS contrib_micro
            FROM cells
            JOIN rt USING (etype) JOIN ct USING (band) CROSS JOIN n
            ORDER BY etype, band"""))

  // ------------- ml_naive_bayes_lang: train + classify + confusion

  private val naiveBayes = Q(
    "ml_naive_bayes_lang",
    "Multinomial naive Bayes TRAINED AND APPLIED in one relational plan: " +
      "per-language token counts with add-one smoothing become the " +
      "model (log2 p(tok|lang) rounded ONCE to micro-bits, so per-doc " +
      "accumulation is exact integer arithmetic), log-priors come from " +
      "doc counts, every doc scores all 5 languages via doc-token " +
      "counts × a hash join to the model (unseen tokens fall back to " +
      "the per-language smoothing floor), argmax by windowed " +
      "row_number, and the output is the actual×predicted CONFUSION " +
      "MATRIX — the self-training language-ID evaluation a curation " +
      "pipeline runs. Model and scoring both shard by token at scale; " +
      "the 5-row language list is a broadcast multiplier.",
    (s, d) => {
      // ONE explode pass: per-doc token counts carry lang (functionally
      // dependent on doc_id, so the extra key is free), and the per-lang
      // model counts aggregate FROM the cached per-doc frame — the raw
      // 6M-row token stream is never cached or re-scanned (it was the
      // query's dominant cost: a second explode pass + a columnar cache
      // of raw token strings)
      val tokCnt = t(s, d, "documents")
        .select(col("doc_id"), col("lang"),
          explode(split(col("text"), " ")).as("tok"))
        .groupBy("doc_id", "lang", "tok")
        .agg(count(lit(1)).as("cnt"))
        .cache()
      val tc = tokCnt.groupBy(col("lang").as("l"), col("tok"))
        .agg(sum("cnt").as("c"))
      val ctot = tc.groupBy("l").agg(sum("c").as("ctok"))
      val vocab = tc.agg(countDistinct("tok").as("v"))
      // ctok+v is needed by BOTH the model and the unseen floor — build
      // the 5-row joined frame once and cache it, so vocab/ctot
      // materialize one broadcast job instead of two apiece (each tiny
      // broadcast-agg subquery on a lazy lineage is its own scheduler
      // job locally; fusing them is pure stage-count savings)
      val ctotv = ctot.crossJoin(broadcast(vocab)).cache()
      val model = tc.join(ctotv, "l")
        .select(col("l"), col("tok"),
          round(log2((col("c") + 1).cast(DoubleType) /
            (col("ctok") + col("v")).cast(DoubleType)) * 1e6, 0)
            .cast(LongType).as("logp_micro"))
      val unseen = ctotv
        .select(col("l"),
          round(log2(lit(1.0) /
            (col("ctok") + col("v")).cast(DoubleType)) * 1e6, 0)
            .cast(LongType).as("floor_micro"))
      // the total-docs divisor rides a whole-frame window over the 5-row
      // per-language rollup (bounded frame, not a scale hazard) — one
      // fewer scan + broadcast than a separate count+crossJoin
      val docsPerLang = t(s, d, "documents")
        .groupBy(col("lang").as("l")).agg(count(lit(1)).as("dl"))
      val prior = docsPerLang
        .withColumn("dt", sum("dl").over(Window.partitionBy()))
        .select(col("l"),
          round(log2(col("dl").cast(DoubleType) /
            col("dt").cast(DoubleType)) * 1e6, 0)
            .cast(LongType).as("prior_micro"))
      // ONE 5-row per-language constants frame (language list ∪ smoothing
      // floor ∪ log-prior) = ONE broadcast build — as three separate
      // broadcasts (langs/unseen/prior) each tiny lazy lineage was its
      // own scheduler job; prior_micro rides the doc-score groupBy key
      // (constant per l, so the grouping is unchanged) instead of a
      // fourth post-agg broadcast join
      val langConst = unseen.join(prior, "l")
      val scored = tokCnt.crossJoin(broadcast(langConst))
        .join(model, Seq("l", "tok"), "left")
        .select(col("doc_id"), col("l"), col("prior_micro"),
          (col("cnt") * coalesce(col("logp_micro"), col("floor_micro")))
            .as("term"))
        .groupBy("doc_id", "l", "prior_micro")
        .agg(sum("term").as("tok_score"))
        .select(col("doc_id"), col("l"),
          (col("tok_score") + col("prior_micro")).as("score"))
      val pred = scored.withColumn("rn", row_number().over(
          Window.partitionBy("doc_id")
            .orderBy(desc("score"), col("l"))))
        .filter(col("rn") === 1)
        .select(col("doc_id"), col("l").as("predicted"))
      t(s, d, "documents").select(col("doc_id"), col("lang").as("actual"))
        .join(pred, "doc_id")
        .groupBy("actual", "predicted").agg(count(lit(1)).as("n_docs"))
        .orderBy("actual", "predicted")
    },
    Some("""WITH toks AS (SELECT doc_id, lang,
                                 unnest(string_split(text, ' ')) AS tok
                          FROM documents),
            tok_cnt AS (SELECT doc_id, tok, count(*) AS cnt
                        FROM toks GROUP BY 1, 2),
            tc AS (SELECT lang AS l, tok, count(*) AS c
                   FROM toks GROUP BY 1, 2),
            ctot AS (SELECT l, CAST(sum(c) AS BIGINT) AS ctok
                     FROM tc GROUP BY 1),
            vocab AS (SELECT count(DISTINCT tok) AS v FROM toks),
            model AS (SELECT l, tok,
                             CAST(round(log2(CAST(c + 1 AS DOUBLE) /
                                    CAST(ctok + v AS DOUBLE)) * 1e6, 0)
                               AS BIGINT) AS logp_micro
                      FROM tc JOIN ctot USING (l) CROSS JOIN vocab),
            unseen AS (SELECT l,
                              CAST(round(log2(1.0 /
                                     CAST(ctok + v AS DOUBLE)) * 1e6, 0)
                                AS BIGINT) AS floor_micro
                       FROM ctot CROSS JOIN vocab),
            dpl AS (SELECT lang AS l, count(*) AS dl
                    FROM documents GROUP BY 1),
            dt AS (SELECT count(*) AS dt FROM documents),
            prior AS (SELECT l,
                             CAST(round(log2(CAST(dl AS DOUBLE) /
                                    CAST(dt AS DOUBLE)) * 1e6, 0)
                               AS BIGINT) AS prior_micro
                      FROM dpl CROSS JOIN dt),
            scored AS (
              SELECT doc_id, l,
                     CAST(sum(cnt * coalesce(logp_micro, floor_micro))
                       AS BIGINT) AS tok_score
              FROM tok_cnt
              CROSS JOIN (SELECT l FROM dpl) langs
              LEFT JOIN model USING (l, tok)
              JOIN unseen USING (l)
              GROUP BY 1, 2),
            final AS (SELECT doc_id, l,
                             tok_score + prior_micro AS score
                      FROM scored JOIN prior USING (l)),
            pred AS (SELECT doc_id, l AS predicted
                     FROM (SELECT doc_id, l, row_number() OVER
                             (PARTITION BY doc_id
                              ORDER BY score DESC, l) AS rn
                           FROM final)
                     WHERE rn = 1)
            SELECT d.lang AS actual, predicted,
                   CAST(count(*) AS BIGINT) AS n_docs
            FROM documents d JOIN pred USING (doc_id)
            GROUP BY 1, 2 ORDER BY actual, predicted"""))

  // ------------- sim_knn_label: kNN majority-vote classification

  private val knnLabel = Q(
    "sim_knn_label",
    "kNN majority-vote labeling on embeddings: every 10th vector is a " +
      "query, its 5 nearest neighbors (brute-force cosine via the " +
      "native codegen'd dot Expression, self excluded) vote with their " +
      "labels, majority wins (ties → smaller label), and the output " +
      "compares prediction to the vector's true label — the label-" +
      "propagation / weak-supervision primitive. Same broadcast-query " +
      "map-only scan shape as sim_cosine_topk; the vote is a per-query " +
      "groupBy over k rows.",
    (s, d) => {
      val emb = t(s, d, "embeddings")
        .select(col("vec_id").as("id"),
          Similarity.toDoubleVec(col("embedding")).as("vec"),
          col("label"))
      val q = emb.filter(col("id") % 10 === 0)
        .select(col("id").as("q_id"), col("vec").as("qv"))
      val nn = Similarity.bruteForceTopK(emb.select("id", "vec"), q, 5)
      val votes = nn
        .join(emb.select(col("id").as("cand"), col("label").as("n_label")),
          "cand")
        .groupBy("q_id", "n_label").agg(count(lit(1)).as("votes"))
      val pred = votes.withColumn("rn", row_number().over(
          Window.partitionBy("q_id")
            .orderBy(desc("votes"), col("n_label"))))
        .filter(col("rn") === 1)
        .select(col("q_id"), col("n_label").as("predicted"),
          col("votes"))
      pred
        .join(emb.select(col("id").as("q_id"),
          col("label").as("true_label")), "q_id")
        .select(col("q_id"), col("true_label"), col("predicted"),
          col("votes"),
          (col("predicted") === col("true_label")).cast("int")
            .as("correct"))
        .orderBy("q_id")
    },
    Some("""WITH e AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v,
                              label
                       FROM embeddings),
            q AS (SELECT id AS q_id, qv FROM
                    (SELECT id, list_transform(v, x -> round(x * 1048576))
                       AS qv FROM e WHERE id % 10 = 0)),
            s AS (SELECT q_id, id AS cand, label AS n_label,
                         CAST(list_dot_product(qv, qi) AS BIGINT) AS dot_l,
                         CAST(list_dot_product(qv, qv) AS BIGINT) AS nq,
                         CAST(list_dot_product(qi, qi) AS BIGINT) AS ni
                  FROM (SELECT id, label,
                          list_transform(v, x -> round(x * 1048576)) AS qi
                        FROM e) CROSS JOIN q WHERE id <> q_id),
            r AS (SELECT *, row_number() OVER
                    (PARTITION BY q_id ORDER BY
                       (dot_l::HUGEINT * abs(dot_l)::HUGEINT *
                        10000000000::HUGEINT) //
                         (nq::HUGEINT * ni::HUGEINT) DESC, cand) AS rank
                  FROM s),
            nn AS (SELECT q_id, n_label FROM r WHERE rank <= 5),
            votes AS (SELECT q_id, n_label,
                             CAST(count(*) AS BIGINT) AS votes
                      FROM nn GROUP BY 1, 2),
            pred AS (SELECT q_id, n_label AS predicted, votes
                     FROM (SELECT *, row_number() OVER
                             (PARTITION BY q_id
                              ORDER BY votes DESC, n_label) AS rn
                           FROM votes)
                     WHERE rn = 1)
            SELECT q_id, e.label AS true_label, predicted, votes,
                   CAST(predicted = e.label AS INT) AS correct
            FROM pred JOIN e ON pred.q_id = e.id
            ORDER BY q_id"""))

  val all: Seq[Q] = Seq(chi2, naiveBayes, knnLabel)
}
