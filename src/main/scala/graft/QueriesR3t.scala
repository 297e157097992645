package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.LongType

import graft.engine.Engine
import graft.operators.Similarity

/** Round-3 batch 20: hard-negative mining for retrieval training,
  * code-switching (foreign-token) detection, and longest consecutive-day
  * streaks — a gaps-and-islands variant on activity calendars.
  */
object QueriesR3t {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Engine.table(s, dir, name)

  // ------------- sim_hard_negatives: contrastive-training mining

  private val hardNegatives = Q(
    "sim_hard_negatives",
    "Hard-negative mining for contrastive retrieval training: for each " +
      "query vector, the 3 most similar vectors with a DIFFERENT label " +
      "— maximally confusing negatives are exactly what an embedding " +
      "trainer wants in the batch. Same broadcast-query brute-force " +
      "scan as sim_cosine_topk (native codegen'd dot), with the label " +
      "inequality applied BEFORE the per-query top-k window, so " +
      "easy negatives never rank.",
    (s, d) => {
      // integer-exact retrieval (Similarity.quantize discipline): exact
      // integer dot/norms, exact-integer rank key, bit-identical cos
      val emb = t(s, d, "embeddings")
        .select(col("vec_id").as("id"),
          Similarity.quantize(Similarity.toDoubleVec(col("embedding")))
            .as("vec"),
          col("label"))
        .withColumn("nv",
          Similarity.dot(col("vec"), col("vec")).cast(LongType))
      val q = emb.filter(col("id") % 25 === 0)
        .select(col("id").as("q_id"), col("vec").as("qv"),
          col("nv").as("nq"), col("label").as("q_label"))
      val scored = emb.crossJoin(broadcast(q))
        .filter(col("id") =!= col("q_id") &&
          col("label") =!= col("q_label"))
        .select(col("q_id"), col("q_label"), col("id").as("neg"),
          col("label").as("neg_label"),
          Similarity.dot(col("qv"), col("vec")).cast(LongType).as("dot_l"),
          col("nq"), col("nv").as("ni"))
        .withColumn("rk_key",
          Similarity.cosRankKey(col("dot_l"), col("nq"), col("ni")))
        .withColumn("cos",
          Similarity.cosFromInts(col("dot_l"), col("nq"), col("ni")))
      scored.withColumn("rank", row_number().over(
          Window.partitionBy("q_id").orderBy(desc("rk_key"), col("neg"))))
        .filter(col("rank") <= 3)
        .select(col("q_id"), col("q_label"), col("rank"), col("neg"),
          col("neg_label"),
          round(col("cos") * 1e6, 0).cast(LongType).as("cos_micro"))
        .transform(graft.engine.Ops.reportSort("q_id", "rank"))
    },
    Some("""WITH e AS (SELECT vec_id AS id,
                              list_transform(embedding::DOUBLE[],
                                x -> round(x * 1048576)) AS v,
                              label
                       FROM embeddings),
            q AS (SELECT id AS q_id, v AS qv, label AS q_label
                  FROM e WHERE id % 25 = 0),
            s AS (SELECT q_id, q_label, id AS neg,
                         label AS neg_label,
                         CAST(list_dot_product(qv, v) AS BIGINT) AS dot_l,
                         CAST(list_dot_product(qv, qv) AS BIGINT) AS nq,
                         CAST(list_dot_product(v, v) AS BIGINT) AS ni
                  FROM e CROSS JOIN q
                  WHERE id <> q_id AND label <> q_label),
            sk AS (SELECT q_id, q_label, neg, neg_label,
                          (dot_l::HUGEINT * abs(dot_l)::HUGEINT *
                           10000000000::HUGEINT) //
                            (nq::HUGEINT * ni::HUGEINT) AS rk_key,
                          CAST(dot_l AS DOUBLE) /
                            sqrt(CAST(nq AS DOUBLE) * CAST(ni AS DOUBLE))
                            AS cos
                   FROM s),
            r AS (SELECT *, row_number() OVER
                    (PARTITION BY q_id ORDER BY rk_key DESC, neg) AS rank
                  FROM sk)
            SELECT q_id, q_label, rank, neg, neg_label,
                   CAST(round(cos * 1e6, 0) AS BIGINT) AS cos_micro
            FROM r WHERE rank <= 3 ORDER BY q_id, rank"""))

  // ------------- text_code_switch: foreign-token share per doc

  private val codeSwitch = Q(
    "text_code_switch",
    "Code-switching detection: each token's HOME language is where the " +
      "majority of its corpus occurrences live (ties to the smaller " +
      "lang code), and a doc's foreign-token share (basis points, " +
      "integer) measures how much text crosses languages — the " +
      "filter that catches mixed-language crawl pages a per-doc " +
      "language ID misses. Token-lang counts and the majority vote " +
      "shuffle on the token; scoring is one hash join from doc tokens " +
      "to the vote table.",
    (s, d) => {
      val toks = t(s, d, "documents")
        .select(col("doc_id"), col("lang"),
          explode(split(col("text"), " ")).as("tok"))
      val home = toks.groupBy("tok", "lang")
        .agg(count(lit(1)).as("c"))
        .withColumn("rk", row_number().over(
          Window.partitionBy("tok").orderBy(desc("c"), col("lang"))))
        .filter(col("rk") === 1)
        .select(col("tok"), col("lang").as("home_lang"))
      toks.join(home, "tok")
        .groupBy(col("doc_id"), col("lang"))
        .agg(count(lit(1)).as("n_toks"),
          sum((col("lang") =!= col("home_lang")).cast(LongType))
            .as("n_foreign"))
        .select(col("doc_id"), col("lang"), col("n_toks"),
          col("n_foreign"),
          expr("(n_foreign * 10000) div n_toks").as("foreign_bp"))
        .transform(graft.engine.Ops.reportSort("doc_id"))
    },
    Some("""WITH toks AS (SELECT doc_id, lang,
                                 unnest(string_split(text, ' ')) AS tok
                          FROM documents),
            tl AS (SELECT tok, lang, count(*) AS c
                   FROM toks GROUP BY 1, 2),
            home AS (SELECT tok, lang AS home_lang
                     FROM (SELECT *, row_number() OVER
                             (PARTITION BY tok
                              ORDER BY c DESC, lang) AS rk
                           FROM tl)
                     WHERE rk = 1)
            SELECT doc_id, lang,
                   CAST(count(*) AS BIGINT) AS n_toks,
                   CAST(sum(CAST(lang <> home_lang AS BIGINT)) AS BIGINT)
                     AS n_foreign,
                   (CAST(sum(CAST(lang <> home_lang AS BIGINT)) AS BIGINT)
                     * 10000) // CAST(count(*) AS BIGINT) AS foreign_bp
            FROM toks JOIN home USING (tok)
            GROUP BY doc_id, lang ORDER BY doc_id"""))

  // ------------- w20_streaks: longest consecutive-day activity streak

  private val streaks = Q(
    "w20_streaks",
    "Longest consecutive-day activity streak per user — gaps-and-" +
      "islands on the activity CALENDAR (distinct days, so event " +
      "volume folds away first): day minus its per-user row_number is " +
      "constant within a run of consecutive days, one groupBy sizes " +
      "each run, and the top 20 streaks surface. Both windows key on " +
      "the user — one hash shuffle end to end.",
    (s, d) => {
      val days = t(s, d, "events")
        .select(col("user_id"), to_date(col("ts")).as("day"))
        .distinct()
      val marked = days.withColumn("grp",
        expr("date_sub(day, row_number() OVER " +
          "(PARTITION BY user_id ORDER BY day))"))
      marked.groupBy("user_id", "grp")
        .agg(count(lit(1)).as("len"),
          date_format(min("day"), "yyyy-MM-dd").as("from_day"),
          date_format(max("day"), "yyyy-MM-dd").as("to_day"))
        .select("user_id", "from_day", "to_day", "len")
        .orderBy(desc("len"), col("user_id"), col("from_day")).limit(20)
    },
    Some("""WITH days AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
                          FROM events),
            marked AS (
              SELECT user_id, day,
                     day - to_days(CAST(row_number() OVER
                       (PARTITION BY user_id ORDER BY day) AS INT))
                       AS grp
              FROM days)
            SELECT user_id,
                   strftime(min(day), '%Y-%m-%d') AS from_day,
                   strftime(max(day), '%Y-%m-%d') AS to_day,
                   CAST(count(*) AS BIGINT) AS len
            FROM marked GROUP BY user_id, grp
            ORDER BY len DESC, user_id, from_day LIMIT 20"""))

  val all: Seq[Q] = Seq(hardNegatives, codeSwitch, streaks)
}
