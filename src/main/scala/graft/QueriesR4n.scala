package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.{DoubleType, LongType}

import graft.engine.Engine
import graft.operators.Similarity

/** Round-4 batch 1: RAG context packing, asymmetric containment dedup,
  * t-closeness privacy audit, Kendall tau-b, tokenizer fertility.
  */
object QueriesR4n {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Engine.table(s, dir, name)

  // ------------- rag_context_pack: retrieval + token-budget packing

  private val ragPack = Q(
    "rag_context_pack",
    "RAG context assembly — the step between retrieval and the prompt: " +
      "per query vector, brute-force cosine top-10 over the embedding " +
      "corpus (the graded baseline; sim_ivf_topk/sim_lsh_buckets are " +
      "the scale path for candidate gen), join each hit to its document " +
      "for a whitespace token count, then GREEDY-PACK hits in rank " +
      "order under a 192-token context budget — a running-sum window " +
      "per query keeps the prefix whose cumulative tokens fit. " +
      "Retrieval is a broadcast map-only scan; packing touches only " +
      "10 rows per query, so budget logic never rescans the corpus.",
    (s, d) => {
      val emb = t(s, d, "embeddings")
        .select(col("vec_id").as("id"),
          Similarity.toDoubleVec(col("embedding")).as("vec"))
      val q = emb.filter(col("id") < 8)
        .select(col("id").as("q_id"), col("vec").as("qv"))
      val hits = Similarity.bruteForceTopK(emb, q, 10)
        .select("q_id", "rank", "cand", "cos")
      val toks = t(s, d, "documents")
        .select(col("doc_id").as("cand"),
          size(split(col("text"), " ")).cast(LongType).as("n_tokens"))
      val w = Window.partitionBy("q_id").orderBy("rank")
      // integer-exact retrieval (rounds 4-5 driver-red root fix): the
      // bruteForceTopK path quantizes components to round(x·2^20), ranks
      // by an exact integer key (Similarity.cosRankKey — no double-typed
      // comparison), and its `cos` is bit-identical across engines
      // (identical integer dot/norms + correctly-rounded IEEE ops), so
      // the micro rounding below can never straddle a boundary
      hits.join(toks, "cand")
        .withColumn("cum_tokens", sum("n_tokens").over(w))
        .filter(col("cum_tokens") <= 192L)
        .select(col("q_id"), col("rank").cast(LongType).as("rank"),
          col("cand"),
          round(col("cos") * 1e6, 0).cast(LongType).as("cos_micro"),
          col("n_tokens"), col("cum_tokens"))
        .transform(graft.engine.Ops.reportSort("q_id", "rank"))
    },
    Some("""WITH e AS (SELECT vec_id AS id,
                              list_transform(embedding::DOUBLE[],
                                x -> round(x * 1048576)) AS v
                       FROM embeddings),
            q AS (SELECT id AS q_id, v AS qv FROM e WHERE id < 8),
            sc AS (SELECT q_id, id AS cand,
                          CAST(list_dot_product(qv, v) AS BIGINT) AS dot_l,
                          CAST(list_dot_product(qv, qv) AS BIGINT) AS nq,
                          CAST(list_dot_product(v, v) AS BIGINT) AS ni
                   FROM e CROSS JOIN q WHERE id <> q_id),
            sk AS (SELECT q_id, cand,
                          (dot_l::HUGEINT * abs(dot_l)::HUGEINT *
                           10000000000::HUGEINT) //
                            (nq::HUGEINT * ni::HUGEINT) AS rk_key,
                          CAST(dot_l AS DOUBLE) /
                            sqrt(CAST(nq AS DOUBLE) * CAST(ni AS DOUBLE))
                            AS cos
                   FROM sc),
            r AS (SELECT *, row_number() OVER
                    (PARTITION BY q_id ORDER BY rk_key DESC, cand) AS rank
                  FROM sk),
            hits AS (SELECT q_id, rank, cand, cos FROM r WHERE rank <= 10),
            toks AS (SELECT doc_id AS cand,
                            CAST(len(string_split(text, ' ')) AS BIGINT)
                              AS n_tokens
                     FROM documents),
            packed AS (
              SELECT q_id, CAST(rank AS BIGINT) AS rank, cand, cos,
                     n_tokens,
                     CAST(sum(n_tokens) OVER
                            (PARTITION BY q_id ORDER BY rank)
                          AS BIGINT) AS cum_tokens
              FROM hits JOIN toks USING (cand))
            SELECT q_id, rank, cand,
                   CAST(round(cos * 1e6, 0) AS BIGINT) AS cos_micro,
                   n_tokens, cum_tokens
            FROM packed WHERE cum_tokens <= 192
            ORDER BY q_id, rank"""))

  // ------------- dedup_containment: asymmetric n-gram containment

  private val containment = Q(
    "dedup_containment",
    "Asymmetric shingle containment |A∩B|/|A| — catches near-SUPERSETS " +
      "(a doc quoting most of another) that symmetric Jaccard dilutes " +
      "below threshold. Word 3-gram shingles, distinct per doc; the " +
      "pair space comes from an inverted shingle index with a document-" +
      "frequency cap (df ≤ 20) so a boilerplate shingle never " +
      "enumerates n² pairs — the cap trims the same shingles from " +
      "numerator and denominator on BOTH engines, the standard df-cap " +
      "approximation. One shingle-keyed self-join bounded at " +
      "df·(df−1)/2 per shingle, one pair groupBy, top 20.",
    (s, d) => {
      // shingles ship as xxhash64 LONGS, not strings: every downstream
      // exchange (distinct, df rollup, index join) moves 8-byte keys
      // instead of ~30-byte trigrams — the standard hashed-shingle trade
      // (the MinHash family here does the same); the output carries only
      // doc ids and counts, so the oracle keeps exact string shingles
      // Round 13 (optimization): no size(w) >= 3 pre-filter — it pushed
      // below the split projection and ran the split twice per row
      // (the TokProbe finding), and NgramHashes is total (short docs →
      // empty array, dropped by explode). The native kernel emits
      // xxhash64(concat_ws(' ', w[i..i+2])) at Spark's seed in one
      // compiled loop — identical longs to the former interpreted
      // transform + concat_ws + top-level xxhash64 chain.
      val sh = t(s, d, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("w"))
        .select(col("doc_id"),
          explode(graft.plans.NgramHashes(col("w"), 3)).as("sh"))
        .distinct()
      val rare = sh.groupBy("sh").agg(count(lit(1)).as("df"))
        .filter(col("df") <= 20)
      // rsh feeds two branches (sizes, pair gen): cache it so the shingle
      // explode + df pipeline runs once, not twice (the harness frees
      // per-query cache entries after the run)
      val rsh = sh.join(rare, "sh").cache()
      val sizes = rsh.groupBy("doc_id").agg(count(lit(1)).as("sz"))
      // pair space: collect each rare shingle's (≤20 by the df cap, so
      // bounded state at any corpus size) sorted doc list in ONE
      // exchange-free groupBy (rsh is already partitioned by sh from the
      // join) and enumerate a<b pairs with the chained-generator shape of
      // Graph.coPurchaseFromEdges — replaces the shingle-keyed self-join,
      // which shuffled the frame again and emitted both pair mirrors
      val shared = rsh.filter(col("df") >= 2)
        .groupBy("sh").agg(sort_array(collect_list(col("doc_id"))).as("ds"))
        .select(col("ds"), posexplode(col("ds")).as(Seq("i", "a")))
        .select(col("a"),
          explode(slice(col("ds"), col("i") + 2, size(col("ds")))).as("b"))
        .groupBy("a", "b")
        .agg(count(lit(1)).as("shared"))
      shared
        .join(sizes.withColumnRenamed("doc_id", "a")
          .withColumnRenamed("sz", "size_a"), "a")
        .join(sizes.withColumnRenamed("doc_id", "b")
          .withColumnRenamed("sz", "size_b"), "b")
        .select(col("a"), col("b"), col("shared"), col("size_a"),
          col("size_b"),
          round(col("shared").cast(DoubleType) /
            col("size_a").cast(DoubleType), 6).as("cont_ab"),
          round(col("shared").cast(DoubleType) /
            col("size_b").cast(DoubleType), 6).as("cont_ba"))
        .filter(col("shared") >= 3)
        .orderBy(desc("cont_ab"), col("a"), col("b"))
        .limit(20)
    },
    Some("""WITH w AS (SELECT doc_id, string_split(text, ' ') AS l
                       FROM documents),
            sh AS (SELECT DISTINCT doc_id,
                          unnest(list_transform(range(1, len(l) - 1),
                            i -> l[i] || ' ' || l[i+1] || ' ' || l[i+2]))
                            AS sh
                   FROM w WHERE len(l) >= 3),
            rare AS (SELECT sh, count(*) AS df FROM sh GROUP BY sh
                     HAVING count(*) <= 20),
            rsh AS (SELECT doc_id, sh.sh, df FROM sh JOIN rare USING (sh)),
            sizes AS (SELECT doc_id, count(*) AS sz FROM rsh GROUP BY doc_id),
            shared AS (
              SELECT x.doc_id AS a, y.doc_id AS b,
                     CAST(count(*) AS BIGINT) AS shared
              FROM rsh x JOIN rsh y
                ON x.sh = y.sh AND x.doc_id < y.doc_id
              WHERE x.df >= 2
              GROUP BY 1, 2)
            SELECT a, b, shared, sa.sz AS size_a, sb.sz AS size_b,
                   round(CAST(shared AS DOUBLE) / sa.sz, 6) AS cont_ab,
                   round(CAST(shared AS DOUBLE) / sb.sz, 6) AS cont_ba
            FROM shared
            JOIN sizes sa ON sa.doc_id = a
            JOIN sizes sb ON sb.doc_id = b
            WHERE shared >= 3
            ORDER BY cont_ab DESC, a, b LIMIT 20"""))

  // ------------- dq_t_closeness: ordered-attribute privacy audit

  private val tCloseness = Q(
    "dq_t_closeness",
    "t-closeness audit (the step beyond dq_k_anonymity/dq_l_diversity): " +
      "per QI group (nation), the earth-mover's distance between the " +
      "group's distribution over the ORDERED sensitive attribute " +
      "(account-balance band, 1000-wide buckets) and the global one — " +
      "for ordered buckets EMD is the mean |cumulative difference|. " +
      "Buckets are densified per nation (missing band = probability 0) " +
      "so cumulative sums line up; everything after the one customer " +
      "groupBy runs on the nation×band grid (≤ a few hundred rows at " +
      "any corpus size).",
    (s, d) => {
      val cu = t(s, d, "customer")
        .select(col("c_nationkey"),
          floor(col("c_acctbal") / 1000).cast(LongType).as("band"))
      val gb = cu.groupBy("band").agg(count(lit(1)).as("n_b"))
      // corpus totals ride a broadcast 1-row aggregate of the tiny band
      // rollup — never a driver scalar
      val totals = gb.agg(sum("n_b").as("tot"),
        count(lit(1)).as("n_bands"))
      val ng = cu.groupBy("c_nationkey").agg(count(lit(1)).as("n_g"))
      val gbCell = cu.groupBy("c_nationkey", "band")
        .agg(count(lit(1)).as("n_gb"))
      val grid = ng.crossJoin(gb.select("band", "n_b"))
        .join(gbCell, Seq("c_nationkey", "band"), "left")
        .na.fill(0L, Seq("n_gb"))
        .crossJoin(broadcast(totals))
      val wc = Window.partitionBy("c_nationkey").orderBy("band")
      grid
        .withColumn("cum_g",
          sum(col("n_gb").cast(DoubleType) / col("n_g")).over(wc))
        .withColumn("cum_all",
          sum(col("n_b").cast(DoubleType) / col("tot")).over(wc))
        .groupBy("c_nationkey")
        // nano-rounded per-band terms, exact integer sum (cum_* are
        // bit-identical window prefixes; the per-nation SUM order is not)
        .agg(round(sum(round(abs(col("cum_g") - col("cum_all")) * 1e9, 0)
          .cast(LongType)).cast(DoubleType) / 1e9 /
          (first("n_bands") - 1).cast(DoubleType), 6).as("t"))
        .withColumn("close", col("t") <= 0.25)
        .transform(graft.engine.Ops.reportSort("c_nationkey"))
    },
    Some("""WITH cu AS (SELECT c_nationkey,
                               CAST(floor(c_acctbal / 1000) AS BIGINT)
                                 AS band
                        FROM customer),
            gb AS (SELECT band, count(*) AS n_b FROM cu GROUP BY band),
            ng AS (SELECT c_nationkey, count(*) AS n_g FROM cu GROUP BY 1),
            cell AS (SELECT c_nationkey, band, count(*) AS n_gb
                     FROM cu GROUP BY 1, 2),
            grid AS (
              SELECT ng.c_nationkey, gb.band, ng.n_g, gb.n_b,
                     coalesce(cell.n_gb, 0) AS n_gb
              FROM ng CROSS JOIN gb
              LEFT JOIN cell ON cell.c_nationkey = ng.c_nationkey
                            AND cell.band = gb.band),
            cums AS (
              SELECT c_nationkey, band,
                     sum(CAST(n_gb AS DOUBLE) / n_g) OVER
                       (PARTITION BY c_nationkey ORDER BY band) AS cum_g,
                     sum(CAST(n_b AS DOUBLE) /
                         (SELECT count(*) FROM cu)) OVER
                       (PARTITION BY c_nationkey ORDER BY band) AS cum_all
              FROM grid)
            SELECT c_nationkey,
                   round(CAST(sum(CAST(round(abs(cum_g - cum_all) * 1e9,
                           0) AS BIGINT)) AS DOUBLE) / 1e9 /
                         ((SELECT count(*) FROM gb) - 1), 6) AS t,
                   round(CAST(sum(CAST(round(abs(cum_g - cum_all) * 1e9,
                           0) AS BIGINT)) AS DOUBLE) / 1e9 /
                         ((SELECT count(*) FROM gb) - 1), 6) <= 0.25
                     AS close
            FROM cums GROUP BY c_nationkey
            ORDER BY c_nationkey"""))

  // ------------- stat_kendall_tau: rank correlation with tie terms

  private val kendall = Q(
    "stat_kendall_tau",
    "Kendall tau-b between monthly order count and monthly revenue " +
      "(with the proper tie corrections — tau-a silently understates " +
      "correlation when either margin ties). Orders roll up to ~80 " +
      "month rows first, so the O(m²) concordance pair space is " +
      "~3k pairs of a BOUNDED rollup — the same bounded-pair " +
      "discipline as stat_theil_sen; revenue compares in exact cents " +
      "so concordance is never a float-epsilon call.",
    (s, d) => {
      val m = t(s, d, "orders")
        .groupBy(date_trunc("month", col("o_orderdate")).as("m"))
        .agg(count(lit(1)).as("x"),
          sum(round(col("o_totalprice") * 100, 0).cast(LongType)).as("y"))
      val pairs = m.as("i")
        .join(m.as("j"), col("i.m") < col("j.m"))
        .select((col("i.x") - col("j.x")).as("dx"),
          (col("i.y") - col("j.y")).as("dy"))
      pairs.agg(
        count(lit(1)).as("pairs"),
        sum(when(col("dx") * col("dy") > 0, 1L).otherwise(0L)).as("concordant"),
        sum(when(col("dx") * col("dy") < 0, 1L).otherwise(0L)).as("discordant"),
        sum(when(col("dx") === 0 && col("dy") =!= 0, 1L).otherwise(0L)).as("ties_x"),
        sum(when(col("dy") === 0 && col("dx") =!= 0, 1L).otherwise(0L)).as("ties_y"),
        sum(when(col("dx") === 0 && col("dy") === 0, 1L).otherwise(0L)).as("ties_xy"))
        .select(col("pairs"), col("concordant"), col("discordant"),
          col("ties_x"), col("ties_y"), col("ties_xy"),
          round((col("concordant") - col("discordant")).cast(DoubleType) /
            sqrt((col("pairs") - col("ties_x") - col("ties_xy")).cast(DoubleType) *
              (col("pairs") - col("ties_y") - col("ties_xy")).cast(DoubleType)) *
            1e6, 0).cast(LongType).as("tau_b_micro"))
    },
    Some("""WITH m AS (
              SELECT date_trunc('month', o_orderdate) AS m,
                     CAST(count(*) AS BIGINT) AS x,
                     CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                       AS BIGINT) AS y
              FROM orders GROUP BY 1),
            p AS (SELECT i.x - j.x AS dx, i.y - j.y AS dy
                  FROM m i JOIN m j ON i.m < j.m)
            SELECT CAST(count(*) AS BIGINT) AS pairs,
                   CAST(sum(CASE WHEN dx * dy > 0 THEN 1 ELSE 0 END) AS BIGINT)
                     AS concordant,
                   CAST(sum(CASE WHEN dx * dy < 0 THEN 1 ELSE 0 END) AS BIGINT)
                     AS discordant,
                   CAST(sum(CASE WHEN dx = 0 AND dy <> 0 THEN 1 ELSE 0 END)
                     AS BIGINT) AS ties_x,
                   CAST(sum(CASE WHEN dy = 0 AND dx <> 0 THEN 1 ELSE 0 END)
                     AS BIGINT) AS ties_y,
                   CAST(sum(CASE WHEN dx = 0 AND dy = 0 THEN 1 ELSE 0 END)
                     AS BIGINT) AS ties_xy,
                   CAST(round(CAST(sum(CASE WHEN dx * dy > 0 THEN 1 ELSE 0 END) -
                              sum(CASE WHEN dx * dy < 0 THEN 1 ELSE 0 END)
                           AS DOUBLE) /
                         sqrt(CAST((count(*) -
                                sum(CASE WHEN dx = 0 AND dy <> 0 THEN 1 ELSE 0 END) -
                                sum(CASE WHEN dx = 0 AND dy = 0 THEN 1 ELSE 0 END))
                              AS DOUBLE) *
                              CAST((count(*) -
                                sum(CASE WHEN dy = 0 AND dx <> 0 THEN 1 ELSE 0 END) -
                                sum(CASE WHEN dx = 0 AND dy = 0 THEN 1 ELSE 0 END))
                              AS DOUBLE)) * 1e6, 0) AS BIGINT) AS tau_b_micro
            FROM p"""))

  // ------------- text_fertility: tokenizer fertility per language

  private val fertility = Q(
    "text_fertility",
    "Tokenizer-fertility audit per language: whitespace tokens, " +
      "characters and UTF-8 bytes per doc roll up to chars/token and " +
      "bytes/char ratios — the numbers that decide how a fixed token " +
      "budget translates into corpus coverage per language (CJK text " +
      "shows bytes/char ≈ 3, which a bytes-based sampler must correct " +
      "for). Pure map-side row math + one lang groupBy.",
    (s, d) =>
      t(s, d, "documents")
        .select(col("lang"),
          size(split(col("text"), " ")).cast(LongType).as("tk"),
          length(col("text")).cast(LongType).as("ch"),
          octet_length(col("text")).cast(LongType).as("by"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum("tk").as("tokens"), sum("ch").as("chars"),
          sum("by").as("bytes"),
          round(sum("ch").cast(DoubleType) / sum("tk"), 4)
            .as("chars_per_token"),
          round(sum("by").cast(DoubleType) / sum("ch"), 4)
            .as("bytes_per_char"))
        .orderBy("lang"),
    Some("""SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(len(string_split(text, ' '))) AS BIGINT)
                     AS tokens,
                   CAST(sum(length(text)) AS BIGINT) AS chars,
                   CAST(sum(strlen(text)) AS BIGINT) AS bytes,
                   round(CAST(sum(length(text)) AS DOUBLE) /
                         sum(len(string_split(text, ' '))), 4)
                     AS chars_per_token,
                   round(CAST(sum(strlen(text)) AS DOUBLE) /
                         sum(length(text)), 4) AS bytes_per_char
            FROM documents GROUP BY lang ORDER BY lang"""))

  val all: Seq[Q] =
    Seq(ragPack, containment, tCloseness, kendall, fertility)
}
