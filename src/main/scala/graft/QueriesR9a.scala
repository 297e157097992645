package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
      // spaces >= 4 ⇔ size(split) >= 5 (split keeps trailing empties);
      // filtering before the projection avoids the pushed-down filter
      // re-evaluating the split per row (round-13 TokProbe finding)
      val toks = t(s, d, "documents")
        .filter(length(col("text")) -
          length(translate(col("text"), " ", "")) >= 4)
        .select(col("doc_id"), col("lang"), split(col("text"), " ").as("ref"))
        .withColumn("hyp", when(col("doc_id") % 5 === 0, col("ref"))
          .otherwise(expr("transform(slice(ref, 1, size(ref) - 1), " +
            "(t, i) -> CASE WHEN (i + 1) % 7 = 0 THEN 'xxx' ELSE t END)")))
        .withColumn("em",
          when(col("hyp") === col("ref"), 1L).otherwise(0L))
      // Round 13 (optimization): num_same/len_pred/len_gold are the
      // BLEU clip machinery at n = 1, so the native
      // [[graft.plans.ClippedGramCounts]] kernel computes the per-doc
      // triple in one compiled pass — the former tagged unigram explode
      // shipped every token into a groupBy(doc, lang, em, tok) and a
      // second per-doc aggregation (two keyed exchanges) to produce
      // three integers per document. Identical integers, oracle
      // untouched.
      val perDoc = toks.select(col("lang"), col("em"),
        graft.plans.ClippedGramCounts.words(col("hyp"), col("ref"), 1)
          .as("c"))
        .select(col("lang"), col("em"),
          element_at(col("c"), 1).as("ns"),
          element_at(col("c"), 2).as("hl"),
          element_at(col("c"), 3).as("rl"))
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
        // ≤5-row output: one-partition sort, no range-sample job
        .coalesce(1).sortWithinPartitions("lang")
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

  // ------------- eval_chrf: corpus chrF (character n-gram F-score)

  private val chrf = Q(
    "eval_chrf",
    "Corpus-level chrF (Popović 2015) — the character-n-gram F-score " +
      "that complements BLEU for morphology-rich languages: whitespace " +
      "is stripped, character n-grams for n ∈ 1..6 count per (doc, n, " +
      "gram, side) through the eval_bleu_corpus tagged-explode " +
      "machinery (ONE explode, one keyed aggregation for all 12 " +
      "(n, side) legs), corpus-pooled clipped matches give per-n " +
      "precision and recall, and chrF = (1+β²)·P·R/(β²·P+R) with β = 2 " +
      "averages the per-n F-scores — each assembled from exact integer " +
      "sums in one identical IEEE tree on both engines. The synthetic " +
      "hypothesis is the BLEU generator's (drop last word, corrupt " +
      "every 7th), so the two metrics are directly comparable rows in " +
      "an eval report. Runs over the deterministic doc_id ≡ 0 (mod 8) " +
      "eval slice — chrF is an eval-set metric, and the slice filter " +
      "pushes to the scan. Scale shape: gram enumeration is a " +
      "within-row HOF, nothing global exceeds 6 rows.",
    (s, d) => {
      // deterministic eval slice (doc_id ≡ 0 mod 8, ~1250 docs at sf0.1
      // — a WMT-test-set-sized sample): chrF is an eval-set metric, and
      // the 6-n char-gram blowup (~6× the character count per side)
      // prices a full-corpus sweep at 8× the value of the report — the
      // filter is pushed to the scan
      val toks = t(s, d, "documents")
        .filter(col("doc_id") % 8 === 0 &&
          // spaces >= 4 ⇔ size(split) >= 5; cheap predicate stays out
          // of the split projection (round-13 TokProbe finding)
          length(col("text")) - length(translate(col("text"), " ", "")) >= 4)
        .select(col("doc_id"), split(col("text"), " ").as("ref"))
        .withColumn("hypw",
          expr("transform(slice(ref, 1, size(ref) - 1), " +
            "(t, i) -> CASE WHEN (i + 1) % 7 = 0 THEN 'xxx' ELSE t END)"))
        .select(col("doc_id"),
          concat_ws("", col("ref")).as("r"),
          concat_ws("", col("hypw")).as("h"))
      // Round 13 (optimization): the former shape enumerated every char
      // n-gram position through interpreted HOFs, exploded ~5M
      // (doc, n, side, gram) rows and shuffled them into a
      // groupBy(doc, n, gram) clip — 7-10 s of executor time at sf0.1
      // (StageProf) for 18 corpus integers. The native
      // [[graft.plans.ClippedGramCounts]] char-mode kernel computes
      // (clipped_n, ht_n, rt_n) for n ∈ 1..6 per document in one
      // compiled code-point pass (Spark's substring/length are
      // code-point based, and so is the kernel); corpus pooling is then
      // a plain integer sum — exactly associative, bit-identical
      // pooled values, oracle untouched. The empty-eval-slice guard:
      // a global agg over zero rows yields one all-null row where the
      // former groupBy(n) yielded zero rows — the isNotNull filter
      // restores exact equivalence (and passes every non-empty slice
      // through untouched).
      val counts = toks.select(
        graft.plans.ClippedGramCounts.chars(col("h"), col("r"), 6).as("c"))
      def el(i: Int): Column = element_at(col("c"), i)
      val pooled = counts.agg(
        sum(el(1)).as("s1"),
        (2 to 18).map(i => sum(el(i)).as(s"s$i")): _*)
      val perN = pooled.select(explode(array((1 to 6).map { n =>
        val b = 3 * (n - 1)
        struct(lit(n.toLong).as("n"),
          col(s"s${b + 1}").as("clipped"),
          col(s"s${b + 2}").as("ht"),
          col(s"s${b + 3}").as("rt"))
      }: _*)).as("x"))
        .select(col("x.n").as("n"), col("x.clipped").as("clipped"),
          col("x.ht").as("ht"), col("x.rt").as("rt"))
        .filter(col("clipped").isNotNull)
      val p = col("clipped").cast(DoubleType) / col("ht").cast(DoubleType)
      val r = col("clipped").cast(DoubleType) / col("rt").cast(DoubleType)
      val f = when(col("clipped") === 0, lit(0.0))
        .otherwise(lit(5.0) * p * r / (lit(4.0) * p + r))
      perN
        .select(col("n"), col("clipped"), col("ht"), col("rt"),
          round(f * 1e6, 0).cast(LongType).as("f_micro"))
        // 6-row output: sort in one partition, skip the range-sample job
        .coalesce(1).sortWithinPartitions("n")
    },
    Some {
      def gramsSql(side: String, n: Int): String =
        s"""SELECT doc_id, unnest(list_transform(
              range(1, greatest(length($side) - ${n - 1}, 0) + 1),
              i -> substr($side, CAST(i AS INT), $n))) AS g
            FROM toks"""
      def cntSql(side: String, n: Int): String =
        s"SELECT doc_id, g, count(*) AS cnt FROM (${gramsSql(side, n)}) GROUP BY 1, 2"
      val perN = (1 to 6).map { n =>
        s"""SELECT $n AS n,
                   CAST(sum(least(coalesce(h.cnt, 0), coalesce(r.cnt, 0)))
                     AS BIGINT) AS clipped,
                   CAST(sum(coalesce(h.cnt, 0)) AS BIGINT) AS ht,
                   CAST(sum(coalesce(r.cnt, 0)) AS BIGINT) AS rt
            FROM (${cntSql("h", n)}) h
            FULL JOIN (${cntSql("r", n)}) r USING (doc_id, g)"""
      }.mkString("\nUNION ALL\n")
      s"""WITH toks AS (
            SELECT doc_id,
                   array_to_string(string_split(text, ' '), '') AS r,
                   array_to_string(list_transform(
                     range(1, len(string_split(text, ' '))),
                     i -> CASE WHEN i % 7 = 0 THEN 'xxx'
                          ELSE string_split(text, ' ')[i] END), '') AS h
            FROM documents
            WHERE doc_id % 8 = 0
              AND len(string_split(text, ' ')) >= 5),
          pern AS ($perN)
          SELECT CAST(n AS BIGINT) AS n, clipped, ht, rt,
                 CAST(round(CASE WHEN clipped = 0 THEN CAST(0.0 AS DOUBLE)
                   ELSE CAST(5.0 AS DOUBLE) *
                        (CAST(clipped AS DOUBLE) / CAST(ht AS DOUBLE)) *
                        (CAST(clipped AS DOUBLE) / CAST(rt AS DOUBLE)) /
                        (CAST(4.0 AS DOUBLE) *
                          (CAST(clipped AS DOUBLE) / CAST(ht AS DOUBLE)) +
                          (CAST(clipped AS DOUBLE) / CAST(rt AS DOUBLE)))
                   END * 1e6, 0) AS BIGINT) AS f_micro
          FROM pern ORDER BY n"""
    })

  // ------------- rec_ndcg_pop: NDCG@10 + MRR@10, popularity baseline

  /** Integer discount tables shared by the Spark plan and the SQL
    * oracle: term(i) = round(1e6 / log2(i + 1)) for rank i, and the
    * cumulative ideal DCG — both engines consume the SAME precomputed
    * BIGINT constants, so no transcendental evaluates at query time on
    * either side.
    */
  private val dcgTerms: Seq[Long] =
    (1 to 10).map(i => math.round(1e6 / (math.log(i + 1.0) / math.log(2.0))))
  private val idcgCum: Seq[Long] = dcgTerms.scanLeft(0L)(_ + _).tail

  private val ndcgPop = Q(
    "rec_ndcg_pop",
    "Ranking-eval staples NDCG@10 and MRR@10 for the POPULARITY " +
      "baseline recommender (every user is served the same global " +
      "top-10 suppliers by distinct-customer reach; relevance = the " +
      "user actually trades with the supplier) — the reference " +
      "numbers a rec experiment must beat, rolled up per nation. All " +
      "discount arithmetic is precomputed integer micro-units shared " +
      "verbatim by both engines (round(1e6/log2(rank+1)) terms and " +
      "their cumulative ideal sums as literal arrays), so per-user " +
      "DCG/IDCG/MRR are exact BIGINTs and only the final macro means " +
      "divide. Scale shape: the top-10 list is a bounded frame carried " +
      "as a 10-entry literal-free map via cartesian; hits compute on " +
      "one keyed join of the user-supplier edge list; one rollup.",
    (s, d) => {
      val edges = graft.operators.Graph.tradeEdges(s, d) // distinct (c, s)
      // TakeOrderedAndProject does the scalable top-k; positions are then
      // assigned INSIDE one aggregate over the 10 survivors (array_sort
      // on the (-pop, s) struct replays the same order) — no row_number
      // window restating the sort spec (VERDICT r9 minor: one ordering
      // form suffices)
      val top10 = edges.groupBy("s").agg(count(lit(1)).as("pop"))
        .orderBy(desc("pop"), col("s")).limit(10)
        .agg(expr(
          """map_from_entries(transform(
               array_sort(collect_list(struct(-pop AS np, s))),
               (e, i) -> struct(e.s, CAST(i + 1 AS BIGINT))))""").as("pm"))
      val terms = typedLit(dcgTerms)
      val idcg = typedLit(idcgCum)
      val perUser = edges.hint("shuffle_replicate_nl").crossJoin(top10)
        .select(col("c"), element_at(col("pm"), col("s")).as("pos"))
        .groupBy("c")
        .agg(sum(when(col("pos").isNotNull,
            element_at(terms, col("pos").cast("int"))).otherwise(0L))
            .as("dcg_micro"),
          // R = the user's TOTAL relevant count (their full edge list —
          // every input row is one distinct (c, s) trade), normalizing
          // IDCG at min(R, 10) per the standard NDCG@10 convention and
          // eval_ndcg's documented contract (ADVICE r9: the old hits-
          // based index inflated users whose relevant set extends past
          // the served list). R >= 1 by construction, so no zero guard.
          count(lit(1)).as("rel"),
          min(col("pos")).as("first_pos"))
      val cust = t(s, d, "customer")
        .select(col("c_custkey").as("c"), col("c_nationkey").as("nk"))
      def dd(c: Column) = c.cast(DoubleType)
      perUser.join(cust, "c")
        .select(col("nk"),
          (dd(col("dcg_micro")) /
            dd(element_at(idcg, least(col("rel"), lit(10L)).cast("int"))))
            .as("ndcg"),
          when(col("first_pos").isNotNull,
            lit(1.0) / dd(col("first_pos"))).otherwise(lit(0.0)).as("rr"))
        .groupBy("nk")
        .agg(count(lit(1)).as("n_users"),
          sum(round(col("ndcg") * 1e6, 0).cast(LongType)).as("ndcg_sum"),
          sum(round(col("rr") * 1e6, 0).cast(LongType)).as("rr_sum"))
        .select(col("nk").cast(LongType).as("nationkey"), col("n_users"),
          round(dd(col("ndcg_sum")) / col("n_users") / 1e6, 6)
            .as("mean_ndcg10"),
          round(dd(col("rr_sum")) / col("n_users") / 1e6, 6)
            .as("mean_mrr10"))
        // 25-row output: one-partition sort, no range-sample job
        .coalesce(1).sortWithinPartitions("nationkey")
    },
    Some {
      val termsSql = dcgTerms.mkString("[", ", ", "]")
      val idcgSql = idcgCum.mkString("[", ", ", "]")
      s"""WITH ed AS (SELECT DISTINCT o_custkey AS c, l_suppkey AS s
                      FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
          top10 AS (
            SELECT s, row_number() OVER (ORDER BY pop DESC, s) AS pos
            FROM (SELECT s, count(*) AS pop FROM ed GROUP BY s)
            ORDER BY pop DESC, s LIMIT 10),
          per_user AS (
            SELECT c,
                   CAST(sum(CASE WHEN pos IS NOT NULL
                     THEN ($termsSql)[CAST(pos AS INT)] ELSE 0 END)
                     AS BIGINT) AS dcg_micro,
                   CAST(count(*) AS BIGINT) AS rel,
                   min(pos) AS first_pos
            FROM ed LEFT JOIN top10 USING (s)
            GROUP BY c),
          scored AS (
            SELECT c_nationkey AS nk,
                   CAST(round(CAST(dcg_micro AS DOUBLE) /
                          CAST(($idcgSql)[CAST(least(rel, 10) AS INT)]
                               AS DOUBLE) * 1e6, 0) AS BIGINT)
                     AS ndcg_micro,
                   CAST(round(CASE WHEN first_pos IS NOT NULL
                     THEN CAST(1.0 AS DOUBLE) / CAST(first_pos AS DOUBLE)
                     ELSE CAST(0.0 AS DOUBLE) END * 1e6, 0) AS BIGINT)
                     AS rr_micro
            FROM per_user JOIN customer ON c_custkey = c)
          SELECT CAST(nk AS BIGINT) AS nationkey,
                 CAST(count(*) AS BIGINT) AS n_users,
                 round(CAST(sum(ndcg_micro) AS DOUBLE) / count(*) / 1e6, 6)
                   AS mean_ndcg10,
                 round(CAST(sum(rr_micro) AS DOUBLE) / count(*) / 1e6, 6)
                   AS mean_mrr10
          FROM scored GROUP BY nk ORDER BY nationkey"""
    })

  val all: Seq[Q] = Seq(tokenF1, chrf, ndcgPop)
}
