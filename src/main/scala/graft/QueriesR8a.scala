package graft

import graft.engine.Ck.Ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

import graft.engine.Engine

/** Round-8 batch 1: evaluation-tier additions for LLM training runs.
  */
object QueriesR8a {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Engine.table(s, dir, name)

  // ------------- eval_pass_at_k: the unbiased pass@k estimator

  /** The per-task estimator as ONE shared column expression: with n
    * attempts and c correct, pass@k = 1 − C(n−c, k)/C(n, k), computed as
    * the telescoped product ∏_{i=0..k−1} (n−c−i)/(n−i) — numerically
    * stable (every factor ≤ 1, no factorials) and an identical IEEE
    * expression tree on both engines. Guards, in order: c = 0 is an
    * exact 0 (covers n < k, where the n−c < k test alone would wrongly
    * say 1 for a task with no correct attempt at all); then n−c < k
    * means every size-min(k,n) sample contains a correct attempt →
    * pass@k = 1 exactly.
    */
  private def passAtK(k: Int) = {
    val prod = (0 until k).map(i =>
        (col("n") - col("c") - i).cast(DoubleType) /
          (col("n") - i).cast(DoubleType))
      .reduce(_ * _)
    when(col("c") === 0, lit(0.0))
      .when(col("n") - col("c") < k, lit(1.0))
      .otherwise(lit(1.0) - prod)
  }

  private val passK = Q(
    "eval_pass_at_k",
    "The unbiased pass@k estimator (the code-eval standard: with n " +
      "sampled attempts per task of which c pass, pass@k = " +
      "1 − C(n−c,k)/C(n,k), telescoped to ∏(n−c−i)/(n−i) so no " +
      "factorial ever overflows and every factor stays ≤ 1) over the " +
      "events fixture — each user is a task, each event an attempt, " +
      "purchases are passes. Per-task estimates quantize to micro " +
      "units BEFORE the cross-task mean (BIGINT sum: accumulation " +
      "order can never move a bit, the float-sum discipline), and the " +
      "report is one row per k ∈ {1, 5, 10}: tasks counted, mean " +
      "pass@k, and the share of tasks solved outright at that k. " +
      "Map-side partial aggregation end to end — per-task counts then " +
      "a k-row rollup; nothing is ever per-attempt past the first agg.",
    (s, d) => {
      val tasks = t(s, d, "events")
        .groupBy(col("user_id").as("task"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .as("c"))
      val ks = Seq(1, 5, 10)
      ks.map { k =>
          tasks.select(
            lit(k.toLong).as("k"),
            count(lit(1)).as("n_tasks"),
            sum(round(passAtK(k) * 1e6, 0).cast(LongType)).as("sum_micro"),
            // solved outright = the EXACT pass@k = 1 condition (c > 0 and
            // n − c < k: every size-k sample contains a correct attempt) —
            // not "rounds to 1e6", which would also count near-1 estimates
            // (ADVICE r8)
            sum(when(col("c") > 0 && col("n") - col("c") < k, 1L)
              .otherwise(0L)).as("n_solved"))
        }
        .reduce(_ unionByName _)
        .select(col("k"), col("n_tasks"),
          round(col("sum_micro").cast(DoubleType) / col("n_tasks") / 1e6, 6)
            .as("mean_pass_at_k"),
          col("n_solved"))
        .transform(graft.engine.Ops.reportSort("k"))
    },
    Some {
      def prodSql(k: Int): String = (0 until k)
        .map(i => s"(CAST(n - c - $i AS DOUBLE) / CAST(n - $i AS DOUBLE))")
        .mkString(" * ")
      def caseSql(k: Int): String =
        s"CASE WHEN c = 0 THEN CAST(0.0 AS DOUBLE) " +
          s"WHEN n - c < $k THEN CAST(1.0 AS DOUBLE) " +
          s"ELSE CAST(1.0 AS DOUBLE) - ${prodSql(k)} END"
      val arms = Seq(1, 5, 10).map { k =>
        s"""SELECT CAST($k AS BIGINT) AS k,
                   CAST(count(*) AS BIGINT) AS n_tasks,
                   CAST(sum(CAST(round((${caseSql(k)}) * 1e6, 0) AS BIGINT))
                     AS BIGINT) AS sum_micro,
                   CAST(sum(CASE WHEN c > 0 AND n - c < $k
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_solved
            FROM tasks"""
      }.mkString("\nUNION ALL\n")
      s"""WITH tasks AS (
            SELECT user_id AS task, count(*) AS n,
                   sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                     AS c
            FROM events GROUP BY user_id)
          SELECT k, n_tasks,
                 round(CAST(sum_micro AS DOUBLE) / n_tasks / 1e6, 6)
                   AS mean_pass_at_k,
                 n_solved
          FROM ($arms)
          ORDER BY k"""
    })

  // ------------- rec_user_knn: user-based collaborative filtering

  private val userKnn = Q(
    "rec_user_knn",
    "User-based collaborative-filtering recommender END TO END — the " +
      "third rec-tier entry next to the item-item co-occurrence and the " +
      "rank-1 ALS step: users sharing a supplier become candidate " +
      "neighbor pairs (per-supplier customer lists sorted and CAPPED at " +
      "16 before pair enumeration — the g2 bounded-blowup discipline, " +
      "≤120 pairs per supplier at any corpus size, generated by " +
      "posexplode + tail-slice inside the aggregation, never a " +
      "self-join), pair overlap normalizes to integer-micro cosine " +
      "(round once; the sqrt runs on identical IEEE trees both " +
      "engines), each user keeps their top-3 neighbors (total order: " +
      "sim desc, id), and every neighbor item the user does NOT " +
      "already hold scores by summed neighbor similarity — exact " +
      "BIGINT accumulation. Output: top-2 recommendations per user. " +
      "Shuffle budget: one supplier-key agg, one pair agg, two keyed " +
      "joins against the (broadcastable) size table, one anti join on " +
      "the holdings, two bounded ranking windows partitioned by user.",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val edges = graft.operators.Graph.tradeEdges(s, d) // distinct (c, s)
      val nu = edges.groupBy("c").agg(count(lit(1)).as("nu"))
      val pairs = edges.groupBy("s")
        .agg(slice(array_sort(collect_set(col("c"))), 1, 16).as("cs"))
        .filter(size(col("cs")) >= 2)
        .select(col("cs"), posexplode(col("cs")).as(Seq("i", "a")))
        .select(col("a"),
          explode(slice(col("cs"), col("i") + 2, size(col("cs")))).as("b"))
        .groupBy("a", "b").agg(count(lit(1)).as("inter"))
      val sims = pairs
        .join(nu.select(col("c").as("a"), col("nu").as("na")), "a")
        .join(nu.select(col("c").as("b"), col("nu").as("nb")), "b")
        .select(col("a"), col("b"),
          round(col("inter") * 1e6 / sqrt(col("na") * col("nb")), 0)
            .cast(LongType).as("sim_micro"))
      val nbrs = sims.unionByName(
        sims.select(col("b").as("a"), col("a").as("b"), col("sim_micro")))
      val top3 = nbrs.withColumn("rk", row_number().over(
          Window.partitionBy("a").orderBy(desc("sim_micro"), col("b"))))
        .filter(col("rk") <= 3)
      val recs = top3
        .join(edges.select(col("c").as("b"), col("s").as("item")), "b")
        .join(edges.select(col("c").as("a"), col("s").as("item")),
          Seq("a", "item"), "left_anti")
        .groupBy("a", "item").agg(sum("sim_micro").as("score"))
      recs.withColumn("rk", row_number().over(
          Window.partitionBy("a").orderBy(desc("score"), col("item"))))
        .filter(col("rk") <= 2)
        .select(col("a").as("user"), col("rk").cast(LongType).as("rk"),
          col("item"), col("score"))
        .transform(graft.engine.Ops.reportSort("user", "rk"))
    },
    Some("""WITH ed AS (SELECT DISTINCT o_custkey AS c, l_suppkey AS s
                        FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
            nu AS (SELECT c, count(*) AS nu FROM ed GROUP BY c),
            cap AS (SELECT s, list_sort(list(c))[1:16] AS cs
                    FROM ed GROUP BY s),
            pr AS (SELECT unnest(flatten(list_transform(range(1, len(cs)),
                     i -> list_transform(range(i + 1, len(cs) + 1),
                       j -> {'a': cs[i], 'b': cs[j]})))) AS p
                   FROM cap WHERE len(cs) >= 2),
            inter AS (SELECT p.a AS a, p.b AS b, count(*) AS inter
                      FROM pr GROUP BY 1, 2),
            sims AS (SELECT a, b,
                       CAST(round(inter * 1e6 / sqrt(na.nu * nb.nu), 0)
                         AS BIGINT) AS sim_micro
                     FROM inter
                     JOIN nu na ON na.c = a
                     JOIN nu nb ON nb.c = b),
            nbrs AS (SELECT a, b, sim_micro FROM sims
                     UNION ALL
                     SELECT b, a, sim_micro FROM sims),
            top3 AS (SELECT a, b, sim_micro,
                       row_number() OVER (PARTITION BY a
                         ORDER BY sim_micro DESC, b) AS rk
                     FROM nbrs),
            cands AS (SELECT t.a, e.s AS item,
                        CAST(sum(t.sim_micro) AS BIGINT) AS score
                      FROM top3 t JOIN ed e ON e.c = t.b
                      WHERE t.rk <= 3
                        AND NOT EXISTS (SELECT 1 FROM ed o
                                        WHERE o.c = t.a AND o.s = e.s)
                      GROUP BY t.a, e.s),
            ranked AS (SELECT a, item, score,
                         row_number() OVER (PARTITION BY a
                           ORDER BY score DESC, item) AS rk
                       FROM cands)
            SELECT a AS user, CAST(rk AS BIGINT) AS rk, item, score
            FROM ranked WHERE rk <= 2
            ORDER BY user, rk"""))

  // ------------- eval_bleu_corpus: corpus-level BLEU-4

  private val bleu = Q(
    "eval_bleu_corpus",
    "Corpus-level BLEU-4 — the canonical generation-eval metric, over a " +
      "deterministic synthetic hypothesis (each doc's text minus its " +
      "last token, with every 7th surviving token replaced, so " +
      "precision and brevity are both exercised without any model in " +
      "the loop): per-n clipped n-gram matches (min of hypothesis and " +
      "reference counts per distinct gram per doc — exact integers end " +
      "to end), corpus-pooled totals per n ∈ 1..4, then " +
      "BP · exp(¼·Σ ln pₙ) assembled from those integer sums in one " +
      "identical IEEE expression tree on both engines. Scale shape: " +
      "n-gram enumeration is a within-row HOF (no explode until the " +
      "count agg), and the whole metric is ONE pass over the corpus — " +
      "two keyed exchanges, no reuse materialization: the corpus " +
      "lengths ARE the unigram totals (ref_len = Σ r at n = 1, hyp_len " +
      "= Σ h at n = 1), so the former separate length aggregate and its " +
      "crossJoin (and the eager checkpoint that fed both branches — the " +
      "round-8 verdict's one flagged anti-pattern) fold into the same " +
      "tagged-gram aggregation for free.",
    (s, d) => {
      // size(split(text, " ")) >= 5 ⇔ the text has >= 4 single-space
      // chars (Spark's split keeps trailing empties, so token count is
      // ALWAYS spaces + 1). Filtering on the cheap translate-count
      // BEFORE the projection keeps the predicate out of the split —
      // the former filter-above-project pushed below it and evaluated
      // the split TWICE per row (round-13 TokProbe finding).
      val toks = t(s, d, "documents")
        .filter(length(col("text")) -
          length(translate(col("text"), " ", "")) >= 4)
        .select(col("doc_id"), split(col("text"), " ").as("ref"))
        .withColumn("hyp",
          expr("transform(slice(ref, 1, size(ref) - 1), " +
            "(t, i) -> CASE WHEN (i + 1) % 7 = 0 THEN 'xxx' ELSE t END)"))
      // Round 13 (optimization): the former shape built all 8 (n, side)
      // gram arrays through interpreted zip_with chains, exploded them
      // to ~8M (doc, n, side, gram) rows and shuffled those into a
      // groupBy(doc, n, gram) clip — 8-24 s of executor time at sf0.1
      // (StageProf), all to produce 9 corpus integers. Every per-doc
      // quantity is a function of the two token arrays alone, so the
      // native [[graft.plans.ClippedGramCounts]] kernel computes
      // (clipped_n, hyp_total_n, ref_total_n) for n ∈ 1..4 in ONE
      // compiled per-row pass — no gram explode, no gram exchange —
      // and the corpus totals are plain integer sums (exactly
      // associative → bit-identical pooled values; oracle untouched).
      // No h > 0 pre-filter needed, same as before: a gram seen only in
      // the reference contributes min(0, r) = 0 to clipped, and keeping
      // ref-only grams makes Σ rtot at n = 1 the corpus reference
      // length exactly.
      val counts = toks.select(
        graft.plans.ClippedGramCounts.words(col("hyp"), col("ref"), 4)
          .as("c"))
      def el(i: Int): Column = element_at(col("c"), i)
      val pivot = counts.agg(
        sum(el(1)).as("c1"), sum(el(2)).as("t1"),
        sum(el(4)).as("c2"), sum(el(5)).as("t2"),
        sum(el(7)).as("c3"), sum(el(8)).as("t3"),
        sum(el(10)).as("c4"), sum(el(11)).as("t4"),
        sum(el(3)).as("ref_len"))
        .withColumn("hyp_len", col("t1"))
      def p(i: Int) =
        col(s"c$i").cast(DoubleType) / col(s"t$i").cast(DoubleType)
      val bp = when(col("hyp_len") >= col("ref_len"), lit(1.0))
        .otherwise(exp(lit(1.0) -
          col("ref_len").cast(DoubleType) / col("hyp_len").cast(DoubleType)))
      val score = when(
        col("c1") === 0 || col("c2") === 0 || col("c3") === 0 ||
          col("c4") === 0, lit(0.0))
        .otherwise(bp * exp((log(p(1)) + log(p(2)) + log(p(3)) + log(p(4)))
          * 0.25))
      pivot.select(
        col("ref_len"), col("hyp_len"),
        round(p(1) * 1e6, 0).cast(LongType).as("p1_micro"),
        round(p(2) * 1e6, 0).cast(LongType).as("p2_micro"),
        round(p(3) * 1e6, 0).cast(LongType).as("p3_micro"),
        round(p(4) * 1e6, 0).cast(LongType).as("p4_micro"),
        round(bp, 6).as("bp"),
        round(score, 6).as("bleu"))
    },
    Some {
      def gramsSql(side: String, n: Int): String =
        s"""SELECT doc_id, unnest(list_transform(
              range(1, len($side) - ${n - 1} + 1),
              i -> array_to_string($side[i:i + ${n - 1}], ' '))) AS g
            FROM toks"""
      def cntSql(side: String, n: Int): String =
        s"SELECT doc_id, g, count(*) AS cnt FROM (${gramsSql(side, n)}) GROUP BY 1, 2"
      // FULL join (was LEFT): ref-only grams add exact zeros to clipped
      // and total, and their r counts make rtotal at n = 1 the corpus
      // reference length — same fold as the Spark side
      val perN = (1 to 4).map { n =>
        s"""SELECT $n AS n,
                   CAST(sum(least(coalesce(h.cnt, 0), coalesce(r.cnt, 0)))
                     AS BIGINT) AS clipped,
                   CAST(sum(coalesce(h.cnt, 0)) AS BIGINT) AS total,
                   CAST(sum(coalesce(r.cnt, 0)) AS BIGINT) AS rtotal
            FROM (${cntSql("hyp", n)}) h
            FULL JOIN (${cntSql("ref", n)}) r USING (doc_id, g)"""
      }.mkString("\nUNION ALL\n")
      s"""WITH toks AS (
            SELECT doc_id, string_split(text, ' ') AS ref,
                   list_transform(range(1, len(string_split(text, ' '))),
                     i -> CASE WHEN i % 7 = 0 THEN 'xxx'
                          ELSE string_split(text, ' ')[i] END) AS hyp
            FROM documents
            WHERE len(string_split(text, ' ')) >= 5),
          pern AS ($perN),
          pvt AS (
            SELECT CAST(sum(CASE WHEN n = 1 THEN clipped END) AS BIGINT) AS c1,
                   CAST(sum(CASE WHEN n = 1 THEN total END) AS BIGINT) AS t1,
                   CAST(sum(CASE WHEN n = 2 THEN clipped END) AS BIGINT) AS c2,
                   CAST(sum(CASE WHEN n = 2 THEN total END) AS BIGINT) AS t2,
                   CAST(sum(CASE WHEN n = 3 THEN clipped END) AS BIGINT) AS c3,
                   CAST(sum(CASE WHEN n = 3 THEN total END) AS BIGINT) AS t3,
                   CAST(sum(CASE WHEN n = 4 THEN clipped END) AS BIGINT) AS c4,
                   CAST(sum(CASE WHEN n = 4 THEN total END) AS BIGINT) AS t4,
                   CAST(sum(CASE WHEN n = 1 THEN rtotal END) AS BIGINT)
                     AS ref_len,
                   CAST(sum(CASE WHEN n = 1 THEN total END) AS BIGINT)
                     AS hyp_len
            FROM pern)
          SELECT ref_len, hyp_len,
                 CAST(round(CAST(c1 AS DOUBLE) / CAST(t1 AS DOUBLE) * 1e6, 0) AS BIGINT) AS p1_micro,
                 CAST(round(CAST(c2 AS DOUBLE) / CAST(t2 AS DOUBLE) * 1e6, 0) AS BIGINT) AS p2_micro,
                 CAST(round(CAST(c3 AS DOUBLE) / CAST(t3 AS DOUBLE) * 1e6, 0) AS BIGINT) AS p3_micro,
                 CAST(round(CAST(c4 AS DOUBLE) / CAST(t4 AS DOUBLE) * 1e6, 0) AS BIGINT) AS p4_micro,
                 round(CASE WHEN hyp_len >= ref_len THEN CAST(1.0 AS DOUBLE)
                       ELSE exp(CAST(1.0 AS DOUBLE) -
                         CAST(ref_len AS DOUBLE) / CAST(hyp_len AS DOUBLE))
                       END, 6) AS bp,
                 round(CASE WHEN c1 = 0 OR c2 = 0 OR c3 = 0 OR c4 = 0
                       THEN CAST(0.0 AS DOUBLE)
                       ELSE (CASE WHEN hyp_len >= ref_len
                             THEN CAST(1.0 AS DOUBLE)
                             ELSE exp(CAST(1.0 AS DOUBLE) -
                               CAST(ref_len AS DOUBLE) /
                               CAST(hyp_len AS DOUBLE)) END) *
                            exp((ln(CAST(c1 AS DOUBLE) / CAST(t1 AS DOUBLE)) +
                                 ln(CAST(c2 AS DOUBLE) / CAST(t2 AS DOUBLE)) +
                                 ln(CAST(c3 AS DOUBLE) / CAST(t3 AS DOUBLE)) +
                                 ln(CAST(c4 AS DOUBLE) / CAST(t4 AS DOUBLE)))
                              * 0.25)
                       END, 6) AS bleu
          FROM pvt"""
    })

  val all: Seq[Q] = Seq(passK, userKnn, bleu)
}
