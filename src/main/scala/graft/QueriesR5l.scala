package graft

import graft.engine.Ck.Ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.{DoubleType, LongType}

import graft.engine.Engine
import graft.operators.{Dedup, Graph}

/** Round-5 batch 10: perplexity-filter operating curve, personalized
  * PageRank, Cochran-Armitage trend test, Hamming top-k search.
  */
object QueriesR5l {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Engine.table(s, dir, name)

  // ------- text_ppl_filter_sweep: the perplexity-filter operating curve

  private val pplSweep = Q(
    "text_ppl_filter_sweep",
    "Perplexity-filter operating curve — what a KenLM quality gate " +
      "would KEEP at the p50/p75/p90 surprisal cut-offs: per-doc " +
      "average unigram bits (add-one-smoothed corpus model, per-entry " +
      "micro-bit rounding so doc sums are exact integers — the " +
      "text_bigram_lm float bridge), exact percentile thresholds from " +
      "the per-doc frame, and per cut-off the kept-doc count, corpus " +
      "share, and mean kept-doc length. Model + scoring are two keyed " +
      "aggs; the sweep is a bounded ×3 broadcast of the threshold row.",
    (s, d) => {
      val toks = t(s, d, "documents")
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        .groupBy("doc_id", "tok").agg(count(lit(1)).as("cnt"))
        .ckpt(true)
      val model = toks.groupBy("tok").agg(sum("cnt").as("c"))
      // 1-row totals ride a plain cartesian (SHUFFLE_REPLICATE_NL, the
      // stat_levene idiom) instead of spending a scheduler job building
      // a 1-row broadcast
      val tot = model.agg(sum("c").as("n"), count(lit(1)).as("v"))
      val scoredModel = model.hint("shuffle_replicate_nl").crossJoin(tot)
        .select(col("tok"),
          round(-log2((col("c") + 1).cast(DoubleType) /
            (col("n") + col("v")).cast(DoubleType)) * 1e6, 0)
            .cast(LongType).as("nll_micro"))
      val perDoc = toks.join(scoredModel, "tok")
        .groupBy("doc_id")
        .agg(sum("cnt").as("len"),
          sum(col("cnt") * col("nll_micro")).as("nll_sum"))
        .select(col("doc_id"), col("len"),
          expr("nll_sum div len").as("avg_bits_micro"))
        .ckpt(true)
      // n_docs folds into the SAME percentile aggregation (one pass over
      // perDoc instead of two), and the 3-row sweep frame rides the scan
      // as a cartesian — the former shape spent two broadcast-build jobs
      // plus a separate count aggregation on this
      val thr = perDoc.agg(
          expr("percentile(avg_bits_micro, 0.50)").as("p50"),
          expr("percentile(avg_bits_micro, 0.75)").as("p75"),
          expr("percentile(avg_bits_micro, 0.90)").as("p90"),
          count(lit(1)).as("n_docs"))
        .select(explode(expr(
          "array(struct(50L AS pct, p50 AS thr), " +
            "struct(75L AS pct, p75 AS thr), " +
            "struct(90L AS pct, p90 AS thr))")).as("t"),
          col("n_docs"))
        .select(col("t.pct").as("pct"),
          round(col("t.thr"), 1).as("thr"), col("n_docs"))
      def dd(c: String) = col(c).cast(DoubleType)
      perDoc.hint("shuffle_replicate_nl").crossJoin(thr)
        .filter(col("avg_bits_micro") <= col("thr"))
        .groupBy("pct", "thr", "n_docs")
        .agg(count(lit(1)).as("n_kept"), sum("len").as("kept_tokens"))
        .select(col("pct"),
          round(col("thr") * 10, 0).cast(LongType).as("thr_decimicro"),
          col("n_kept"),
          round(dd("n_kept") * 1e6 / dd("n_docs"), 0).cast(LongType)
            .as("share_micro"),
          expr("kept_tokens div n_kept").as("mean_len_kept"))
        .transform(graft.engine.Ops.reportSort("pct"))
    },
    Some("""WITH toks AS (
              SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS cnt
              FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                    FROM documents)
              GROUP BY 1, 2),
            model AS (
              SELECT tok, CAST(sum(cnt) AS BIGINT) AS c
              FROM toks GROUP BY 1),
            tot AS (SELECT CAST(sum(c) AS BIGINT) AS n,
                           CAST(count(*) AS BIGINT) AS v FROM model),
            sm AS (
              SELECT tok,
                     CAST(round(-log2(CAST(c + 1 AS DOUBLE) /
                       CAST(n + v AS DOUBLE)) * 1e6, 0) AS BIGINT)
                       AS nll_micro
              FROM model CROSS JOIN tot),
            per_doc AS (
              SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS len,
                     CAST(sum(cnt * nll_micro) AS BIGINT) //
                       CAST(sum(cnt) AS BIGINT) AS avg_bits_micro
              FROM toks JOIN sm USING (tok) GROUP BY 1),
            thr AS (
              SELECT pct, round(thr, 1) AS thr FROM (
                SELECT unnest([
                  {'pct': 50, 'thr': quantile_cont(avg_bits_micro, 0.50)},
                  {'pct': 75, 'thr': quantile_cont(avg_bits_micro, 0.75)},
                  {'pct': 90, 'thr': quantile_cont(avg_bits_micro, 0.90)}],
                  recursive := true)
                FROM per_doc)),
            nd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM per_doc)
            SELECT CAST(pct AS BIGINT) AS pct,
                   CAST(round(thr * 10, 0) AS BIGINT) AS thr_decimicro,
                   CAST(count(*) AS BIGINT) AS n_kept,
                   CAST(round(CAST(count(*) AS DOUBLE) * 1e6 / n_docs, 0)
                     AS BIGINT) AS share_micro,
                   CAST(sum(len) AS BIGINT) // CAST(count(*) AS BIGINT)
                     AS mean_len_kept
            FROM per_doc CROSS JOIN thr CROSS JOIN nd
            WHERE avg_bits_micro <= thr
            GROUP BY pct, thr, n_docs
            ORDER BY pct"""))

  // ------- g15_personalized_pagerank: seeded relevance propagation

  private val ppr = Q(
    "g15_personalized_pagerank",
    "Personalized PageRank from a seed node (5 rounds, integer " +
      "arithmetic) on the co-purchase backbone — the seeded-relevance " +
      "variant of g1 that powers 'related items from THIS item': all " +
      "teleport mass returns to the seed (the smallest backbone node), " +
      "contributions are integer rank div degree so every round is " +
      "accumulation-order-proof and hash-gradable, and rounds ride the " +
      "memoized ≤2000-edge backbone — bounded work at any corpus " +
      "size. Lineage spans the whole 5-round loop lazily (plan depth " +
      "10 on a bounded frame; the unbounded-graph variant would " +
      "checkpoint like pageRankInt). Top 20 by final rank.",
    (s, d) => {
      val ed = Graph.backbone(s, d).select("a", "b")
      val und = ed.select(col("a").as("src"), col("b").as("dst"))
        .unionAll(ed.select(col("b").as("src"), col("a").as("dst")))
      val deg = und.groupBy("src").agg(count(lit(1)).as("deg"))
      // LAZY checkpoints (round 9; were eager): plan truncation without
      // the two blocking jobs — the seed head() below is the single
      // materializing job for the whole edges→nodes chain, and the
      // loop's 5 references then read the persisted RDD blocks
      val edges = und.join(deg, "src").ckpt(false)
      val nodes = edges.select(col("src").as("node")).distinct()
        .ckpt(false)
      val seed = nodes.agg(min("node")).head().getLong(0)
      val base = when(col("node") === seed, lit(150000L)).otherwise(lit(0L))
      var ranks = nodes.select(col("node"),
        when(col("node") === seed, lit(1000000L)).otherwise(lit(0L))
          .as("rank"))
      for (_ <- 1 to 5) {
        val inc = edges
          .join(ranks.withColumnRenamed("node", "src"), "src")
          .select(col("dst").as("node"),
            expr("rank div deg").as("contrib"))
          .groupBy("node").agg(sum("contrib").as("incoming"))
        ranks = nodes.join(inc, Seq("node"), "left")
          .select(col("node"),
            (base + expr("(850 * coalesce(incoming, 0L)) div 1000"))
              .as("rank"))
      }
      ranks.filter(col("rank") > 0)
        .orderBy(desc("rank"), col("node")).limit(20)
        .select(col("node"), col("rank").as("ppr_rank"))
    },
    Some {
      val backbone =
        """WITH ed AS MATERIALIZED (
                SELECT DISTINCT o_custkey AS c, l_suppkey AS s
                FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
            cap AS (SELECT c, list_sort(list(DISTINCT s))[1:20] AS ss
                    FROM ed GROUP BY c),
            pr AS (SELECT unnest(flatten(list_transform(range(1, len(ss)),
                     i -> list_transform(range(i + 1, len(ss) + 1),
                       j -> {'a': ss[i], 'b': ss[j]})))) AS p
                   FROM cap WHERE len(ss) >= 2),
            e0 AS MATERIALIZED (
                SELECT a, b FROM (SELECT p.a AS a, p.b AS b,
                                         count(*) AS n
                                  FROM pr GROUP BY p.a, p.b
                                  ORDER BY n DESC, a, b LIMIT 2000)),
            und AS MATERIALIZED (
                SELECT a AS src, b AS dst FROM e0
                UNION ALL SELECT b AS src, a AS dst FROM e0),
            deg AS MATERIALIZED (
                SELECT src, CAST(count(*) AS BIGINT) AS deg
                FROM und GROUP BY 1),
            nodes AS MATERIALIZED (SELECT DISTINCT src AS node FROM und),
            seed AS (SELECT min(node) AS sd FROM nodes),
            r0 AS MATERIALIZED (
                SELECT node, CASE WHEN node = sd THEN 1000000
                                  ELSE 0 END AS rank
                FROM nodes CROSS JOIN seed)"""
      val rounds = (1 to 5).map { r =>
        val prev = s"r${r - 1}"
        s"""inc$r AS (
              SELECT und.dst AS node,
                     CAST(sum(rank // deg) AS BIGINT) AS incoming
              FROM und JOIN deg USING (src)
              JOIN $prev ON und.src = $prev.node
              GROUP BY 1),
            r$r AS MATERIALIZED (
              SELECT nodes.node,
                     (CASE WHEN nodes.node = sd THEN 150000 ELSE 0 END) +
                       (850 * coalesce(incoming, 0)) // 1000 AS rank
              FROM nodes CROSS JOIN seed
              LEFT JOIN inc$r ON nodes.node = inc$r.node)"""
      }.mkString(",\n", ",\n", "")
      backbone + rounds +
        """
            SELECT node, CAST(rank AS BIGINT) AS ppr_rank
            FROM r5 WHERE rank > 0
            ORDER BY rank DESC, node LIMIT 20"""
    })

  // ------- stat_cochran_armitage: trend in proportions across doses

  private val cochranArmitage = Q(
    "stat_cochran_armitage",
    "Cochran-Armitage trend test — is the fulfilled-order share " +
      "MONOTONE in priority tier? The ordered-groups complement to " +
      "chi² independence (which ignores order): tiers score w = the " +
      "priority digit, successes = status 'F', and z² = [Σw(r−n·p̄)]² " +
      "/ (p̄(1−p̄)[Σw²n − (Σwn)²/N]) assembles from one 5-row keyed " +
      "rollup of exact integer counts — a single scan, a 5-row fold, " +
      "micro-rounded scalars.",
    (s, d) => {
      val grp = t(s, d, "orders")
        .select(substring(col("o_orderpriority"), 1, 1)
          .cast(LongType).as("w"),
          (col("o_orderstatus") === "F").cast(LongType).as("succ"))
        .groupBy("w").agg(count(lit(1)).as("n"), sum("succ").as("r"))
      val fold = grp.agg(sum("n").as("nt"), sum("r").as("rt"),
        sum(col("w") * col("r")).as("swr"),
        sum(col("w") * col("n")).as("swn"),
        sum(col("w") * col("w") * col("n")).as("swwn"),
        count(lit(1)).as("k"))
      def dd(c: String) = col(c).cast(DoubleType)
      val p = dd("rt") / dd("nt")
      val num = dd("swr") - p * dd("swn")
      val den = p * (lit(1.0) - p) *
        (dd("swwn") - dd("swn") * dd("swn") / dd("nt"))
      fold.select(col("k"), col("nt"), col("rt"),
        round(p * 1e6, 0).cast(LongType).as("pbar_micro"),
        round(num * num / den * 1e6, 0).cast(LongType).as("z2_micro"))
    },
    Some("""WITH grp AS (
              SELECT CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS w,
                     CAST(count(*) AS BIGINT) AS n,
                     CAST(sum(CASE WHEN o_orderstatus = 'F'
                       THEN 1 ELSE 0 END) AS BIGINT) AS r
              FROM orders GROUP BY 1),
            fold AS (
              SELECT CAST(sum(n) AS BIGINT) AS nt,
                     CAST(sum(r) AS BIGINT) AS rt,
                     CAST(sum(w * r) AS BIGINT) AS swr,
                     CAST(sum(w * n) AS BIGINT) AS swn,
                     CAST(sum(w * w * n) AS BIGINT) AS swwn,
                     CAST(count(*) AS BIGINT) AS k
              FROM grp)
            SELECT k, nt, rt,
                   CAST(round(CAST(rt AS DOUBLE) / nt * 1e6, 0) AS BIGINT)
                     AS pbar_micro,
                   CAST(round(
                     (CAST(swr AS DOUBLE) -
                       CAST(rt AS DOUBLE) / nt * swn) *
                     (CAST(swr AS DOUBLE) -
                       CAST(rt AS DOUBLE) / nt * swn) /
                     ((CAST(rt AS DOUBLE) / nt) *
                      (1.0 - CAST(rt AS DOUBLE) / nt) *
                      (CAST(swwn AS DOUBLE) -
                        CAST(swn AS DOUBLE) * swn / nt)) * 1e6, 0)
                     AS BIGINT) AS z2_micro
            FROM fold"""))

  // ------- sim_hamming_topk: binary-signature nearest neighbors

  private val hammingTopk = Q(
    "sim_hamming_topk",
    "Binary-signature top-k search: 16-bit SimHash fingerprints as the " +
      "compact index (the search twin of dedup_simhash's dedup use), " +
      "top-3 nearest signatures by Hamming distance for a 10-doc query " +
      "panel — XOR + popcount over a 600k-signature scan, the " +
      "brute-force tier a binary ANN (multi-index hashing) would " +
      "replace at scale. The signature frame builds ONCE (checkpointed) " +
      "and serves both sides; ranking is a 10-partition window over " +
      "panel×corpus (bounded by the panel, map-side filterable at " +
      "scale by banding the signature bits).",
    (s, d) => {
      val pairs = Dedup.tokenPairs(t(s, d, "documents"), "doc_id", "text",
        distinctTokens = false)
      val cnts = pairs.groupBy(col("doc_id"), col("tok"))
        .agg(count(lit(1)).as("cnt"))
      val sig = Dedup.simhash16(cnts, "doc_id").ckpt(true)
      val q = sig.filter(col("doc_id") % 97 === 0)
        .orderBy("doc_id").limit(10)
        .select(col("doc_id").as("q_doc"), col("simhash").as("q_sig"))
      val w = Window.partitionBy("q_doc").orderBy("dist", "cand")
      sig.crossJoin(broadcast(q))
        .filter(col("doc_id") =!= col("q_doc"))
        .select(col("q_doc"), col("doc_id").as("cand"),
          bit_count(expr("q_sig ^ simhash")).cast(LongType).as("dist"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select(col("q_doc"), col("rk").cast(LongType).as("rk"),
          col("cand"), col("dist"))
        .transform(graft.engine.Ops.reportSort("q_doc", "rk"))
    },
    Some("""WITH tokens AS (
              SELECT doc_id, unnest(string_split(text, ' ')) AS tok
              FROM documents),
            cnts AS (
              SELECT doc_id, tok, count(*) AS cnt
              FROM tokens GROUP BY 1, 2),
            wv AS (
              SELECT doc_id, j,
                     sum(cnt * (2 * ((h // (1 << j)) % 2) - 1)) AS wj
              FROM (SELECT doc_id, cnt,
                           (37 * ('0x' || substr(md5(tok), 1, 8))::BIGINT
                             + 11) % 65536 AS h
                    FROM cnts)
              CROSS JOIN (SELECT unnest(range(0, 16)) AS j)
              GROUP BY doc_id, j),
            sig AS (
              SELECT doc_id,
                     CAST(sum(CASE WHEN wj > 0 THEN 1 << j ELSE 0 END)
                       AS BIGINT) AS simhash
              FROM wv GROUP BY doc_id),
            q AS (
              SELECT doc_id AS q_doc, simhash AS q_sig FROM sig
              WHERE doc_id % 97 = 0 ORDER BY doc_id LIMIT 10),
            scored AS (
              SELECT q_doc, doc_id AS cand,
                     CAST(bit_count(xor(q_sig, simhash)) AS BIGINT)
                       AS dist
              FROM sig CROSS JOIN q
              WHERE doc_id <> q_doc)
            SELECT q_doc, CAST(rk AS BIGINT) AS rk, cand, dist
            FROM (SELECT *, row_number() OVER (PARTITION BY q_doc
                    ORDER BY dist, cand) AS rk
                  FROM scored)
            WHERE rk <= 3 ORDER BY q_doc, rk"""))

  val all: Seq[Q] = Seq(pplSweep, ppr, cochranArmitage, hammingTopk)
}
