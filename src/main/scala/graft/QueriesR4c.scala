package graft

import graft.engine.Ck.Ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.engine.Engine
import graft.operators.{Dedup, TextAnalysis => TA}

/** Round-3 batch 29: greedy MMR diversified re-ranking (integer-exact)
  * and leakage-safe group-aware k-fold assignment.
  */
object QueriesR4c {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Engine.table(s, dir, name)

  // ------------- text_mmr_diversify: greedy diversity re-ranking

  private val mmr = Q(
    "text_mmr_diversify",
    "Maximal Marginal Relevance re-ranking — the retrieval step that " +
      "stops a result page being five copies of the same doc: from the " +
      "top-20 quality candidates, greedily pick 5, each round scoring " +
      "remaining docs by 7·rel − 3·max_sim_to_selected (λ=0.7 cleared " +
      "of denominators, so MMR stays INTEGER: rel is micro-scaled " +
      "quality, sim is micro-scaled bigram Jaccard — argmax needs no " +
      "float tolerance). Candidate and pair frames are bounded (20 " +
      "docs, 190 pairs) regardless of corpus size — the candidate cut " +
      "is the scale story, the greedy loop runs on the bounded rerank " +
      "set like every production MMR. 5 rounds, each one anti-join + " +
      "one max-aggregate; the oracle unrolls them.",
    (s, d) => {
      val toks = t(s, d, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
      val scoredDocs = toks.select(col("doc_id"),
        round(TA.qualityScoreFromToks(col("toks")) * 1000000).cast(LongType)
          .as("rel"),
        Dedup.bigramShinglesFromToks(col("toks")).as("sh"))
      val cands = scoredDocs
        .orderBy(desc("rel"), col("doc_id")).limit(20)
        .ckpt(true)
      val pairs = cands.select(col("doc_id").as("da"), col("sh").as("sa"))
        .crossJoin(broadcast(
          cands.select(col("doc_id").as("db"), col("sh").as("sb"))))
        .filter(col("da") < col("db"))
        .select(col("da"), col("db"),
          (size(array_intersect(col("sa"), col("sb"))).cast(LongType)
            * 1000000L /
            (size(col("sa")) + size(col("sb")) -
              size(array_intersect(col("sa"), col("sb"))))).cast(LongType)
            .as("sim"))
      val sims = pairs
        .unionByName(pairs.select(col("db").as("da"), col("da").as("db"),
          col("sim")))
        .ckpt(true)
      val c = cands.select("doc_id", "rel")
      // round 1: nothing selected, pure relevance
      var sel = c
        .select(col("doc_id"), col("rel"), lit(0L).as("maxsim"),
          (col("rel") * 7L).as("mmr"), lit(1L).as("rank"))
        .orderBy(desc("mmr"), col("doc_id")).limit(1)
        .ckpt(true)
      for (r <- 2 to 5) {
        val rem = c.join(sel.select("doc_id"), Seq("doc_id"), "left_anti")
        val pick = rem
          .join(sims.join(sel.select(col("doc_id").as("db")), Seq("db"))
              .select(col("da").as("doc_id"), col("sim")),
            Seq("doc_id"), "left")
          .groupBy("doc_id", "rel")
          .agg(coalesce(max("sim"), lit(0L)).as("maxsim"))
          .select(col("doc_id"), col("rel"), col("maxsim"),
            (col("rel") * 7L - col("maxsim") * 3L).as("mmr"),
            lit(r.toLong).as("rank"))
          .orderBy(desc("mmr"), col("doc_id")).limit(1)
        sel = sel.unionByName(pick).ckpt(true)
      }
      sel.select("rank", "doc_id", "rel", "maxsim", "mmr")
        .transform(graft.engine.Ops.reportSort("rank"))
    },
    Some {
      val base =
        """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tk
                         FROM documents),
            scored AS (
              SELECT doc_id,
                     CAST(round(round(
                       least(CAST(1.0 AS DOUBLE), len(tk) / 100.0) *
                       (1.0 - len(list_filter(tk,
                          x -> x IN ('the','a','of','and','to'))) /
                         len(tk)), 6) * 1000000) AS BIGINT) AS rel,
                     list_distinct(list_transform(range(1, len(tk)),
                       i -> tk[i] || ' ' || tk[i + 1])) AS sh
              FROM toks),
            cands AS MATERIALIZED (
              SELECT doc_id, rel, sh FROM scored
              ORDER BY rel DESC, doc_id LIMIT 20),
            pr AS MATERIALIZED (
              SELECT a.doc_id AS da, b.doc_id AS db,
                     CAST(len(list_intersect(a.sh, b.sh)) AS BIGINT)
                       * 1000000 //
                       (len(a.sh) + len(b.sh)
                         - len(list_intersect(a.sh, b.sh))) AS sim
              FROM cands a JOIN cands b ON a.doc_id < b.doc_id),
            sims AS MATERIALIZED (
              SELECT da, db, sim FROM pr
              UNION ALL SELECT db, da, sim FROM pr),
            p1 AS MATERIALIZED (
              SELECT doc_id, rel, CAST(0 AS BIGINT) AS maxsim,
                     rel * 7 AS mmr, CAST(1 AS BIGINT) AS rank
              FROM cands ORDER BY mmr DESC, doc_id LIMIT 1)"""
      val rounds = (2 to 5).map { r =>
        val selUnion = (1 until r).map(i => s"SELECT doc_id FROM p$i")
          .mkString(" UNION ALL ")
        s"""p$r AS MATERIALIZED (
              SELECT c.doc_id, c.rel,
                     coalesce(max(s.sim), 0) AS maxsim,
                     c.rel * 7 - coalesce(max(s.sim), 0) * 3 AS mmr,
                     CAST($r AS BIGINT) AS rank
              FROM cands c
              LEFT JOIN sims s
                ON s.da = c.doc_id AND s.db IN ($selUnion)
              WHERE c.doc_id NOT IN ($selUnion)
              GROUP BY c.doc_id, c.rel
              ORDER BY mmr DESC, c.doc_id LIMIT 1)"""
      }.mkString(",\n")
      base + ",\n" + rounds + """
            SELECT rank, doc_id, rel, maxsim, CAST(mmr AS BIGINT) AS mmr
            FROM (SELECT * FROM p1 UNION ALL SELECT * FROM p2
                  UNION ALL SELECT * FROM p3 UNION ALL SELECT * FROM p4
                  UNION ALL SELECT * FROM p5)
            ORDER BY rank"""
    })

  // ------------- ml_kfold_assign: leakage-safe group k-fold

  private val kfold = Q(
    "ml_kfold_assign",
    "Group-aware k-fold assignment — the split that PREVENTS leakage: " +
      "the fold is a content-stable hash of the GROUP key (customer), " +
      "not the row, so every order of a customer lands in the same " +
      "fold and no customer straddles train/validation. The audit " +
      "proves both properties relationally: per fold, row count, " +
      "group count, and positive-label balance in exact bp; plus a " +
      "groups_split column (count of customers seen in >1 fold — " +
      "must be 0 by construction). Map-side fold tagging, one rollup; " +
      "the hash is engine-portable md5-prefix, same as the samplers.",
    (s, d) => {
      val rows = t(s, d, "orders")
        .select(col("o_custkey"),
          (Dedup.tokenId(col("o_custkey").cast("string")) % 5L).as("fold"),
          (col("o_orderstatus") === "F").cast(LongType).as("pos"))
      val perFold = rows.groupBy("fold")
        .agg(count(lit(1)).as("n_rows"),
          countDistinct("o_custkey").as("n_groups"),
          sum("pos").cast(LongType).as("n_pos"))
      val straddle = rows.groupBy("o_custkey")
        .agg(countDistinct("fold").as("nf"))
        .agg(sum((col("nf") > 1L).cast(LongType)).cast(LongType)
          .as("groups_split"))
      perFold.crossJoin(broadcast(straddle))
        .select(col("fold"), col("n_rows"), col("n_groups"),
          expr("(n_pos * 10000) div n_rows").as("pos_bp"),
          col("groups_split"))
        .transform(graft.engine.Ops.reportSort("fold"))
    },
    Some("""WITH rows_t AS (
              SELECT o_custkey,
                     ('0x' || substr(md5(CAST(o_custkey AS VARCHAR)),
                        1, 8))::BIGINT % 5 AS fold,
                     CAST(o_orderstatus = 'F' AS BIGINT) AS pos
              FROM orders),
            per_fold AS (
              SELECT fold, CAST(count(*) AS BIGINT) AS n_rows,
                     CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_groups,
                     CAST(sum(pos) AS BIGINT) AS n_pos
              FROM rows_t GROUP BY 1),
            straddle AS (
              SELECT CAST(sum(CAST(nf > 1 AS BIGINT)) AS BIGINT)
                       AS groups_split
              FROM (SELECT o_custkey, count(DISTINCT fold) AS nf
                    FROM rows_t GROUP BY 1))
            SELECT fold, n_rows, n_groups,
                   (n_pos * 10000) // n_rows AS pos_bp,
                   groups_split
            FROM per_fold CROSS JOIN straddle ORDER BY fold"""))

  val all: Seq[Q] = Seq(mmr, kfold)
}
