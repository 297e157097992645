package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.LongType

import graft.engine.Engine
import graft.operators.Graph

/** Round-3 batch 26: HITS hubs & authorities (integer-normalized,
  * bounded rounds) and a lexical-richness audit (hapax/TTR/Herdan).
  */
object QueriesR3z {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Engine.table(s, dir, name)

  // ------------- g7_hits: hubs & authorities on the trade bipartite

  private val hits = Q(
    "g7_hits",
    "HITS hubs & authorities (3 rounds) over the directed " +
      "customer→supplier trade graph: operators.Graph.hitsInt — " +
      "per-round max-normalization in integer arithmetic (score·1e6 " +
      "div max) keeps every round order-independent and hash-gradable, " +
      "where float HITS's L2 norm could not be. Each half-round is one " +
      "keyed join + groupBy over the memoized trade edge list " +
      "(Graph.tradeEdges — shared across the whole graph family); the " +
      "normalizing max is a 1-row aggregate of the half-round's " +
      "checkpointed score table broadcast into the next join — never a " +
      "driver scalar, never an O(|V|) single-partition window. Top 15 " +
      "per side via a per-side window over pre-shrunk score tables.",
    (s, d) => {
      val edges = Graph.tradeEdges(s, d)
        .select(col("c").as("src"), col("s").as("dst"))
      // parts=4 (round 10, was 8): the trade graph is ~16k nodes at
      // sf0.1 — 4 partitions cover it, the per-stage task floor halves
      // (120 → 80 tasks), and the coalesce(1) half-round max re-reads
      // np block partitions, so smaller np also shrinks that re-read.
      // At corpus scale pass a real parallelism.
      Graph.hitsInt(edges, 3, assumeDistinct = true, parts = 4)
        .withColumn("rk", row_number().over(
          Window.partitionBy("side").orderBy(desc("score"), col("node"))))
        .filter(col("rk") <= 15)
        .select(col("side"), col("rk").cast(LongType).as("rk"),
          col("node"), col("score"))
        .transform(graft.engine.Ops.reportSort("side", "rk"))
    },
    Some {
      val rounds = (1 to 3).map { r =>
        val prevH = s"h${r - 1}"
        s"""a${r}r AS MATERIALIZED (
              SELECT dst AS node, sum(h.score) AS raw
              FROM e JOIN $prevH h ON h.node = e.src GROUP BY dst),
            a$r AS MATERIALIZED (
              SELECT node, (raw * 1000000) //
                           (SELECT max(raw) FROM a${r}r) AS score
              FROM a${r}r),
            h${r}r AS MATERIALIZED (
              SELECT src AS node, sum(a.score) AS raw
              FROM e JOIN a$r a ON a.node = e.dst GROUP BY src),
            h$r AS MATERIALIZED (
              SELECT node, (raw * 1000000) //
                           (SELECT max(raw) FROM h${r}r) AS score
              FROM h${r}r)"""
      }.mkString(",\n")
      s"""WITH e AS MATERIALIZED (
              SELECT DISTINCT o_custkey AS src, l_suppkey AS dst
              FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
          h0 AS MATERIALIZED (
              SELECT DISTINCT src AS node, 1000000 AS score FROM e),
          $rounds,
          ranked AS (
            SELECT 'authority' AS side, node, CAST(score AS BIGINT)
                     AS score,
                   row_number() OVER (ORDER BY score DESC, node) AS rk
            FROM a3
            UNION ALL
            SELECT 'hub' AS side, node, CAST(score AS BIGINT) AS score,
                   row_number() OVER (ORDER BY score DESC, node) AS rk
            FROM h3)
          SELECT side, CAST(rk AS BIGINT) AS rk, node, score
          FROM ranked WHERE rk <= 15 ORDER BY side, rk"""
    })

  // ------------- text_hapax: lexical richness per source

  private val hapax = Q(
    "text_hapax",
    "Lexical-richness audit per source: token count, type (distinct " +
      "token) count, hapax legomena (types occurring exactly once — " +
      "the mass that makes vocabularies heavy-tailed), type-token " +
      "ratio in basis points (integer), and Herdan's C " +
      "(ln types / ln tokens — the TTR variant that is stable under " +
      "corpus growth, which raw TTR is not). One (source, token) " +
      "count shuffle, then a per-source rollup; the audit that decides " +
      "whether a source is boilerplate (low richness) before it " +
      "floods the training mix.",
    (s, d) => {
      val toks = t(s, d, "documents")
        .select(col("source"), explode(split(col("text"), " ")).as("tok"))
      toks.groupBy("source", "tok").agg(count(lit(1)).as("c"))
        .groupBy("source")
        .agg(sum("c").cast(LongType).as("n_tokens"),
          count(lit(1)).as("n_types"),
          sum((col("c") === 1L).cast(LongType)).cast(LongType)
            .as("n_hapax"))
        .select(col("source"), col("n_tokens"), col("n_types"),
          col("n_hapax"),
          expr("(n_types * 10000) div n_tokens").as("ttr_bp"),
          round(log(col("n_types").cast("double")) /
            log(col("n_tokens").cast("double")), 6).as("herdan_c"))
        .transform(graft.engine.Ops.reportSort("source"))
    },
    Some("""WITH toks AS (SELECT source,
                                 unnest(string_split(text, ' ')) AS tok
                          FROM documents),
            tc AS (SELECT source, tok, CAST(count(*) AS BIGINT) AS c
                   FROM toks GROUP BY 1, 2)
            SELECT source,
                   CAST(sum(c) AS BIGINT) AS n_tokens,
                   CAST(count(*) AS BIGINT) AS n_types,
                   CAST(sum(CAST(c = 1 AS BIGINT)) AS BIGINT) AS n_hapax,
                   (CAST(count(*) AS BIGINT) * 10000) //
                     CAST(sum(c) AS BIGINT) AS ttr_bp,
                   round(ln(CAST(count(*) AS DOUBLE)) /
                         ln(CAST(sum(c) AS DOUBLE)), 6) AS herdan_c
            FROM tc GROUP BY source ORDER BY source"""))

  val all: Seq[Q] = Seq(hits, hapax)
}
