package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.{DoubleType, LongType}

import graft.engine.Engine

/** Round-4 batch 2: perceptual-hash near-dup mining, normalized exact
  * dedup, Pareto-front curation, language-ID confusion, soft dedup.
  */
object QueriesR4o {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Engine.table(s, dir, name)

  /** The mm_image_ahash deterministic 8×8 tile synthesis (the documented
    * codec stub — see Multimodal.scala) shared by the near-dup pass. */
  private def ahashCols(df: DataFrame): DataFrame = {
    val px = (0 until 64).map(j =>
      (col("doc_id") * 131071L + lit(j.toLong) * 40503L) % 256L)
    val withTotal = df.select(col("doc_id")).withColumn("px_total", px.reduce(_ + _))
    def bit(j: Int): Column = px(j) * 64L > col("px_total")
    withTotal.select(
      col("doc_id"),
      (0 until 32).map(j => when(bit(j), lit(1L << j)).otherwise(0L))
        .reduce(_ + _).cast(LongType).as("lo"),
      (32 until 64).map(j => when(bit(j), lit(1L << (j - 32))).otherwise(0L))
        .reduce(_ + _).cast(LongType).as("hi"))
  }

  // ------------- mm_ahash_neardup: pigeonhole-banded hamming pairs

  private val ahashNeardup = Q(
    "mm_ahash_neardup",
    "Perceptual-hash near-duplicate mining over the aHash fingerprints: " +
      "the 64-bit hash splits into four 16-bit bands, and by " +
      "pigeonhole any pair within hamming distance 3 agrees on at " +
      "least one whole band — so candidates come from an equality " +
      "join on (band index, band value), never an all-pairs scan, and " +
      "the exact hamming distance (bit_count of the xor, summed over " +
      "both 32-bit halves) reranks the survivors. The same " +
      "band-then-verify shape as dedup_simhash/dedup_hamming_band, " +
      "here on the multimodal fingerprint path.",
    (s, d) => {
      // the 64-term hash expression is codegen-heavy and feeds both
      // self-join sides: cache the tiny hashed frame so it compiles and
      // evaluates once
      val h = ahashCols(t(s, d, "documents")).cache()
      val bands = h.select(col("doc_id"), col("lo"), col("hi"),
        explode(array(
          struct(lit(0L).as("bi"), (col("lo") % 65536L).as("bv")),
          struct(lit(1L).as("bi"), (col("lo") / 65536L).cast(LongType).as("bv")),
          struct(lit(2L).as("bi"), (col("hi") % 65536L).as("bv")),
          struct(lit(3L).as("bi"), expr("hi div 65536").as("bv"))))
          .as("b"))
        .select(col("doc_id"), col("lo"), col("hi"),
          col("b.bi").as("bi"), col("b.bv").as("bv"))
      val cand = bands.as("x").join(bands.as("y"),
          col("x.bi") === col("y.bi") && col("x.bv") === col("y.bv") &&
            col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"),
          col("x.lo").as("alo"), col("x.hi").as("ahi"),
          col("y.lo").as("blo"), col("y.hi").as("bhi"))
        .distinct()
      cand.select(col("a"), col("b"),
          (bit_count(expr("alo ^ blo")) + bit_count(expr("ahi ^ bhi")))
            .cast(LongType).as("hamming"))
        .filter(col("hamming") <= 3)
        .orderBy("hamming", "a", "b")
        .limit(50)
    },
    Some("""WITH px AS (
              SELECT doc_id, i,
                     (doc_id * 131071 + i * 40503) % 256 AS p
              FROM documents, range(0, 64) t(i)),
            tot AS (SELECT doc_id, i, p,
                           sum(p) OVER (PARTITION BY doc_id) AS total
                    FROM px),
            agg AS (
              SELECT doc_id,
                     CAST(sum(CASE WHEN i < 32 AND p * 64 > total
                              THEN 1::BIGINT << i ELSE 0 END) AS BIGINT)
                       AS lo,
                     CAST(sum(CASE WHEN i >= 32 AND p * 64 > total
                              THEN 1::BIGINT << (i - 32) ELSE 0 END)
                       AS BIGINT) AS hi
              FROM tot GROUP BY 1),
            bands AS (
              SELECT doc_id, lo, hi, u.bi, u.bv
              FROM agg, LATERAL (VALUES (0, lo % 65536),
                                        (1, lo // 65536),
                                        (2, hi % 65536),
                                        (3, hi // 65536)) u(bi, bv)),
            cand AS (
              SELECT DISTINCT x.doc_id AS a, y.doc_id AS b,
                     x.lo AS alo, x.hi AS ahi, y.lo AS blo, y.hi AS bhi
              FROM bands x JOIN bands y
                ON x.bi = y.bi AND x.bv = y.bv AND x.doc_id < y.doc_id)
            SELECT a, b,
                   CAST(bit_count(xor(alo, blo)) +
                        bit_count(xor(ahi, bhi)) AS BIGINT) AS hamming
            FROM cand
            WHERE bit_count(xor(alo, blo)) + bit_count(xor(ahi, bhi)) <= 3
            ORDER BY hamming, a, b LIMIT 50"""))

  // ------------- dedup_normalized: CCNet-style normalized exact dedup

  private val dedupNorm = Q(
    "dedup_normalized",
    "Normalization-then-exact-hash dedup (the CCNet tier between raw " +
      "exact dedup and MinHash): lowercase, strip every non-" +
      "alphanumeric except spaces, collapse whitespace runs, trim — " +
      "then group by the md5 of the normal form. Casing/punctuation " +
      "variants of one text land in one cluster that raw hashing " +
      "misses. Map-side normalization, one hash-key shuffle; the " +
      "report keeps clusters only (never the corpus), keeper = min id.",
    (s, d) => {
      // native normalization (plans.AlnumNormalize, round 13): one
      // compiled byte scan, byte-identical string (TokenizeSpec)
      val norm = graft.plans.AlnumNormalize(col("text"))
      t(s, d, "documents")
        .select(col("doc_id"), md5(norm).as("nfp"))
        .groupBy("nfp")
        .agg(count(lit(1)).as("n_docs"), min("doc_id").as("keeper"),
          max("doc_id").as("max_member"))
        .orderBy(desc("n_docs"), col("nfp"))
        .limit(20)
    },
    Some("""SELECT nfp, CAST(count(*) AS BIGINT) AS n_docs,
                   min(doc_id) AS keeper, max(doc_id) AS max_member
            FROM (SELECT doc_id,
                         md5(trim(regexp_replace(regexp_replace(
                           lower(text), '[^a-z0-9 ]', '', 'g'),
                           ' +', ' ', 'g'))) AS nfp
                  FROM documents)
            GROUP BY nfp
            ORDER BY n_docs DESC, nfp LIMIT 20"""))

  // ------------- curate_pareto_front: quality/cost Pareto selection

  private val pareto = Q(
    "curate_pareto_front",
    "Pareto-front curation per source: maximize lexical diversity " +
      "(distinct/total tokens, in exact micro units) while minimizing " +
      "char cost — a doc is ON the front iff no doc of the same source " +
      "has strictly higher diversity at equal-or-lower cost. One sort " +
      "per source: ordered by diversity DESC, a RANGE-framed running " +
      "min of cost over STRICTLY higher diversity (range ... 1 " +
      "preceding on the integer score) decides domination in a single " +
      "window pass — no pairwise comparison at any corpus size.",
    (s, d) => {
      val docs = t(s, d, "documents")
        .select(col("doc_id"), col("source"), col("n_chars"),
          split(col("text"), " ").as("w"))
        .select(col("doc_id"), col("source"), col("n_chars"),
          round(size(array_distinct(col("w"))).cast(DoubleType) * 1e6 /
            size(col("w")), 0).cast(LongType).as("div_micro"))
      val w = Window.partitionBy("source").orderBy(col("div_micro").desc)
        .rangeBetween(Window.unboundedPreceding, -1)
      docs
        .withColumn("min_cost_higher", min("n_chars").over(w))
        .filter(col("min_cost_higher").isNull ||
          col("n_chars") < col("min_cost_higher"))
        .select("source", "div_micro", "n_chars", "doc_id")
        .transform(graft.engine.Ops.reportSort(col("source"), desc("div_micro"), col("doc_id")))
    },
    Some("""WITH docs AS (
              SELECT doc_id, source, n_chars,
                     CAST(round(len(list_distinct(string_split(text, ' ')))
                          * 1e6 / len(string_split(text, ' ')), 0) AS BIGINT)
                       AS div_micro
              FROM documents),
            f AS (
              SELECT *, min(n_chars) OVER
                     (PARTITION BY source ORDER BY div_micro DESC
                      RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                       AS min_cost_higher
              FROM docs)
            SELECT source, div_micro, n_chars, doc_id
            FROM f
            WHERE min_cost_higher IS NULL OR n_chars < min_cost_higher
            ORDER BY source, div_micro DESC, doc_id"""))

  // ------------- eval_langid_confusion: heuristic vs gold labels

  private val langidConfusion = Q(
    "eval_langid_confusion",
    "Confusion matrix for the text_langid heuristic against the gold " +
      "lang column, with per-cell corpus share — the evaluation loop " +
      "that tells you whether a cheap classifier is safe to gate " +
      "ingestion with (here: 'en' recall vs how much CJK/European " +
      "text the en-marker rule swallows). One groupBy over " +
      "(gold, predicted); share denominators ride a broadcast 1-row " +
      "count aggregate.",
    (s, d) => {
      val pred = t(s, d, "documents")
        .select(col("lang").as("gold"),
          graft.operators.TextAnalysis.langIdEn(col("text")).as("pred"))
      val cells = pred.groupBy("gold", "pred").agg(count(lit(1)).as("n"))
      cells.crossJoin(broadcast(cells.agg(sum("n").as("tot"))))
        .select(col("gold"), col("pred"), col("n"),
          round(col("n").cast(DoubleType) / col("tot"), 6).as("share"))
        .transform(graft.engine.Ops.reportSort("gold", "pred"))
    },
    Some("""WITH pred AS (
              SELECT lang AS gold,
                     CASE WHEN len(list_filter(string_split(text, ' '),
                            x -> x IN ('the','a','of','and','to'))) /
                          len(string_split(text, ' ')) > 0.05
                          THEN 'en' ELSE 'other' END AS pred
              FROM documents),
            cells AS (SELECT gold, pred, CAST(count(*) AS BIGINT) AS n
                      FROM pred GROUP BY 1, 2)
            SELECT gold, pred, n,
                   round(CAST(n AS DOUBLE) /
                         (SELECT sum(n) FROM cells), 6) AS share
            FROM cells ORDER BY gold, pred"""))

  // ------------- curate_soft_dedup: reweight instead of drop

  private val softDedup = Q(
    "curate_soft_dedup",
    "Soft deduplication — reweight duplicate clusters by 1/size " +
      "instead of dropping members (SoftDeDup: keeps the distribution " +
      "smooth where hard dedup cliffs it): docs cluster on the order-" +
      "insensitive token-set fingerprint, every member carries weight " +
      "1/cluster_size, and the per-source report compares raw vs " +
      "effective (weighted) token mass. Two keyed shuffles " +
      "(fingerprint clusters, source rollup); weights are exact " +
      "rationals carried as micro units.",
    (s, d) => {
      val docs = t(s, d, "documents")
        .select(col("doc_id"), col("source"),
          size(split(col("text"), " ")).cast(LongType).as("tk"),
          md5(concat_ws(" ",
            array_sort(array_distinct(split(col("text"), " ")))))
            .as("fp"))
      val cl = docs.groupBy("fp").agg(count(lit(1)).as("csz"))
      docs.join(cl, "fp")
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("csz") > 1, 1L).otherwise(0L)).as("dup_members"),
          sum("tk").as("raw_tokens"),
          sum(round(col("tk").cast(DoubleType) * 1e6 / col("csz"), 0)
            .cast(LongType)).as("eff_tokens_micro"))
        .transform(graft.engine.Ops.reportSort("source"))
    },
    Some("""WITH docs AS (
              SELECT doc_id, source,
                     CAST(len(string_split(text, ' ')) AS BIGINT) AS tk,
                     md5(array_to_string(list_sort(list_distinct(
                       string_split(text, ' '))), ' ')) AS fp
              FROM documents),
            cl AS (SELECT fp, count(*) AS csz FROM docs GROUP BY fp)
            SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(CASE WHEN csz > 1 THEN 1 ELSE 0 END) AS BIGINT)
                     AS dup_members,
                   CAST(sum(tk) AS BIGINT) AS raw_tokens,
                   CAST(sum(CAST(round(CAST(tk AS DOUBLE) * 1e6 / csz, 0)
                     AS BIGINT)) AS BIGINT) AS eff_tokens_micro
            FROM docs JOIN cl USING (fp)
            GROUP BY source ORDER BY source"""))

  val all: Seq[Q] =
    Seq(ahashNeardup, dedupNorm, pareto, langidConfusion, softDedup)
}
