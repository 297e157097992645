package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

import graft.engine.Engine
import graft.operators.Similarity

/** Round-3 batch 4: corpus-LM quality scoring, Matryoshka embedding
  * truncation accounting, and the quantile-sketch accuracy bridge.
  */
object QueriesR3d {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Engine.table(s, dir, name)

  // ------------- text_unigram_logprob: corpus-LM document scoring

  private val unigramLp = Q(
    "text_unigram_logprob",
    "Unigram language-model scoring — the perplexity-proxy quality gate " +
      "(CCNet/KenLM pattern, reduced to the LM the corpus itself " +
      "defines): train = one global token-count pass; score = every " +
      "doc's mean negative log2 token probability (bits/token — high " +
      "means rare-token soup, low means boilerplate). Determinism is " +
      "the entropy query's integer bridge: each DISTINCT token's " +
      "-log2(cnt/total) is rounded ONCE to exact BIGINT micro-bits in " +
      "the model table, so per-doc scores are integer sums — " +
      "accumulation order can never matter. The scoring join is " +
      "token→model (shuffle join here; at 100 TB the model is " +
      "vocabulary-sized — broadcast it and scoring is map-only, the " +
      "curate_contamination discipline). total comes from a 1-row " +
      "crossJoin(broadcast), not a driver scalar.",
    (s, d) => {
      val toks = t(s, d, "documents")
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      val cnts = toks.groupBy("tok").agg(count(lit(1)).as("cnt"))
      val total = cnts.agg(sum("cnt").as("total"))
      val model = cnts.crossJoin(broadcast(total))
        .select(col("tok"),
          round(-log2(col("cnt").cast(DoubleType) / col("total").cast(DoubleType))
            * 1e6, 0).cast(LongType).as("nll_micro"))
      toks.join(model, "tok")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_toks"), sum("nll_micro").as("s_micro"))
        .select(col("doc_id"), col("n_toks"), col("s_micro"),
          round(col("s_micro") / (col("n_toks") * lit(1e6)), 3).as("bits_per_tok"))
        .transform(graft.engine.Ops.reportSort("doc_id"))
    },
    Some("""WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                          FROM documents),
                 cnts AS (SELECT tok, count(*) AS cnt FROM toks GROUP BY tok),
                 tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM cnts),
                 model AS (SELECT tok,
                             CAST(round(-log2(CAST(cnt AS DOUBLE)
                                              / CAST(total AS DOUBLE))
                                        * 1000000, 0) AS BIGINT) AS nll_micro
                           FROM cnts, tot),
                 agg AS (SELECT doc_id, count(*) AS n_toks,
                                CAST(sum(nll_micro) AS BIGINT) AS s_micro
                         FROM toks JOIN model USING (tok) GROUP BY doc_id)
            SELECT doc_id, n_toks, s_micro,
                   round(s_micro / (n_toks * 1000000.0), 3) AS bits_per_tok
            FROM agg ORDER BY doc_id"""))

  // --------------- sim_matryoshka: truncated-embedding energy audit

  private val matryoshka = Q(
    "sim_matryoshka",
    "Matryoshka (MRL) truncation audit: how much of each embedding's " +
      "energy the first 16 of 64 dimensions retain, plus the leading " +
      "component of the renormalized stub — the accounting that decides " +
      "whether a cheap prefix index (IVF/LSH over 16 dims, full-vector " +
      "rerank) is viable. Map-only: slice + the same left-fold dot both " +
      "engines compute bit-identically (dedup_embedding_cosine's " +
      "bridge), ratios rounded at 6. No shuffle at any corpus size.",
    (s, d) => {
      val vec = Similarity.quantize(Similarity.toDoubleVec(col("embedding")))
      val v16 = slice(vec, 1, 16)
      val e64 = Similarity.dotComposed(vec, vec)
      val e16 = Similarity.dotComposed(v16, v16)
      t(s, d, "embeddings")
        .select(col("vec_id"),
          round(e16 / e64, 6).as("energy_frac"),
          round(element_at(v16, 1) / sqrt(e16), 6).as("c1_norm"))
        .transform(graft.engine.Ops.reportSort("vec_id"))
    },
    Some("""WITH e AS (SELECT vec_id,
                       list_transform(embedding::DOUBLE[],
                         x -> round(x * 1048576)) AS v
                     FROM embeddings)
            SELECT vec_id,
                   round(list_dot_product(v[1:16], v[1:16])
                         / list_dot_product(v, v), 6) AS energy_frac,
                   round(v[1] / sqrt(list_dot_product(v[1:16], v[1:16])), 6)
                     AS c1_norm
            FROM e ORDER BY vec_id"""))

  // ------------- a24: quantile-sketch accuracy bridge (a12 for quantiles)

  private val a24 = Q(
    "a24_quantile_sketch",
    "Mergeable quantile sketches, graded the a12 way: per return flag, " +
      "percentile_approx (Spark's GK-style sketch — partial-aggregatable " +
      "and re-mergeable, the 100 TB path where exact percentiles would " +
      "sort the world) at p50/p90/p99 against the exact interpolated " +
      "percentile, emitting per-quantile within-1% booleans — " +
      "constant-true on any engine pair at the sketch's rank error " +
      "(n/accuracy ≈ 20 rows at sf0.1). The exact values stay internal: " +
      "cross-engine interpolation arithmetic is not hash-stable, " +
      "booleans are.",
    (s, d) => {
      // even-order half of the table: the EXACT side buffers every value
      // per group (that's the point being made), so the fixture slice is
      // kept to what the contrast needs
      val li = t(s, d, "lineitem")
        .filter(col("l_orderkey") % 2 === 0)
        .select(col("l_returnflag").as("flag"), col("l_extendedprice").as("x"))
      val ap = li.groupBy("flag")
        .agg(percentile_approx(col("x"),
          array(lit(0.5), lit(0.9), lit(0.99)), lit(10000)).as("ap"))
      val ex = li.groupBy("flag")
        .agg(expr("percentile(x, array(0.5D, 0.9D, 0.99D))").as("ex"))
      val nr = li.groupBy("flag").agg(count(lit(1)).as("n_rows"))
      def ok(i: Int) =
        (abs(element_at(col("ap"), i) - element_at(col("ex"), i)) <=
          lit(0.01) * element_at(col("ex"), i))
      nr.join(ap, "flag").join(ex, "flag")
        .select(col("flag"), col("n_rows"),
          ok(1).as("ok50"), ok(2).as("ok90"), ok(3).as("ok99"))
        .transform(graft.engine.Ops.reportSort("flag"))
    },
    Some("""SELECT l_returnflag AS flag, count(*) AS n_rows,
                   true AS ok50, true AS ok90, true AS ok99
            FROM lineitem WHERE l_orderkey % 2 = 0
            GROUP BY l_returnflag ORDER BY flag"""))

  // ---------- curate_mix_temperature: α-temperature source flattening

  private val mixTemp = Q(
    "curate_mix_temperature",
    "Temperature-flattened mixing (the multilingual/source-balance " +
      "sampler: quota ∝ n^α with α = 0.5, upweighting rare strata " +
      "relative to their raw share — XLM-R's language sampling, applied " +
      "to the skewed event_type distribution): per-type weights are " +
      "round(sqrt(n)·1e6) — sqrt is IEEE-correctly-rounded on every " +
      "platform, and once the weight is an exact BIGINT all downstream " +
      "arithmetic (weight sum, quota = w·T div W) is integer-exact on " +
      "both engines. Selection within a type is the content-stable hash " +
      "rank (curate_domain_mix's reproducibility contract). The quota " +
      "table is one row per stratum — broadcast; the data-side pass is " +
      "map + one per-stratum window.",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val ev = t(s, d, "events")
      val per = ev.groupBy("event_type").agg(count(lit(1)).as("cnt"))
        .withColumn("wt", round(sqrt(col("cnt")) * 1e6, 0).cast(LongType))
      val sized = per.crossJoin(broadcast(per.agg(sum("wt").as("wsum"))))
      val quotas = sized
        .select(col("event_type"), col("cnt"),
          expr("wt * 1000 div wsum").as("quota"))
      val w = Window.partitionBy("event_type").orderBy(col("hv"), col("event_id"))
      ev.join(broadcast(quotas), "event_type")
        .withColumn("hv",
          graft.operators.Dedup.tokenId(col("event_id").cast("string")))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= col("quota"))
        .select(col("event_type"), col("event_id"))
        .transform(graft.engine.Ops.reportSort("event_type", "event_id"))
    },
    Some("""WITH per AS (SELECT event_type, count(*) AS cnt
                         FROM events GROUP BY event_type),
                 pw AS (SELECT event_type, cnt,
                          CAST(round(sqrt(cnt) * 1000000, 0) AS BIGINT) AS wt
                        FROM per),
                 s AS (SELECT CAST(sum(wt) AS BIGINT) AS wsum FROM pw),
                 q AS (SELECT event_type, wt * 1000 // wsum AS quota
                       FROM pw, s),
                 h AS (SELECT event_id, event_type,
                        ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8))::BIGINT
                          AS hv
                       FROM events)
            SELECT event_type, event_id FROM (
              SELECT h.event_type, h.event_id, q.quota,
                     row_number() OVER (PARTITION BY h.event_type
                                        ORDER BY hv, event_id) AS rk
              FROM h JOIN q USING (event_type))
            WHERE rk <= quota
            ORDER BY event_type, event_id"""))

  // ------------------ text_dist_drift: token-distribution drift report

  private val distDrift = Q(
    "text_dist_drift",
    "Distribution-drift attribution between two corpus slices (the " +
      "data-monitoring op a production ingest runs between yesterday's " +
      "and today's crawl): which tokens' relative frequencies moved " +
      "most. Slices are the doc_id parity halves; drift per token is " +
      "|pA − pB| ranked WITHOUT any float: pA − pB = (cntA·totB − " +
      "cntB·totA)/(totA·totB) has a constant positive denominator, so " +
      "ordering by the exact BIGINT cross product |cntA·totB − " +
      "cntB·totA| IS ordering by drift — no libm, no rounding, no " +
      "accumulation anywhere (the JSD scalar was deliberately dropped: " +
      "30k per-token libm roundings stack failure odds; the integer " +
      "rank is exact). One full-outer token join (vocabulary-sized), " +
      "counts broadcastable at scale; top-20 via TakeOrdered.",
    (s, d) => {
      val toks = t(s, d, "documents")
        .select((col("doc_id") % 2 === 0).as("inA"),
          explode(split(col("text"), " ")).as("tok"))
      val a = toks.filter(col("inA")).groupBy("tok")
        .agg(count(lit(1)).as("cnt_a"))
      val b = toks.filter(!col("inA")).groupBy("tok")
        .agg(count(lit(1)).as("cnt_b"))
      val joined = a.join(b, Seq("tok"), "full_outer")
        .select(col("tok"),
          coalesce(col("cnt_a"), lit(0L)).as("cnt_a"),
          coalesce(col("cnt_b"), lit(0L)).as("cnt_b"))
      val tots = joined.agg(sum("cnt_a").as("tot_a"), sum("cnt_b").as("tot_b"))
      joined.crossJoin(broadcast(tots))
        .select(col("tok"), col("cnt_a"), col("cnt_b"),
          abs(col("cnt_a") * col("tot_b") - col("cnt_b") * col("tot_a"))
            .as("drift_x"))
        .orderBy(col("drift_x").desc, col("tok"))
        .limit(20)
    },
    Some("""WITH toks AS (SELECT doc_id % 2 = 0 AS in_a,
                                 unnest(string_split(text, ' ')) AS tok
                          FROM documents),
                 a AS (SELECT tok, count(*) AS cnt_a FROM toks
                       WHERE in_a GROUP BY tok),
                 b AS (SELECT tok, count(*) AS cnt_b FROM toks
                       WHERE NOT in_a GROUP BY tok),
                 j AS (SELECT coalesce(a.tok, b.tok) AS tok,
                              coalesce(cnt_a, 0) AS cnt_a,
                              coalesce(cnt_b, 0) AS cnt_b
                       FROM a FULL OUTER JOIN b ON a.tok = b.tok),
                 t AS (SELECT CAST(sum(cnt_a) AS BIGINT) AS tot_a,
                              CAST(sum(cnt_b) AS BIGINT) AS tot_b FROM j)
            SELECT tok, CAST(cnt_a AS BIGINT) AS cnt_a,
                   CAST(cnt_b AS BIGINT) AS cnt_b,
                   CAST(abs(cnt_a * tot_b - cnt_b * tot_a) AS BIGINT)
                     AS drift_x
            FROM j, t
            ORDER BY drift_x DESC, tok LIMIT 20"""))

  // ------------- curate_upsample_epochs: epoch-weighted repetition

  private val upsample = Q(
    "curate_upsample_epochs",
    "Epoch-weighted upsampling — the complement of curate_domain_mix's " +
      "downsampling cap: every source is brought UP to a fixed target " +
      "row count by repetition (the 'epochs over small high-quality " +
      "sources' lever in LLM data recipes). Per source: full_epochs = " +
      "T div cnt replicas of every doc, plus a hash-ranked rem = " +
      "T mod cnt partial epoch — so output per source is exactly T, " +
      "selection is content-stable, and every step is integer " +
      "arithmetic. The replication is explode(sequence(1, epochs)) — " +
      "map-side row generation, no join amplification; the per-source " +
      "count table is one partial-agg'd groupBy broadcast back.",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val target = 40L
      val docs = t(s, d, "documents")
      val per = docs.groupBy("source").agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy("source").orderBy(col("hv"), col("doc_id"))
      docs.join(broadcast(per), "source")
        .withColumn("hv",
          graft.operators.Dedup.tokenId(col("doc_id").cast("string")))
        .withColumn("rk", row_number().over(w))
        .select(col("source"), col("doc_id"),
          // `div` (integer), not `/` (Column./ is double division)
          explode(sequence(lit(1L),
            expr(s"$target div cnt") +
              when(col("rk") <= lit(target) % col("cnt"), 1L).otherwise(0L)))
            .as("epoch"))
        .transform(graft.engine.Ops.reportSort("source", "doc_id", "epoch"))
    },
    Some("""WITH per AS (SELECT source, count(*) AS cnt
                         FROM documents GROUP BY source),
                 h AS (SELECT doc_id, source,
                        ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                          AS hv
                       FROM documents),
                 r AS (SELECT h.source, h.doc_id, per.cnt,
                              row_number() OVER (PARTITION BY h.source
                                                 ORDER BY hv, doc_id) AS rk
                       FROM h JOIN per USING (source))
            SELECT source, doc_id,
                   unnest(range(1, CAST(40 // cnt
                     + CASE WHEN rk <= 40 % cnt THEN 1 ELSE 0 END
                     + 1 AS BIGINT))) AS epoch
            FROM r
            ORDER BY source, doc_id, epoch"""))

  val all: Seq[Q] =
    Seq(unigramLp, matryoshka, a24, mixTemp, distDrift, upsample)
}
