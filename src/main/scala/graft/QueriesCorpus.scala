package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

import graft.engine.Engine
import graft.operators.{AsofJoin, Dedup, TopKAggregator, TextAnalysis => TA}

/** Corpus-preparation tier, round 2 continued: the operators between a raw
  * document table and a training run — chunking, sequence packing,
  * repetition-based quality filtering, a bounded inverted index — plus the
  * forward as-of join completing [[graft.operators.AsofJoin]].
  *
  * Cross-engine determinism notes specific to this tier:
  *  - single IEEE divisions of identical integer operands are bit-exact on
  *    both engines (correctly-rounded), so ratio columns ship UNROUNDED —
  *    `round(x, 6)` would be the riskier choice (HALF_UP vs HALF_EVEN on
  *    exactly-representable midpoints like 1/128);
  *  - threshold flags compare integers (5·cnt <= n), never floats;
  *  - DuckDB list slices are 1-based inclusive; Spark `slice` is
  *    (start, length) — both clamp at the end of the list.
  */
object QueriesCorpus {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Engine.table(s, dir, name)

  // -------------------------------------------------- text_chunk: windowing

  private val ChunkLen = 50
  private val ChunkStride = 40

  private val chunk = Q(
    "text_chunk",
    "Document chunking into fixed 50-token windows with stride 40 (10-token " +
      "overlap) — the pre-tokenization split feeding a trainer. Map-only: " +
      "sequence+posexplode inside the scan stage, zero shuffles at any " +
      "corpus size; chunk identity ships as a content hash so the output " +
      "stays narrow.",
    (s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"), TA.tokens(col("text")).as("toks"))
        .select(col("doc_id"), col("toks"),
          posexplode(sequence(lit(1), size(col("toks")), lit(ChunkStride)))
            .as(Seq("chunk_idx", "start")))
        .select(col("doc_id"), col("chunk_idx"),
          least(lit(ChunkLen), size(col("toks")) - col("start") + 1).as("n_toks"),
          md5(concat_ws(" ", slice(col("toks"), col("start"), lit(ChunkLen))))
            .as("chunk_hash"))
        .orderBy("doc_id", "chunk_idx"),
    Some(s"""WITH tk AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
             ex AS (SELECT doc_id, toks,
                           unnest(range(1, len(toks) + 1, $ChunkStride)) AS start
                    FROM tk)
             SELECT doc_id, CAST((start - 1) // $ChunkStride AS INT) AS chunk_idx,
                    CAST(least($ChunkLen, len(toks) - start + 1) AS INT) AS n_toks,
                    md5(array_to_string(toks[start:start + ${ChunkLen - 1}], ' '))
                      AS chunk_hash
             FROM ex ORDER BY doc_id, chunk_idx"""))

  // ------------------------------------- curate_pack_sequences: seq packing

  private val SeqLen = 8192L

  /** Core of [[pack]], parameterized on the sequence length so specs can
    * exercise document-spanning with a small L. Input needs (source,
    * pbucket, h, doc_id, ntok); output is per-sequence composition
    * stats. A doc whose token span crosses a sequence boundary is SPLIT:
    * it contributes `least(end,(b+1)L) − greatest(start,bL)` tokens to
    * every sequence b it touches — so every sequence except the last of
    * a bucket holds exactly L tokens, seq ids are dense, and the stats
    * describe what a trainer actually packs. The boundary-bin explode is
    * bounded by ntok/L + 1 rows per doc.
    */
  private[graft] def packSpans(docs: DataFrame, seqLen: Long): DataFrame = {
    val w = Window.partitionBy("source", "pbucket").orderBy("h", "doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .withColumn("start", coalesce(sum("ntok").over(w), lit(0L)))
      .withColumn("fin", col("start") + col("ntok"))
      .select(col("source"), col("pbucket"), col("start"), col("fin"),
        explode(sequence(expr(s"start div $seqLen"),
          expr(s"(fin - 1) div $seqLen"))).as("seq_id"))
      .withColumn("tok_in_seq",
        least(col("fin"), (col("seq_id") + 1) * seqLen) -
          greatest(col("start"), col("seq_id") * seqLen))
      .groupBy("source", "pbucket", "seq_id")
      .agg(count(lit(1)).as("n_docs"), sum("tok_in_seq").as("n_tokens"))
      .orderBy("source", "pbucket", "seq_id")
  }

  private val pack = Q(
    "curate_pack_sequences",
    "Sequence packing: concatenate the corpus in a deterministic order " +
      "and chop into 8192-token training sequences — each doc's start " +
      "offset is a prefix sum of token counts; docs crossing a sequence " +
      "boundary are split across the sequences they touch, so every " +
      "sequence but a bucket's last holds exactly 8192 tokens. Order is " +
      "(stable hash, doc_id) within (source, hash-bucket): the prefix " +
      "sum only ever spans ONE bucket's rows, so at 100 TB each window " +
      "partition is corpus_size/(sources·buckets), not a global sort. " +
      "Output is per-sequence composition stats.",
    (s, d) => {
      val docs = t(s, d, "documents").select(
        col("doc_id"), col("source"),
        size(TA.tokens(col("text"))).cast(LongType).as("ntok"),
        Dedup.tokenId(col("doc_id").cast("string")).as("h"))
      packSpans(docs.withColumn("pbucket", pmod(col("h"), lit(8))), SeqLen)
    },
    Some(s"""WITH dcs AS (SELECT doc_id, source,
                            CAST(len(string_split(text, ' ')) AS BIGINT) AS ntok,
                            ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT AS h
                          FROM documents),
             o AS (SELECT source, h % 8 AS pbucket, ntok,
                          CAST(coalesce(sum(ntok) OVER (
                            PARTITION BY source, h % 8 ORDER BY h, doc_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                            AS BIGINT) AS start
                   FROM dcs),
             sp AS (SELECT source, pbucket, start, start + ntok AS fin,
                           unnest(range(start // $SeqLen,
                                        (start + ntok - 1) // $SeqLen + 1)) AS seq_id
                    FROM o)
             SELECT source, pbucket, CAST(seq_id AS BIGINT) AS seq_id,
                    CAST(count(*) AS BIGINT) AS n_docs,
                    CAST(sum(least(fin, (seq_id + 1) * $SeqLen)
                             - greatest(start, seq_id * $SeqLen)) AS BIGINT) AS n_tokens
             FROM sp GROUP BY source, pbucket, seq_id
             ORDER BY source, pbucket, seq_id"""))

  // ------------------------------------- text_rep_ngram: repetition quality

  private val rep = Q(
    "text_rep_ngram",
    "Repetition-based quality filters (the Gopher-style family): " +
      "top-token fraction plus duplicate bigram/trigram fractions, all " +
      "within-row HOF expressions — map-only, no shuffle. Ratios are " +
      "single IEEE divisions (bit-exact cross-engine, shipped unrounded); " +
      "the keep flag compares INTEGERS (5·top <= n etc.) so thresholding " +
      "never touches float rounding.",
    (s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"), TA.tokens(col("text")).as("toks"))
        .select(col("doc_id"), col("toks"), size(col("toks")).as("n"),
          // top-token count as the longest equal-run of the SORTED array:
          // O(n log n) per row vs the O(n·distinct) count-each-distinct
          // form (quadratic on mostly-unique text). The "" initial prev is
          // safe: a leading "" token starts its run at 0+1 = 1 as needed.
          // The oracle keeps the O(n·u) count form — clearer SQL, and
          // oracle cost doesn't ride the 100 TB path.
          aggregate(array_sort(col("toks")),
            struct(lit("").as("prev"), lit(0).as("run"), lit(0).as("best")),
            (acc, x) => {
              val run = when(x === acc.getField("prev"),
                acc.getField("run") + 1).otherwise(lit(1))
              struct(x.as("prev"), run.as("run"),
                greatest(acc.getField("best"), run).as("best"))
            },
            acc => acc.getField("best")).as("topc"),
          size(TA.ngramShinglesFromToks(col("toks"), 2)).as("d2"),
          size(TA.ngramShinglesFromToks(col("toks"), 3)).as("d3"))
        .select(col("doc_id"), col("n"),
          (col("topc").cast(DoubleType) / col("n")).as("top_tok_frac"),
          when(col("n") >= 2,
            lit(1.0) - col("d2").cast(DoubleType) / (col("n") - 1))
            .otherwise(lit(0.0)).as("dup_bigram_frac"),
          when(col("n") >= 3,
            lit(1.0) - col("d3").cast(DoubleType) / (col("n") - 2))
            .otherwise(lit(0.0)).as("dup_trigram_frac"),
          (col("topc") * 5 <= col("n") &&
            (col("n") < 2 || (col("n") - 1 - col("d2")) * 10 <= (col("n") - 1) * 3) &&
            (col("n") < 3 || (col("n") - 2 - col("d3")) * 4 <= col("n") - 2))
            .as("keep"))
        .orderBy("doc_id"),
    Some("""WITH tk AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
            m AS (SELECT doc_id, len(toks) AS n,
                         list_max(list_transform(list_distinct(toks),
                           u -> len(list_filter(toks, x -> x = u)))) AS topc,
                         len(list_distinct([array_to_string(toks[i+1:i+2], ' ')
                                            FOR i IN range(0, len(toks) - 1)])) AS d2,
                         len(list_distinct([array_to_string(toks[i+1:i+3], ' ')
                                            FOR i IN range(0, len(toks) - 2)])) AS d3
                  FROM tk)
            SELECT doc_id, CAST(n AS INT) AS n,
                   CAST(topc AS DOUBLE) / n AS top_tok_frac,
                   CASE WHEN n >= 2 THEN CAST(1 AS DOUBLE) - CAST(d2 AS DOUBLE) / (n - 1)
                        ELSE CAST(0 AS DOUBLE) END AS dup_bigram_frac,
                   CASE WHEN n >= 3 THEN CAST(1 AS DOUBLE) - CAST(d3 AS DOUBLE) / (n - 2)
                        ELSE CAST(0 AS DOUBLE) END AS dup_trigram_frac,
                   (topc * 5 <= n
                    AND (n < 2 OR (n - 1 - d2) * 10 <= (n - 1) * 3)
                    AND (n < 3 OR (n - 2 - d3) * 4 <= n - 2)) AS keep
            FROM m ORDER BY doc_id"""))

  // -------------------------------- text_inverted_index: bounded postings

  private val invIdx = Q(
    "text_inverted_index",
    "Bounded inverted-index build: per term, document frequency AND a " +
      "≤5-doc posting sample in ONE groupBy pass — the sample rides the " +
      "typed top-k Aggregator (O(k) state, map-side partial agg; score " +
      "= -doc_id so 'top' = smallest ids), never a collect_list. One " +
      "term-keyed shuffle carrying ≤k+1 values per map-side group; " +
      "stopword-grade skew is absorbed by the partial buffers. Real " +
      "index shards would sink per term-range — the build plan is this.",
    (s, d) => {
      import s.implicits._
      val topk = TopKAggregator.topK(5)
      t(s, d, "documents")
        .select(explode(array_distinct(TA.tokens(col("text")))).as("term"),
          col("doc_id"))
        .as[(String, Long)]
        .groupByKey(_._1)
        .mapValues(p => (p._2, -p._2.toDouble))
        .agg(topk.toColumn.name("top"), count(lit(1)).as[Long].name("df"))
        .map { case (term, top, df) =>
          (term, df, top.map(_._1).sorted.mkString(","))
        }
        .toDF("term", "df", "sample_postings")
        .filter(col("df") >= 3)
        .transform(graft.engine.Ops.reportSort("term"))
    },
    Some("""WITH p AS (SELECT doc_id,
                              unnest(list_distinct(string_split(text, ' '))) AS term
                       FROM documents)
            SELECT term, CAST(count(*) AS BIGINT) AS df,
                   array_to_string(list_transform(
                     list_sort(list(doc_id))[1:5], x -> CAST(x AS VARCHAR)), ',')
                     AS sample_postings
            FROM p GROUP BY term HAVING count(*) >= 3 ORDER BY term"""))

  // ------------------------------------------ j17: forward as-of join

  private val j17 = Q(
    "j17_asof_forward",
    "Forward as-of join: each event matched to the NEXT order of the same " +
      "key at-or-after its day, via operators.AsofJoin.forward — the same " +
      "union-merge shape as j12 (one O(|events|+|orders|) shuffle on the " +
      "key) with the window traversing time DESCENDING; ties resolve to " +
      "the smallest order key. The oracle enumerates the pair space " +
      "(min struct over a range join) — the union-merge never does.",
    (s, d) => {
      val ev = t(s, d, "events")
        .filter(col("event_id") % 4 === 0)
        .select(col("event_id"), (col("user_id") % 100).as("k"),
          date_trunc("day", col("ts")).as("day"))
      val ord = t(s, d, "orders")
        .select((col("o_custkey") % 100).as("k"),
          col("o_orderdate").as("odate"),
          col("o_orderkey").as("okey"))
      AsofJoin.forward(ev, ord,
          keyCols = Seq("k"), leftTime = "day", rightTime = "odate",
          carryCols = Seq("odate", "okey"), rightOrder = Seq("okey"))
        .select(col("event_id"), col("k"),
          col("asof_odate").as("next_date"), col("asof_okey").as("next_order"))
        .orderBy("event_id")
    },
    Some("""SELECT event_id, k, m.odate AS next_date, m.okey AS next_order
            FROM (
              SELECT e.event_id, e.k,
                     min(struct_pack(odate := o.odate, okey := o.o_orderkey)) AS m
              FROM (SELECT event_id, user_id % 100 AS k,
                           date_trunc('day', ts) AS day
                    FROM events WHERE event_id % 4 = 0) e
              LEFT JOIN (SELECT o_custkey % 100 AS k, o_orderdate AS odate,
                                o_orderkey FROM orders) o
                ON e.k = o.k AND o.odate >= e.day
              GROUP BY e.event_id, e.k)
            ORDER BY event_id"""))

  // -------------------------------------- curate_domain_mix: target mixing

  private val mix = Q(
    "curate_domain_mix",
    "Domain mixing to target proportions: per-source weights (wt = " +
      "src_idx % 5 + 1) define the mix; the max FEASIBLE corpus size is " +
      "T = min_i(cnt_i * W div wt_i) (the binding source runs out first), " +
      "per-source quota = wt_i * T div W — all integer arithmetic, so " +
      "both engines agree exactly. Selection within a source is the " +
      "content-stable hash rank (same reproducibility contract as " +
      "curate_stratified_sample). The quota table is S rows (one per " +
      "source) built from one partial-agg'd count — broadcast back, so " +
      "the corpus-side pass is map+window only. At web scale the exact " +
      "per-source rank composes with the hash-rate prefilter " +
      "(keep hv % M < ceil(quota/cnt * M) + margin) so the window input " +
      "is ~quota rows per source, not cnt.",
    (s, d) => {
      val docs = t(s, d, "documents")
      val per = docs.groupBy("source").agg(count(lit(1)).as("cnt"))
        .withColumn("wt",
          substring(col("source"), 4, 10).cast(LongType) % 5 + 1)
      val sized = per.crossJoin(broadcast(per.agg(sum("wt").as("wsum"))))
      val tot = sized.agg(min(expr("cnt * wsum div wt")).as("tot"))
      val quotas = sized.crossJoin(broadcast(tot))
        .select(col("source"), expr("wt * tot div wsum").as("quota"))
      val w = Window.partitionBy("source").orderBy(col("hv"), col("doc_id"))
      docs.join(broadcast(quotas), "source")
        .withColumn("hv", Dedup.tokenId(col("doc_id").cast("string")))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= col("quota"))
        .select(col("source"), col("doc_id"))
        .transform(graft.engine.Ops.reportSort("source", "doc_id"))
    },
    Some("""WITH per AS (SELECT source,
                    CAST(substr(source, 4, 10) AS BIGINT) % 5 + 1 AS wt,
                    count(*) AS cnt
             FROM documents GROUP BY source),
            s AS (SELECT CAST(sum(wt) AS BIGINT) AS wsum FROM per),
            t AS (SELECT min(cnt * wsum // wt) AS tot FROM per, s),
            q AS (SELECT source, wt * tot // wsum AS quota FROM per, s, t),
            h AS (SELECT doc_id, source,
                   ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                     AS hv
                  FROM documents)
            SELECT source, doc_id FROM (
              SELECT h.source, h.doc_id, q.quota,
                     row_number() OVER (PARTITION BY h.source
                                        ORDER BY hv, doc_id) AS rk
              FROM h JOIN q USING (source))
            WHERE rk <= quota
            ORDER BY source, doc_id"""))

  // --------------------------- dedup_substring: cross-doc repeated spans

  private val GramN = 8

  private val subDup = Q(
    "dedup_substring",
    "Cross-document repeated span detection at fixed 8-token granularity " +
      "— the n-gram reduction of exact substring dedup (a suffix-array " +
      "pass finds maximal repeats; fixed-length spans find the same " +
      "boilerplate with a groupBy instead of a global sort). Spans are " +
      "dedup'd WITHIN the doc before the explode (array_distinct in the " +
      "scan stage), so the single shuffle carries one row per (doc, " +
      "distinct span) and the per-span doc count is a plain count — " +
      "never count-distinct. The synthetic corpus is collision-free " +
      "word salad, so shared boilerplate is PLANTED on two doc strata " +
      "(%7, %11 — docs in both strata also share the junction spans), " +
      "mirrored in the oracle; top-100 by (n_docs, hash) bounds the " +
      "output at any corpus size.",
    (s, d) => {
      val plant1 = " legal notice all rights reserved by the corpus packer tool"
      val plant2 = " subscribe to our newsletter for updates and exclusive offers today"
      val planted = concat(col("text"),
        when(col("doc_id") % 7 === 0, lit(plant1)).otherwise(lit("")),
        when(col("doc_id") % 11 === 0, lit(plant2)).otherwise(lit("")))
      t(s, d, "documents")
        .select(col("doc_id"), TA.tokens(planted).as("toks"))
        .select(col("doc_id"),
          explode(TA.ngramShinglesFromToks(col("toks"), GramN)).as("gram"))
        .groupBy("gram")
        .agg(count(lit(1)).as("n_docs"), min("doc_id").as("first_doc"))
        .filter(col("n_docs") >= 2)
        .select(md5(col("gram")).as("gram_hash"), col("n_docs"),
          col("first_doc"))
        .orderBy(col("n_docs").desc, col("gram_hash"))
        .limit(100)
    },
    Some("""WITH pl AS (SELECT doc_id, text ||
                   CASE WHEN doc_id % 7 = 0
                     THEN ' legal notice all rights reserved by the corpus packer tool'
                     ELSE '' END ||
                   CASE WHEN doc_id % 11 = 0
                     THEN ' subscribe to our newsletter for updates and exclusive offers today'
                     ELSE '' END AS txt
                 FROM documents),
            tk AS (SELECT doc_id, string_split(txt, ' ') AS toks FROM pl),
            g AS (SELECT doc_id,
                   unnest(list_distinct(CASE WHEN len(toks) >= 8
                     THEN list_transform(range(1, len(toks) - 6),
                            i -> array_to_string(toks[i:i+7], ' '))
                     ELSE []::VARCHAR[] END)) AS gram
                  FROM tk)
            SELECT md5(gram) AS gram_hash, count(*) AS n_docs,
                   min(doc_id) AS first_doc
            FROM g GROUP BY gram HAVING count(*) >= 2
            ORDER BY n_docs DESC, gram_hash LIMIT 100"""))

  // ------------------------------------------- text_bm25_topk: retrieval

  private val Bm25Terms = Seq("spark", "hash", "merge", "window")

  private val bm25 = Q(
    "text_bm25_topk",
    "BM25 retrieval (k1=1.2, b=0.75) for a fixed 4-term query over the " +
      "document corpus: tf from one (doc, term) groupBy of the term-" +
      "filtered token stream (the explode keeps ONLY query terms, so the " +
      "shuffle is |matches|, not |tokens|), df/N/avgdl as broadcast " +
      "1-row/4-row aggregates, top-20 via TakeOrdered. Per-doc scores " +
      "sum the 4 term contributions in FIXED query order (chained adds " +
      "over per-term conditional aggregates) — a shuffle-order float sum " +
      "would differ in low bits run-to-run and across engines; ln() can " +
      "differ by 1 ulp cross-engine, so scores round to 3 decimals.",
    (s, d) => {
      val k1 = 1.2
      val b = 0.75
      val docs = t(s, d, "documents")
        .select(col("doc_id"), TA.tokens(col("text")).as("toks"))
        .select(col("doc_id"), col("toks"), size(col("toks")).as("dl"))
      val stats = docs.agg(count(lit(1)).as("n_docs"),
        (sum("dl").cast(DoubleType) / count(lit(1))).as("avgdl"))
      val hits = docs
        .select(col("doc_id"), col("dl"),
          explode(filter(col("toks"),
            tk => tk.isin(Bm25Terms: _*))).as("term"))
      val tf = hits.groupBy("doc_id", "term")
        .agg(count(lit(1)).cast(DoubleType).as("tf"), max("dl").as("dl"))
      val df = tf.groupBy("term").agg(count(lit(1)).cast(DoubleType).as("df"))
      val scored = tf
        .join(broadcast(df), "term")
        .crossJoin(broadcast(stats))
        .withColumn("idf",
          log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1.0))
        .withColumn("s",
          col("idf") * col("tf") * lit(k1 + 1.0) /
            (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))
      val perTerm = Bm25Terms.map(tm =>
        coalesce(max(when(col("term") === tm, col("s"))), lit(0.0)))
      scored.groupBy("doc_id")
        .agg(round(perTerm.reduce(_ + _), 3).as("bm25"))
        .orderBy(col("bm25").desc, col("doc_id"))
        .limit(20)
    },
    Some("""WITH tk AS (SELECT doc_id, string_split(text, ' ') AS toks
                        FROM documents),
            d AS (SELECT doc_id, len(toks) AS dl, toks FROM tk),
            st AS (SELECT count(*) AS n_docs,
                          CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM d),
            hits AS (SELECT doc_id, dl, unnest(list_filter(toks,
                       x -> x IN ('spark', 'hash', 'merge', 'window'))) AS term
                     FROM d),
            tf AS (SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf,
                          max(dl) AS dl
                   FROM hits GROUP BY doc_id, term),
            df AS (SELECT term, CAST(count(*) AS DOUBLE) AS df
                   FROM tf GROUP BY term),
            sc AS (SELECT tf.doc_id, tf.term,
                          ln((n_docs - df + 0.5) / (df + 0.5) + 1.0) * tf *
                            (1.2 + 1.0) /
                            (tf + 1.2 * (1.0 - 0.75 + 0.75 * tf.dl / avgdl))
                            AS s
                   FROM tf JOIN df USING (term), st)
            SELECT doc_id,
                   round(coalesce(max(CASE WHEN term = 'spark' THEN s END), 0.0)
                       + coalesce(max(CASE WHEN term = 'hash' THEN s END), 0.0)
                       + coalesce(max(CASE WHEN term = 'merge' THEN s END), 0.0)
                       + coalesce(max(CASE WHEN term = 'window' THEN s END), 0.0),
                     3) AS bm25
            FROM sc GROUP BY doc_id
            ORDER BY bm25 DESC, doc_id LIMIT 20"""))

  // ----------------------------------------- text_winnow: MOSS fingerprints

  private val WinK = 4 // tokens per gram
  private val WinW = 5 // gram hashes per winnowing window

  private val winnow = Q(
    "text_winnow",
    "Winnowing fingerprints (the MOSS scheme): hash every 4-token gram, " +
      "then keep the MIN hash of each 5-hash window — any shared span of " +
      "w+k-1 = 8 tokens is guaranteed to share a fingerprint, at ~1/w the " +
      "fingerprint density of full gram hashing. Entirely within-row HOFs " +
      "over the scan: map-only, zero shuffles at any corpus size (the " +
      "cross-doc bucket join over fingerprints is dedup_substring's " +
      "groupBy shape, at 1/w the shuffle volume). Gram hashing is " +
      "two-level: ONE md5 per token (projected before the gram pass — " +
      "lambda bodies get no CSE), then each gram id is a base-31 integer " +
      "polynomial over its 4 token ids — HOF lambdas are interpreted per " +
      "element, so the earlier per-gram slice+concat+md5 paid string " +
      "allocation and a digest per gram (~2.4× slower at sf0.1); 32-bit " +
      "ids keep 31³·id < 2^63, so DuckDB's checked BIGINT arithmetic " +
      "never overflows. Per-doc digest of the sorted fingerprint set " +
      "keeps the output narrow and the comparison exact.",
    (s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"), TA.tokens(col("text")).as("toks"))
        .select(col("doc_id"),
          transform(col("toks"), tk => Dedup.tokenId(tk)).as("ids"))
        .select(col("doc_id"),
          when(size(col("ids")) >= WinK,
            transform(sequence(lit(1), size(col("ids")) - (WinK - 1)),
              i => ((element_at(col("ids"), i) * 31
                + element_at(col("ids"), i + 1)) * 31
                + element_at(col("ids"), i + 2)) * 31
                + element_at(col("ids"), i + 3)))
            .otherwise(array().cast("array<bigint>")).as("hs"))
        .select(col("doc_id"),
          when(size(col("hs")) >= WinW,
            array_distinct(transform(
              sequence(lit(1), size(col("hs")) - (WinW - 1)),
              i => array_min(slice(col("hs"), i, lit(WinW))))))
            .otherwise(array().cast("array<bigint>")).as("fps"))
        .select(col("doc_id"), size(col("fps")).as("n_fps"),
          md5(concat_ws(",",
            transform(array_sort(col("fps")), x => x.cast("string"))))
            .as("fp_digest"))
        .orderBy("doc_id"),
    Some("""WITH tk AS (SELECT doc_id,
                   list_transform(string_split(text, ' '),
                     t -> ('0x' || substr(md5(t), 1, 8))::BIGINT) AS ids
                        FROM documents),
            h AS (SELECT doc_id,
                   CASE WHEN len(ids) >= 4
                     THEN list_transform(range(1, len(ids) - 2),
                       i -> ((ids[CAST(i AS INT)] * 31
                            + ids[CAST(i AS INT) + 1]) * 31
                            + ids[CAST(i AS INT) + 2]) * 31
                            + ids[CAST(i AS INT) + 3])
                     ELSE []::BIGINT[] END AS hs
                  FROM tk),
            f AS (SELECT doc_id,
                   CASE WHEN len(hs) >= 5
                     THEN list_distinct(list_transform(range(1, len(hs) - 3),
                            i -> list_min(hs[i:i+4])))
                     ELSE []::BIGINT[] END AS fps
                  FROM h)
            SELECT doc_id, CAST(len(fps) AS INT) AS n_fps,
                   md5(array_to_string(list_transform(list_sort(fps),
                         x -> CAST(x AS VARCHAR)), ',')) AS fp_digest
            FROM f ORDER BY doc_id"""))

  // -------------------------------------- text_vocab_oov: vocab coverage

  private val oov = Q(
    "text_vocab_oov",
    "Vocabulary coverage / OOV rate: top-16 corpus vocabulary by " +
      "frequency (tie-broken by token — deterministic), collapsed to ONE " +
      "16-element array row and broadcast back into the scan, where a " +
      "per-row HOF filter counts each doc's out-of-vocabulary tokens " +
      "in place. ONE bounded shuffle total (the vocab groupBy, map-side " +
      "partials collapsing to |vocab| rows per partition) — the per-doc " +
      "side never explodes or re-aggregates: the earlier " +
      "explode→broadcast-join→groupBy(doc_id) shape re-shuffled a " +
      "(pre-aggregated) row per doc and paid join machinery per token; " +
      "membership against a 16-element broadcast array is cheaper than " +
      "either at any corpus size. The rate is one IEEE division of " +
      "exact integers — bit-identical cross-engine, shipped unrounded.",
    (s, d) => {
      val vocab = t(s, d, "documents")
        .select(explode(TA.tokens(col("text"))).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("tok")).limit(16)
        .agg(collect_list(col("tok")).as("vocab"))
      t(s, d, "documents")
        .crossJoin(broadcast(vocab))
        .select(col("doc_id"), TA.tokens(col("text")).as("toks"), col("vocab"))
        .select(col("doc_id"),
          size(col("toks")).cast(LongType).as("n_toks"),
          size(filter(col("toks"),
            tk => not(array_contains(col("vocab"), tk))))
            .cast(LongType).as("n_oov"))
        .select(col("doc_id"), col("n_toks"), col("n_oov"),
          (col("n_oov").cast(DoubleType) / col("n_toks")).as("oov_rate"))
        .transform(graft.engine.Ops.reportSort("doc_id"))
    },
    Some("""WITH ex AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                        FROM documents),
            v AS (SELECT tok FROM (
                    SELECT tok, count(*) AS c FROM ex GROUP BY tok
                    ORDER BY c DESC, tok LIMIT 16)),
            j AS (SELECT ex.doc_id, ex.tok, v.tok AS vtok
                  FROM ex LEFT JOIN v ON ex.tok = v.tok)
            SELECT doc_id, count(*) AS n_toks,
                   count(CASE WHEN vtok IS NULL THEN 1 END) AS n_oov,
                   CAST(count(CASE WHEN vtok IS NULL THEN 1 END) AS DOUBLE)
                     / count(*) AS oov_rate
            FROM j GROUP BY doc_id ORDER BY doc_id"""))

  // --------------------------------- dedup_incremental: batch-vs-corpus

  private val incr = Q(
    "dedup_incremental",
    "Incremental dedup — the daily-ingest shape: a NEW batch (doc_id % 4 " +
      "== 0 stands in for today's crawl) is admitted only if its content " +
      "fingerprint collides with neither the HISTORICAL corpus (the other " +
      "¾) nor an earlier doc of the same batch. Two hash-equi left-anti " +
      "joins on the fingerprint — never a pair space — plus the keep-" +
      "first window WITHIN the batch; at 100 TB the historical side is " +
      "the persisted fingerprint index (bucketed on the hash, so the " +
      "anti join is exchange-free on ingest). Near-dup admission swaps " +
      "the exact fingerprint for minhash band keys — same two-anti-join " +
      "shape. Duplicates are PLANTED: every 20th doc's text is reused " +
      "verbatim by batch docs (batch ids ≡ 0 mod 20 collide with " +
      "history via the %4 split), keeping both rejection paths " +
      "non-vacuous.",
    (s, d) => {
      // plant: batch docs whose id ≡ 0 (mod 20) take the text of the
      // historical doc id+10 (id+10 ≡ 10 mod 20, and ≢ 0 mod 4 when
      // id ≡ 0 mod 20 ⇒ id+10 ≡ 2 mod 4 — always historical), so exact
      // cross-split duplicates exist by construction
      val docs = t(s, d, "documents")
      val donors = docs.select((col("doc_id") - 10).as("did"),
        col("text").as("donor_text"))
      val planted = docs
        .join(donors.hint("broadcast"), col("doc_id") === col("did"), "left")
        .select(col("doc_id"), col("source"),
          // second plant: %24==12 docs are all ≡0 mod 4 (batch-only), and
          // share one literal payload no historical doc has — so the
          // within-batch keep-first window has real work even though every
          // cross-split duplicate dies at the anti join first
          when(col("doc_id") % 20 === 0 && col("donor_text").isNotNull,
            col("donor_text"))
            .when(col("doc_id") % 24 === 12,
              lit("shared batch boilerplate duplicate payload"))
            .otherwise(col("text")).as("text"))
      val fp = TA.fingerprintExact(col("text"))
      val batch = planted.filter(col("doc_id") % 4 === 0)
        .select(col("doc_id"), col("source"), fp.as("fp"))
      val hist = planted.filter(col("doc_id") % 4 =!= 0)
        .select(fp.as("fp")).distinct()
      val w = Window.partitionBy("fp").orderBy("doc_id")
      batch.join(hist, Seq("fp"), "left_anti")
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") === 1)
        .select(col("doc_id"), col("source"), col("fp"))
        .transform(graft.engine.Ops.reportSort("doc_id"))
    },
    Some("""WITH planted AS (
              SELECT d.doc_id, d.source,
                     CASE WHEN d.doc_id % 20 = 0 AND don.donor_text IS NOT NULL
                       THEN don.donor_text
                     WHEN d.doc_id % 24 = 12
                       THEN 'shared batch boilerplate duplicate payload'
                     ELSE d.text END AS text
              FROM documents d
              LEFT JOIN (SELECT doc_id - 10 AS did, text AS donor_text
                         FROM documents) don ON d.doc_id = don.did),
            batch AS (SELECT doc_id, source, md5(lower(trim(text))) AS fp
                      FROM planted WHERE doc_id % 4 = 0),
            hist AS (SELECT DISTINCT md5(lower(trim(text))) AS fp
                     FROM planted WHERE doc_id % 4 <> 0)
            SELECT doc_id, source, fp FROM (
              SELECT b.doc_id, b.source, b.fp,
                     row_number() OVER (PARTITION BY b.fp ORDER BY b.doc_id)
                       AS rk
              FROM batch b ANTI JOIN hist h ON b.fp = h.fp)
            WHERE rk = 1
            ORDER BY doc_id"""))

  // ------------------------------------------------------------------- all

  val all: Seq[Q] =
    Seq(chunk, pack, rep, invIdx, j17, mix, subDup, bm25, winnow, oov, incr)
}
