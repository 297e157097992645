package graft.operators

import graft.engine.Ck.Ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, quality scoring, language-ID heuristics, fingerprinting.
  *
  * Everything is pure Catalyst column expressions (no UDFs): at 100 TB these
  * run inside whole-stage codegen over a parquet scan, embarrassingly
  * parallel, zero shuffles.
  */
object TextAnalysis {

  /** Whitespace tokenizer (the docs corpus is space-separated). */
  def tokens(text: Column): Column = split(text, " ")

  /** BPE-ish pre-tokenizer: letter runs, digit runs, single
    * non-alphanumeric marks — the GPT-2-style pre-tokenization shape
    * (without the learned merge table, which is a model artifact, not an
    * engine operator). The regex is portable across Java regex and RE2 so
    * the DuckDB oracle computes the identical token stream.
    */
  val BpeIshPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

  def tokensBpeIsh(text: Column): Column =
    regexp_extract_all(text, lit(BpeIshPattern), lit(0))

  /** Common-word markers used by the quality / language heuristics. */
  val EnglishStopwords: Seq[String] = Seq("the", "a", "of", "and", "to")

  def stopwordRatio(toks: Column): Column =
    size(filter(toks, t => t.isin(EnglishStopwords: _*))) / size(toks)

  /** Mean token length without an explicit fold: total non-space chars /
    * token count (exact for single-space-separated text).
    */
  def avgTokenLen(text: Column, toks: Column): Column =
    length(regexp_replace(text, " ", "")) / size(toks)

  /** Composite [0,1] quality score: length credit × non-stopword density.
    * Deterministic, SQL-expressible for the oracle. Prefer the
    * toks-based form when the token array is already a projected column
    * (lambda bodies get no CSE — re-tokenizing per metric multiplies
    * the scan cost).
    */
  def qualityScoreFromToks(toks: Column): Column =
    round(least(lit(1.0), size(toks) / lit(100.0)) * (lit(1.0) - stopwordRatio(toks)), 6)

  def qualityScore(text: Column): Column = qualityScoreFromToks(tokens(text))

  /** Language-ID heuristic: density of English marker words. A real
    * pipeline swaps in char-n-gram profiles per language; the operator
    * shape (token filter ratio + threshold) is identical.
    */
  def langIdEnFromToks(toks: Column, threshold: Double = 0.05): Column =
    when(stopwordRatio(toks) > threshold, lit("en")).otherwise(lit("other"))

  def langIdEn(text: Column, threshold: Double = 0.05): Column =
    langIdEnFromToks(tokens(text), threshold)

  /** Word n-gram shingle set over an ALREADY-MATERIALIZED token-array
    * column (same CSE lesson as [[Dedup.bigramShinglesFromToks]], which
    * this generalizes). Docs with fewer than n tokens get an empty set —
    * without the guard, `sequence` counts DOWN (Spark defaults step to
    * -1 when start > stop) and out-of-range `element_at` throws under
    * ANSI mode. DuckDB equivalence:
    * `[array_to_string(toks[i+1:i+n], ' ') FOR i IN range(0, len(toks)-(n-1))]`.
    */
  def ngramShinglesFromToks(toks: Column, n: Int): Column = {
    require(n >= 2, s"ngramShinglesFromToks needs n >= 2, got $n")
    when(size(toks) >= n,
      array_distinct(transform(sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", (0 until n).map(j =>
          element_at(toks, if (j == 0) i else i + j)): _*))))
      .otherwise(array().cast("array<string>"))
  }

  /** Exact content fingerprint: hash of the normalized text. */
  def fingerprintExact(text: Column): Column = md5(lower(trim(text)))

  /** Order-insensitive fuzzy fingerprint: hash of the sorted distinct
    * token set — survives token reordering, the cheap tier before
    * MinHash (see [[Dedup]]).
    */
  def fingerprintTokenSet(text: Column): Column =
    md5(concat_ws(" ", array_sort(array_distinct(tokens(text)))))

  /** The BPE trainer's outer loop: `rounds` iterations of count adjacent
    * symbol pairs → pick the argmax merge (count desc, pair asc —
    * deterministic) → apply it corpus-wide. Returns one row per round:
    * (round, pa, pb, cnt) — the merge table a tokenizer ships, with cnt
    * the CORPUS-INSTANCE pair count.
    *
    * `wordFreq` carries (symstr, freq): DISTINCT words as space-
    * separated symbol strings with their corpus frequencies — the
    * standard trainer compression (sentencepiece/HF do exactly this).
    * Every per-instance pair count is the per-distinct-word count
    * weighted by freq, so results are identical to instance-level
    * counting while the loop's working set shrinks from corpus size to
    * vocabulary size — the 3-round fixture run dropped ~3×, and at
    * 100 TB the loop runs on a table millions of times smaller than
    * the corpus (one groupBy builds it). Each round:
    *
    *  - pair counting explodes adjacent (pa, pb) pairs per distinct
    *    word and sums freq — the groupBy key space is the (growing)
    *    symbol alphabet², collapsed map-side;
    *  - the 1-row argmax is localCheckpoint'ed (it feeds BOTH the merge
    *    table and the rewrite), then broadcast into the rewrite —
    *    `replace(symstr, 'pa pb', papb)`, left-to-right non-overlapping
    *    on both engines (spec-pinned);
    *  - the rewritten vocabulary is localCheckpoint'ed so round N+1
    *    counts materialized symbols instead of N stacked replaces
    *    (the same round-over-round discipline as [[Graph.pageRankInt]]).
    */
  def bpeTrainMerges(wordFreq: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 1, s"bpeTrainMerges needs rounds >= 1, got $rounds")
    var syms = wordFreq.select(col("symstr"), col("freq"))
      .ckpt(true)
    var merges: DataFrame = null
    for (r <- 1 to rounds) {
      val pairs = syms
        .select(split(col("symstr"), " ").as("ss"), col("freq"))
        .filter(size(col("ss")) >= 2)
        .select(explode(transform(sequence(lit(1), size(col("ss")) - 1),
          i => struct(element_at(col("ss"), i).as("pa"),
            element_at(col("ss"), i + 1).as("pb")))).as("p"), col("freq"))
        .select(col("p.pa").as("pa"), col("p.pb").as("pb"), col("freq"))
        .groupBy("pa", "pb").agg(sum("freq").as("cnt"))
      val best = pairs
        .orderBy(col("cnt").desc, col("pa"), col("pb")).limit(1)
        .select(lit(r).as("round"), col("pa"), col("pb"), col("cnt"))
        .ckpt(true)
      merges = if (merges == null) best else merges.unionByName(best)
      if (r < rounds)
        syms = syms
          .crossJoin(broadcast(best.select(col("pa"), col("pb"))))
          .select(expr(
            "replace(symstr, concat(pa, ' ', pb), concat(pa, pb))")
            .as("symstr"), col("freq"))
          .ckpt(true)
    }
    merges
  }
}
