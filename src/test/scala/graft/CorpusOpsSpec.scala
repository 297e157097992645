package graft

import org.apache.spark.sql.functions._

/** Value + plan assertions for the corpus-preparation tier
  * (QueriesCorpus): forward as-of semantics on a hand-checked fixture,
  * chunking/packing structural invariants, and the shuffle budget of
  * each operator (chunking must stay map-only; packing and the inverted
  * index get exactly one hash exchange).
  */
class CorpusOpsSpec extends SparkSpec {

  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def q(name: String) = Queries.byName(name).fn(spark, sf)

  private def hashExchanges(plan: String): Seq[String] =
    "Exchange hashpartitioning\\([^)]*".r.findAllIn(plan).toSeq

  test("as-of FORWARD: earliest at-or-after match, smallest rid wins ties") {
    import graft.operators.AsofJoin
    val left = Seq((1L, 1, "L0"), (5L, 1, "L1"), (8L, 1, "L3"), (10L, 2, "L2"))
      .toDF("t", "k", "tag")
    val right = Seq((2L, 1, "a", 1L), (5L, 1, "b", 2L), (5L, 1, "b2", 3L), (7L, 1, "c", 4L))
      .toDF("rt", "k", "v", "rid")
    val out = AsofJoin.forward(left, right,
        keyCols = Seq("k"), leftTime = "t", rightTime = "rt",
        carryCols = Seq("v", "rid"), rightOrder = Seq("rid"))
      .select("tag", "asof_v", "asof_rid")
      .collect().map(r => r.getString(0) -> (Option(r.getString(1)), Option(r.get(2)))).toMap
    assert(out("L0") == (Some("a"), Some(1L)))  // next right row strictly after
    assert(out("L1") == (Some("b"), Some(2L)))  // inclusive >=, MIN rid wins tie
    assert(out("L3") == (None, None))           // after the last right row
    assert(out("L2") == (None, None))           // key with no right rows
  }

  test("as-of joins ignore null times on BOTH sides (SQL comparison semantics)") {
    import graft.operators.AsofJoin
    val left = Seq((Some(5L), 1, "L"), (None: Option[Long], 1, "Lnull"))
      .toDF("t", "k", "tag")
    val right = Seq((Some(3L), 1, "real", 1L), (None: Option[Long], 1, "phantom", 2L))
      .toDF("rt", "k", "v", "rid")
    for (dir <- Seq("backward", "forward")) {
      val join = if (dir == "backward") AsofJoin.backward _ else AsofJoin.forward _
      val out = join(left, right, Seq("k"), "t", "rt", Seq("v", "rid"), Seq("rid"))
        .select("tag", "asof_v")
        .collect().map(r => r.getString(0) -> Option(r.getString(1))).toMap
      // null-time left rows stay in the output (left join) but match nothing;
      // null-time right rows can never be a match — `rt <= t` is NULL in SQL
      assert(out("Lnull").isEmpty, s"$dir: null left time matched ${out("Lnull")}")
      val expectReal = if (dir == "backward") Some("real") else None
      assert(out("L") == expectReal, s"$dir: t=5 got ${out("L")}")
    }
  }

  test("packing splits a boundary-crossing doc: dense seq ids, exact-L interiors") {
    // one bucket, L=10: docs of 4, 9, 3 tokens → offsets 0, 4, 13.
    // Doc 2 spans seqs 0/1, doc 3 spans 1 only; seq 0 = exactly 10 tokens.
    val docs = Seq((1L, "s", 0L, 1L, 4L), (2L, "s", 0L, 2L, 9L), (3L, "s", 0L, 3L, 3L))
      .toDF("doc_id", "source", "pbucket", "h", "ntok")
    val out = QueriesCorpus.packSpans(docs, 10L)
      .collect().map(r => (r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq((0L, 2L, 10L), (1L, 2L, 6L)),
      s"span split wrong: ${out.toSeq}")
  }

  test("chunking is map-only (no hash exchange) and chunk indices are dense") {
    val plan = q("text_chunk").queryExecution.executedPlan.toString
    assert(hashExchanges(plan).isEmpty,
      s"chunking must not shuffle, found: ${hashExchanges(plan)}")
    val rows = q("text_chunk")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_chunks"), max("chunk_idx").as("max_idx"),
        min("n_toks").as("min_toks"), max("n_toks").as("max_toks"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) == r.getInt(2) + 1, s"chunk_idx gaps for doc ${r.get(0)}")
      assert(r.getInt(3) >= 1 && r.getInt(4) <= 50, s"chunk size out of bounds: $r")
    }
  }

  test("packing: one hash exchange total; per-bucket sequences dense and token-complete") {
    // the window's (source, pbucket) exchange must be REUSED by the
    // (source, pbucket, seq_id) groupBy — hash partitioning on a prefix
    // of the grouping key satisfies the clustering, so a second exchange
    // means the partitioning contract regressed
    val plan = q("curate_pack_sequences").queryExecution.executedPlan.toString
    val ex = hashExchanges(plan)
    assert(ex.size == 1 && ex.head.contains("source"),
      s"packing needs exactly one (source, pbucket) exchange, found: $ex")
    val perBucket = q("curate_pack_sequences")
      .groupBy("source", "pbucket")
      .agg(count(lit(1)).as("n_seqs"), max("seq_id").as("max_seq"),
        sum("n_tokens").as("tok_total"))
      .collect()
    assert(perBucket.nonEmpty)
    perBucket.foreach { r =>
      assert(r.getLong(2) == r.getLong(3) + 1, s"seq_id gaps in bucket $r")
    }
    // token conservation: every token lands in exactly one sequence
    val packed = perBucket.map(_.getLong(4)).sum
    val corpus = graft.engine.Engine.table(spark, sf, "documents")
      .select(sum(size(split(col("text"), " ")))).as[Long].head()
    assert(packed == corpus, s"packed $packed tokens, corpus has $corpus")
  }

  test("inverted index: single term-keyed exchange; samples sorted, bounded by df") {
    val plan = q("text_inverted_index").queryExecution.executedPlan.toString
    val ex = hashExchanges(plan)
    assert(ex.size == 1, s"inverted index must shuffle once on term, found: $ex")
    val rows = q("text_inverted_index").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val df = r.getLong(1)
      val sample = r.getString(2).split(",").map(_.toLong).toSeq
      assert(df >= 3, s"df filter leaked: $r")
      assert(sample.size == math.min(df, 5L), s"sample size vs df mismatch: $r")
      assert(sample == sample.sorted, s"postings not ascending: $r")
    }
  }

  test("domain mix: per-source kept counts equal the integer quota formula") {
    val docs = graft.engine.Engine.table(spark, sf, "documents")
    val counts = docs.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val wt = counts.keys.map(s => s -> (s.drop(3).toLong % 5 + 1)).toMap
    val wsum = wt.values.sum
    val tot = counts.map { case (s, c) => c * wsum / wt(s) }.min
    val quota = wt.map { case (s, w) => s -> w * tot / wsum }
    val kept = q("curate_domain_mix").groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    quota.filter(_._2 > 0).foreach { case (s, n) =>
      assert(kept.getOrElse(s, 0L) == n, s"source $s: kept ${kept.get(s)}, quota $n")
    }
    assert(kept.values.sum == quota.values.sum)
    // selection must be the hash-ranked prefix: re-running is idempotent
    // (deterministic) and every kept doc exists in the corpus
    val docIds = docs.select("doc_id").collect().map(_.getLong(0)).toSet
    q("curate_domain_mix").collect().foreach(r =>
      assert(docIds.contains(r.getLong(1))))
  }

  test("substring dedup: planted boilerplate recovered with exact doc counts") {
    val md = java.security.MessageDigest.getInstance("MD5")
    def md5hex(s: String): String =
      md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val n7 = graft.engine.Engine.table(spark, sf, "documents")
      .filter(col("doc_id") % 7 === 0).count()
    val rows = q("dedup_substring").collect()
    assert(rows.size <= 100)
    val counts = rows.map(_.getLong(1))
    assert(counts.forall(_ >= 2), "a singleton span leaked through")
    assert(counts.sameElements(counts.sortBy(-_)), "not ordered by n_docs desc")
    val plantedHash = md5hex("legal notice all rights reserved by the corpus")
    val planted = rows.find(_.getString(0) == plantedHash)
    assert(planted.isDefined, "planted boilerplate span missing from top-100")
    assert(planted.get.getLong(1) == n7, s"planted span count ${planted.get.getLong(1)} != $n7")
    assert(planted.get.getLong(2) == 0L, "first_doc of planted span must be doc 0")
  }

  test("bm25: 20 rows, positive scores, non-increasing; term filter pre-explode") {
    val rows = q("text_bm25_topk").collect()
    assert(rows.size == 20)
    val scores = rows.map(_.getDouble(1))
    assert(scores.forall(_ > 0.0))
    assert(scores.sameElements(scores.sortBy(-(_: Double))), "scores not descending")
    // the token explode must filter to query terms BEFORE generating rows —
    // the generator's input carries the filter() HOF, so the per-doc blowup
    // is |matches|, not |tokens|
    val plan = q("text_bm25_topk").queryExecution.optimizedPlan.toString
    assert(plan.contains("filter(toks"), "term filter not pushed into the explode input")
  }

  test("repetition metrics: fractions in [0,1]; keep flag matches integer thresholds") {
    val rows = q("text_rep_ngram").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, top, d2, d3, keep) =
        (r.getInt(1), r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getBoolean(5))
      assert(top > 0 && top <= 1.0 && d2 >= 0 && d2 <= 1.0 && d3 >= 0 && d3 <= 1.0,
        s"fraction out of range: $r")
      // recompute the flag from the float columns with exact rational
      // reconstruction: top*n etc. are small-int-valued doubles
      val topc = math.round(top * n)
      val dup2 = if (n >= 2) math.round(d2 * (n - 1)) else 0L
      val dup3 = if (n >= 3) math.round(d3 * (n - 2)) else 0L
      val expect = topc * 5 <= n &&
        (n < 2 || dup2 * 10 <= (n - 1) * 3) && (n < 3 || dup3 * 4 <= n - 2)
      assert(keep == expect, s"keep flag diverges from thresholds: $r")
    }
  }
}
