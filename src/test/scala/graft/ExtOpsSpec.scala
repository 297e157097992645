package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Similarity, TextAnalysis => TA}

/** Extension-tier operators: dedup families, similarity, text analysis. */
class ExtOpsSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the cat sat on the mat"),
    (2L, "the cat sat on the mat"),   // exact dup of 1
    (3L, "the cat sat on a mat"),     // near dup
    (4L, "spark shuffles partition data across executors"))
    .toDF("doc_id", "text")

  test("exact dedup groups identical payloads, keeps min id") {
    val out = Dedup.exact(docs, "doc_id", "text")
      .select("keep_id", "n_dups").orderBy("keep_id").collect()
    assert(out.length == 3)
    assert(out(0).getLong(0) == 1L && out(0).getLong(1) == 2L)
  }

  test("bigram shingles + jaccard: identical → 1.0, near dup high, disjoint 0") {
    val sh = docs.select($"doc_id", Dedup.bigramShingles($"text").as("sh"))
    val byId = sh.collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(byId(1L) == byId(2L))
    val pairs = sh.as("a").join(sh.as("b"), $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id", $"b.doc_id",
        Dedup.jaccard($"a.sh", $"b.sh").as("j"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(pairs((1L, 2L)) == 1.0)
    assert(pairs((1L, 3L)) > 0.4 && pairs((1L, 3L)) < 1.0)
    assert(pairs((1L, 4L)) == 0.0)
  }

  test("tokenId matches the engine-portable md5-prefix contract") {
    // DuckDB twin: ('0x' || substr(md5(t), 1, 8))::BIGINT
    // md5('hello') = 5d41402a... → 0x5d41402a = 1564557354
    val out = Seq("hello").toDF("t")
      .select(Dedup.tokenId($"t").as("tid")).head().getLong(0)
    assert(out == 1564557354L)
  }

  test("bigram shingles: sub-2-token docs yield empty set, no ANSI throw") {
    val sh = Seq((1L, "solo"), (2L, ""), (3L, "two words"))
      .toDF("doc_id", "text")
      .select($"doc_id", Dedup.bigramShingles($"text").as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(sh(1L).isEmpty && sh(2L).isEmpty)
    assert(sh(3L) == Seq("two words"))
  }

  test("minhash: identical docs share full signature; LSH buckets them") {
    val pairs = Dedup.tokenPairs(docs, "doc_id", "text", distinctTokens = true)
    val ptid = pairs.select($"doc_id", Dedup.tokenId($"tok").as("tid"))
    val sig = Dedup.minhashSignatures(ptid, "doc_id", 8)
    val sigs = sig.groupBy("doc_id")
      .agg(sort_array(collect_list(struct($"j", $"h"))).as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Any](1)).toMap
    assert(sigs(1L) == sigs(2L))
    assert(sigs(1L) != sigs(4L))
    val buckets = Dedup.lshBuckets(sig, "doc_id").filter($"n" > 1).collect()
    assert(buckets.nonEmpty) // 1 and 2 collide in every band
  }

  test("simhash: identical docs equal; unrelated docs differ") {
    val pairs = Dedup.tokenPairs(docs, "doc_id", "text", distinctTokens = false)
    val cnts = pairs.groupBy($"doc_id", $"tok").agg(count(lit(1)).as("cnt"))
    val out = Dedup.simhash16(cnts, "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(1L) == out(2L))
    assert(out(1L) != out(4L))
    assert(out.values.forall(v => v >= 0 && v < 65536))
  }

  test("cosine: identical vectors → 1, orthogonal → 0; topk ranks right") {
    val vecs = Seq(
      (0L, Seq(1.0, 0.0)), (1L, Seq(1.0, 0.0)), (2L, Seq(0.0, 1.0)),
      (3L, Seq(0.9, 0.1)))
      .toDF("id", "vec")
    val q = vecs.filter($"id" === 0).select($"id".as("q_id"), $"vec".as("qv"))
    val top = Similarity.bruteForceTopK(vecs, q, 3)
      .orderBy("rank").collect()
    assert(top(0).getAs[Long]("cand") == 1L && top(0).getAs[Double]("cos") == 1.0)
    assert(top(1).getAs[Long]("cand") == 3L)
    assert(top(2).getAs[Long]("cand") == 2L && top(2).getAs[Double]("cos") == 0.0)
  }

  test("hyperplane LSH: identical vectors land in the same bucket") {
    val vecs = Seq((0L, Seq(1.0, 2.0, 3.0)), (1L, Seq(1.0, 2.0, 3.0)),
      (2L, Seq(-3.0, 1.0, -2.0)))
      .toDF("id", "vec")
    val sigs = vecs.select($"id", Similarity.hyperplaneSig($"vec", 8, 3).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs(0L) == sigs(1L))
  }

  test("connected components: chains merge over rounds, singletons stay") {
    val nodes = (0L to 9L).toDF("id")
    // chain 0-1-2-3 (diameter 3 → needs multiple propagation rounds),
    // pair 5-6, self-loop 8, isolated 4/7/9
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (5L, 6L), (8L, 8L)).toDF("a", "b")
    val persistedBefore = spark.sparkContext.getPersistentRDDs.size
    val out = Dedup.connectedComponents(nodes, edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Seq(0L, 1L, 2L, 3L).forall(out(_) == 0L))
    assert(out(5L) == 5L && out(6L) == 5L)
    assert(Seq(4L, 7L, 8L, 9L).forall(i => out(i) == i))
    // eager per-round cleanup: only the FINAL labels checkpoint may remain
    // persisted (diameter-3 chain forces several rounds, each of which
    // checkpoints — without the in-loop RDD unpersist this grows by ~2/round)
    val persistedAfter = spark.sparkContext.getPersistentRDDs.size
    assert(persistedAfter - persistedBefore <= 1,
      s"round checkpoints leaked: $persistedBefore -> $persistedAfter persisted RDDs")
  }

  test("connected components: empty nodes frame returns empty, no NPE") {
    val nodes = Seq.empty[Long].toDF("id")
    val edges = Seq.empty[(Long, Long)].toDF("a", "b")
    assert(Dedup.connectedComponents(nodes, edges).count() == 0)
  }

  test("capped bucketing: oversized buckets split by refinement planes") {
    val rnd = new scala.util.Random(7)
    val vecs = (0L until 120L).map(i => (i, Seq.fill(8)(rnd.nextGaussian())))
      .toDF("id", "vec")
    // 2 base planes → ≤4 buckets over 120 vectors: all far over cap=10
    val sigs = vecs.select($"id",
      Similarity.hyperplaneSig($"vec", 2, 8).as("sig"),
      Similarity.hyperplaneSigFrom($"vec", 2, 6, 8).as("ext"))
    val occ = sigs.groupBy("sig").agg(count(lit(1)).as("occ_n"))
    val keyed = sigs.join(broadcast(occ), "sig")
      .withColumn("bkey", Similarity.cappedBucketKey(
        $"sig", $"ext", $"occ_n", nPlanes = 2, cap = 10))
    def pairSpace(df: org.apache.spark.sql.DataFrame, key: String): (Long, Long) = {
      val ns = df.groupBy(key).agg(count(lit(1)).as("n"))
        .collect().map(_.getAs[Long]("n"))
      (ns.max, ns.map(n => n * (n - 1) / 2).sum)
    }
    val (maxBase, pairsBase) = pairSpace(keyed, "sig")
    val (maxCapped, pairsCapped) = pairSpace(keyed, "bkey")
    assert(maxBase > 10, "fixture must actually overflow the cap")
    assert(maxCapped < maxBase, s"refinement must split: $maxCapped vs $maxBase")
    assert(pairsCapped < pairsBase / 4,
      s"pair space must shrink hard: $pairsCapped vs $pairsBase")
    // under-cap buckets keep the base key (refined keys live above 2^n)
    val keptRows = keyed.filter($"occ_n" <= 10)
    assert(keptRows.filter($"bkey" =!= $"sig").count() == 0)
  }

  test("text stats: quality in [0,1]; fingerprint reorder-insensitive tier") {
    val q = docs.select(TA.qualityScore($"text").as("q"))
      .collect().map(_.getDouble(0))
    assert(q.forall(v => v >= 0.0 && v <= 1.0))
    val fp = Seq(("b a c"), ("c b a")).toDF("text")
      .select(TA.fingerprintExact($"text").as("e"), TA.fingerprintTokenSet($"text").as("t"))
      .collect()
    assert(fp(0).getString(0) != fp(1).getString(0)) // exact differs
    assert(fp(0).getString(1) == fp(1).getString(1)) // token-set agrees
  }

  test("BPE-ish pre-tokenizer: letter runs, digit runs, single marks") {
    val out = Seq("don't stop, it's 42km!").toDF("text")
      .select(TA.tokensBpeIsh($"text").as("t"))
      .head().getSeq[String](0)
    assert(out == Seq("don", "'", "t", "stop", ",", "it", "'", "s", "42", "km", "!"))
  }

  test("langId flags english-marker-dense text") {
    val out = Seq(("the cat and the dog of the house"), ("xyzzy qwerty plugh"))
      .toDF("text").select(TA.langIdEn($"text").as("l"))
      .collect().map(_.getString(0))
    assert(out.toSeq == Seq("en", "other"))
  }
}
