package graft

import org.apache.spark.sql.functions._
import graft.plans.{NgramHashes, NgramStrings}

/** Native NgramStrings/NgramHashes vs the composed chain
  * (`F.ngrams` / `transform(F.ngrams, xxhash64)`): identical grams,
  * order and counts (NOT distinct), identical hashes at Spark's seed,
  * total edge cases, null-token propagation, codegen execution.
  */
class NgramsSpec extends SparkSpec {
  import spark.implicits._

  private val texts = Seq(
    "the quick brown fox jumps over the lazy dog",
    "a b a b a b", // repeated grams must repeat (not distinct)
    "one two three four five", // exactly n for n=5
    "short", "x y z", "", "unicode åäö é tokens mixed in here")

  test("NgramStrings == F.ngrams for n in 2..5, order and dups included") {
    val df = texts.toDF("text").select(split($"text", " ").as("toks"))
    for (n <- 2 to 5) {
      val out = df.select(
        NgramStrings($"toks", n).as("native"),
        graft.functions.F.ngrams($"toks", n).as("chain")).collect()
      out.foreach { r =>
        assert(r.getSeq[String](0) == r.getSeq[String](1), s"n=$n")
      }
    }
  }

  test("NgramHashes == transform(F.ngrams, xxhash64)") {
    val df = texts.toDF("text").select(split($"text", " ").as("toks"))
    val out = df.select(
      NgramHashes($"toks", 5).as("native"),
      transform(graft.functions.F.ngrams($"toks", 5),
        g => xxhash64(g)).as("chain")).collect()
    out.foreach(r => assert(r.getSeq[Long](0) == r.getSeq[Long](1)))
  }

  test("total: short and NULL token arrays yield EMPTY, never null") {
    val df = Seq(Some(Seq("a", "b")), Some(Seq.empty[String]), None)
      .toDF("toks")
    val out = df.select(NgramStrings($"toks", 5).as("g"),
      NgramHashes($"toks", 5).as("h")).collect()
    out.foreach { r =>
      assert(!r.isNullAt(0) && r.getSeq[String](0).isEmpty)
      assert(!r.isNullAt(1) && r.getSeq[Long](1).isEmpty)
    }
  }

  test("null tokens null their grams; null grams hash to the bare seed") {
    val df = Seq(Seq[String]("a", null, "b", "c", "d", "e"))
      .toDF("toks")
    val g = df.select(NgramStrings($"toks", 2).as("g")).head().getSeq[String](0)
    // grams: a-null(null), null-b(null), b c, c d, d e
    assert(g == Seq(null, null, "b c", "c d", "d e"))
    val h = df.select(NgramHashes($"toks", 2).as("h")).head().getSeq[Long](0)
    val chain = df.select(transform(
      graft.functions.F.ngrams($"toks", 2), x => xxhash64(x)).as("h"))
      .head().getSeq[Long](0)
    assert(h == chain) // includes xxhash64(null) == seed for both nulls
  }

  test("executes inside whole-stage codegen over a generated corpus") {
    val df = spark.range(1000).select(
      concat_ws(" ", (0 to 9).map(j =>
        concat(lit("w"), ((col("id") * 7 + j) % 89).cast("string"))): _*)
        .as("text"))
      .select(split($"text", " ").as("toks"))
    // modded sum: ANSI mode overflows a plain sum of 64-bit hashes
    val a = df.select(explode(NgramHashes($"toks", 5)).as("h"))
      .agg(sum($"h" % 1000000007L), count(lit(1))).head()
    val b = df.select(explode(transform(
        graft.functions.F.ngrams($"toks", 5), g => xxhash64(g))).as("h"))
      .agg(sum($"h" % 1000000007L), count(lit(1))).head()
    assert(a == b)
  }
}
