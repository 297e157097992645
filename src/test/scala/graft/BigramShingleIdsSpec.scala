package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.plans.BigramShingleIds

/** Native BigramShingleIds expression vs the composed-builtins chain
  * `array_distinct(transform(bigramShinglesFromToks(toks), tokenId))`:
  * identical ids and order, edge-case totality (short/null inputs →
  * empty, never null), null-element behavior, and codegen execution.
  */
class BigramShingleIdsSpec extends SparkSpec {
  import spark.implicits._

  private def composed(toks: org.apache.spark.sql.Column) =
    array_distinct(transform(
      Dedup.bigramShinglesFromToks(toks), g => Dedup.tokenId(g)))

  test("native == composed on varied real-ish texts, order included") {
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "the quick brown fox jumps over the quick brown fox", // repeats
      "a b a b a b a b", // heavy shingle dup
      "single-token-only hello", "x y", "unicode åäö tokens é mixed",
      "")
    val df = texts.toDF("text").select(split($"text", " ").as("toks"))
    val out = df.select(
      BigramShingleIds($"toks").as("native"),
      composed($"toks").as("chain")).collect()
    out.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1),
        s"mismatch: ${r.getSeq[Long](0)} vs ${r.getSeq[Long](1)}")
    }
  }

  test("ids mirror conv(substring(md5(shingle),1,8),16,10) exactly") {
    val df = Seq("alpha beta gamma").toDF("text")
      .select(split($"text", " ").as("toks"))
    val native = df.select(BigramShingleIds($"toks")).as[Seq[Long]].head()
    val expected = df.select(
      transform(Dedup.bigramShinglesFromToks($"toks"),
        g => conv(substring(md5(g), 1, 8), 16, 10).cast("long")))
      .as[Seq[Long]].head()
    assert(native == expected)
  }

  test("total: <2 tokens and NULL token array both yield EMPTY, not null") {
    val df = Seq(Some(Seq("one")), Some(Seq.empty[String]), None)
      .toDF("toks")
    val out = df.select(BigramShingleIds($"toks").as("gs")).collect()
    out.foreach { r =>
      assert(!r.isNullAt(0))
      assert(r.getSeq[Long](0).isEmpty)
    }
  }

  test("null token elements collapse to at most one null id, like the chain") {
    val df = Seq(Seq[String]("a", null, "b", null, "c"))
      .toDF("toks")
    val native = df.select(BigramShingleIds($"toks").as("gs"))
      .select(size($"gs").as("n"),
        size(filter($"gs", x => x.isNull)).as("nulls")).head()
    // shingles: a-null(null), null-b(null), b-null(null), null-c(null)
    // → one null survives the distinct; no non-null ids
    assert(native.getInt(0) == 1 && native.getInt(1) == 1)
  }

  test("executes inside whole-stage codegen over a generated corpus") {
    // 2k rows through a projection that must codegen (no fallback conf);
    // compare a checksum of native vs chain paths
    val df = spark.range(2000).select(
      concat_ws(" ", (0 to 6).map(j =>
        concat(lit("w"), ((col("id") + j) % 97).cast("string"))): _*)
        .as("text"))
      .select(split($"text", " ").as("toks"))
    val a = df.select(explode(BigramShingleIds($"toks")).as("g"))
      .agg(sum("g"), count(lit(1))).head()
    val b = df.select(explode(composed($"toks")).as("g"))
      .agg(sum("g"), count(lit(1))).head()
    assert(a == b)
  }
}
