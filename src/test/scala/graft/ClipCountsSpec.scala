package graft

import org.apache.spark.sql.functions._
import graft.plans.ClippedGramCounts

/** Native ClippedGramCounts vs the explode/groupBy formulation it
  * replaced on the eval_bleu_corpus / eval_chrf paths: identical
  * per-document (clipped, htot, rtot) triples for every n, including
  * duplicate grams, null tokens (all null-containing grams pool into
  * ONE null gram per n — concat-then-group semantics), empty and short
  * inputs, supplementary code points, and the string-keyed slow path
  * (vocabulary over the packed-id budget). Codegen execution included.
  */
class ClipCountsSpec extends SparkSpec {
  import spark.implicits._

  // reference = the former query shape, computed directly: count grams
  // per side, clip per gram, pool null-containing grams per n
  private def refWord(h: Seq[String], r: Seq[String], maxN: Int): Seq[Long] =
    (1 to maxN).flatMap { n =>
      def grams(a: Seq[String]): Seq[String] =
        if (a.size < n) Seq.empty
        else a.sliding(n).filter(_.size == n)
          .map(w => if (w.contains(null)) null else w.mkString(" ")).toSeq
      val hg = grams(h); val rg = grams(r)
      val hc = hg.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      val rc = rg.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      val clipped = (hc.keySet ++ rc.keySet).toSeq
        .map(k => math.min(hc.getOrElse(k, 0L), rc.getOrElse(k, 0L))).sum
      Seq(clipped, hg.size.toLong, rg.size.toLong)
    }

  // char reference compares windows as code-point SEQUENCES
  // (equality of substrings == equality of code-point sequences)
  private def refCharSafe(h: String, r: String, maxN: Int): Seq[Long] = {
    def cps(s: String): Seq[Int] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[Int]
      var i = 0
      while (i < s.length) {
        out += s.codePointAt(i); i += Character.charCount(s.codePointAt(i))
      }
      out.toSeq
    }
    (1 to maxN).flatMap { n =>
      def grams(a: Seq[Int]): Seq[Seq[Int]] =
        if (a.size < n) Seq.empty else a.sliding(n).filter(_.size == n).toSeq
      val hg = grams(cps(h)); val rg = grams(cps(r))
      val hc = hg.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      val rc = rg.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      val clipped = (hc.keySet ++ rc.keySet).toSeq
        .map(k => math.min(hc.getOrElse(k, 0L), rc.getOrElse(k, 0L))).sum
      Seq(clipped, hg.size.toLong, rg.size.toLong)
    }
  }

  test("word mode == reference: dups, shared grams, empty, short") {
    val cases = Seq(
      (Seq("a", "b", "a", "b", "c"), Seq("a", "b", "a", "b", "c")),
      (Seq("a", "b", "a", "b", "a"), Seq("b", "a", "b")),
      (Seq("x"), Seq("x", "y", "z", "x", "y")),
      (Seq.empty[String], Seq("a", "b")),
      (Seq("one", "two", "three", "four", "five", "one", "two"),
        Seq("two", "three", "four", "one", "two", "one")),
      (Seq("", "a", "", "a"), Seq("", "", "a"))) // empty tokens stay distinct from pairs
    for ((h, r) <- cases) {
      val got = Seq((h, r)).toDF("h", "r")
        .select(ClippedGramCounts.words($"h", $"r", 4).as("c"))
        .head().getSeq[Long](0)
      assert(got == refWord(h, r, 4), s"h=$h r=$r")
    }
  }

  test("null tokens pool into one null gram per n, both sides") {
    val h = Seq("a", null, "b", "c")
    val r = Seq("c", null, "d", "a", null)
    val got = Seq((h, r)).toDF("h", "r")
      .select(ClippedGramCounts.words($"h", $"r", 3).as("c"))
      .head().getSeq[Long](0)
    assert(got == refWord(h, r, 3))
    // spot-check the pooling: at n=2 hyp has grams {a·null→null,
    // null·b→null, b c}; ref has {c·null→null, null·d→null, d a,
    // a·null→null}; clipped at the null gram = min(2, 3) = 2
    assert(got(3) == 2 + 0) // n=2 clipped: null-gram 2, "b c" unmatched
  }

  test("null or missing side yields all zeros") {
    val df = Seq((Some(Seq("a", "b")), Option.empty[Seq[String]]))
      .toDF("h", "r")
    val got = df.select(ClippedGramCounts.words($"h", $"r", 4).as("c"))
      .head().getSeq[Long](0)
    assert(got == Seq.fill(12)(0L))
  }

  test("char mode == reference incl supplementary code points") {
    val cases = Seq(
      ("abcabc", "bcabca"),
      ("aaaaaa", "aaa"),
      ("", "abc"),
      ("ab", "ab"),
      ("héllo wörld", "héllo wörld!"),
      ("a😀b😀", "😀b😀a"))
    for ((h, r) <- cases) {
      val got = Seq((h, r)).toDF("h", "r")
        .select(ClippedGramCounts.chars($"h", $"r", 6).as("c"))
        .head().getSeq[Long](0)
      assert(got == refCharSafe(h, r, 6), s"h=$h r=$r")
    }
  }

  test("char slow path (>1023 distinct code points) == reference") {
    // 1200 distinct code points forces the string-keyed fallback
    val h = (0 until 1200).map(i => (0x4e00 + i).toChar).mkString +
      "abcabcabc"
    val r = h.drop(600) + "xyzxyz"
    val got = Seq((h, r)).toDF("h", "r")
      .select(ClippedGramCounts.chars($"h", $"r", 6).as("c"))
      .head().getSeq[Long](0)
    assert(got == refCharSafe(h, r, 6))
  }

  test("word slow path (>65535 distinct tokens) == fast-path semantics") {
    // 70k distinct tokens forces the string-keyed fallback; overlap
    // tail gives non-trivial clipped counts
    val h = (0 until 70000).map(i => s"t$i")
    val r = (69990 until 70010).map(i => s"t$i")
    val got = Seq((h, r)).toDF("h", "r")
      .select(ClippedGramCounts.words($"h", $"r", 2).as("c"))
      .head().getSeq[Long](0)
    // n=1: 10 shared tokens; n=2: 9 shared bigrams
    assert(got == Seq(10L, 70000L, 20L, 9L, 69999L, 19L))
  }

  test("executes inside whole-stage codegen; corpus totals match the " +
    "explode/groupBy formulation") {
    val toks = spark.range(500).select(
      split(concat_ws(" ", (0 to 11).map(j =>
        concat(lit("w"), ((col("id") * 13 + j * j) % 37).cast("string"))): _*),
        " ").as("ref"))
      .withColumn("hyp", expr(
        "transform(slice(ref, 1, size(ref) - 1), " +
          "(t, i) -> CASE WHEN (i + 1) % 5 = 0 THEN 'xxx' ELSE t END)"))
    // kernel totals
    val k = toks.select(ClippedGramCounts.words($"hyp", $"ref", 4).as("c"))
      .agg(
        sum(element_at($"c", 1)), sum(element_at($"c", 2)),
        sum(element_at($"c", 4)), sum(element_at($"c", 5)),
        sum(element_at($"c", 7)), sum(element_at($"c", 8)),
        sum(element_at($"c", 10)), sum(element_at($"c", 11)),
        sum(element_at($"c", 3))).head()
    // former formulation, verbatim shape
    def nextGrams(prev: org.apache.spark.sql.Column,
                  arr: org.apache.spark.sql.Column, n: Int) =
      zip_with(slice(prev, lit(1), size(prev) - 1),
        slice(arr, lit(n), size(arr) - n + 1),
        (a, b) => concat(a, lit(" "), b))
    val withGrams = toks
      .withColumn("h1", $"hyp").withColumn("r1", $"ref")
      .withColumn("h2", nextGrams($"h1", $"hyp", 2))
      .withColumn("r2", nextGrams($"r1", $"ref", 2))
      .withColumn("h3", nextGrams($"h2", $"hyp", 3))
      .withColumn("r3", nextGrams($"r2", $"ref", 3))
      .withColumn("h4", nextGrams($"h3", $"hyp", 4))
      .withColumn("r4", nextGrams($"r3", $"ref", 4))
      .withColumn("doc_id", monotonically_increasing_id())
    val tagged = flatten(array((1 to 4).flatMap(n => Seq(
      transform(col(s"h$n"), g =>
        struct(lit(n).as("n"), lit("h").as("side"), g.as("g"))),
      transform(col(s"r$n"), g =>
        struct(lit(n).as("n"), lit("r").as("side"), g.as("g"))))): _*))
    val perGram = withGrams.select($"doc_id", explode(tagged).as("x"))
      .select($"doc_id", $"x.n".as("n"), $"x.side".as("side"), $"x.g".as("g"))
      .groupBy("doc_id", "n", "g")
      .agg(sum(when($"side" === "h", 1L).otherwise(0L)).as("h"),
        sum(when($"side" === "r", 1L).otherwise(0L)).as("r"))
    def tot(i: Int, c: org.apache.spark.sql.Column) =
      sum(when($"n" === i, c)).cast("long")
    val old = perGram.agg(
      tot(1, least($"h", $"r")), tot(1, $"h"),
      tot(2, least($"h", $"r")), tot(2, $"h"),
      tot(3, least($"h", $"r")), tot(3, $"h"),
      tot(4, least($"h", $"r")), tot(4, $"h"),
      tot(1, $"r")).head()
    assert(k == old)
  }
}
