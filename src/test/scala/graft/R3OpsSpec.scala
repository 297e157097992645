package graft

import org.apache.spark.sql.functions._
import graft.operators.Graph

/** Unit + plan assertions for the round-3 tier: BFS hop semantics on a
  * known graph, the BPE merge-apply step's replace semantics, the
  * time-range window frame's tie handling, quality-logit boundary
  * behavior, and unpivot's single-scan Expand plan.
  */
class R3OpsSpec extends SparkSpec {

  import spark.implicits._

  test("bfsHops: hop counts on a known path + branch graph, unreachable excluded") {
    // 1—2—3—4—5 chain with a branch 2—10; 99—100 is a disconnected island.
    // Seed = min node id = 1.
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (2L, 10L),
      (99L, 100L)).toDF("a", "b")
    val got = Graph.bfsHops(edges, 3).as[(Long, Int)].collect().toMap
    assert(got === Map(1L -> 0, 2L -> 1, 3L -> 2, 10L -> 2, 4L -> 3),
      "expected first-reach hops within 3 rounds, island unreached")
  }

  test("bfsHops: early exit when the frontier drains before maxHops") {
    val edges = Seq((1L, 2L)).toDF("a", "b")
    // frontier is empty after hop 1; rounds 2+ must not run (and must
    // not fail) — result is just the two nodes
    val got = Graph.bfsHops(edges, 10).as[(Long, Int)].collect().toMap
    assert(got === Map(1L -> 0, 2L -> 1))
  }

  test("bpe apply: left-to-right non-overlapping merge (the 'a a a' case)") {
    // replace('a a a', 'a a' -> 'aa') must yield symbols [aa, a] — the
    // same non-overlapping left-to-right semantics the oracle's
    // replace() has; if Spark ever differed, pair counts would drift.
    val got = Seq("aaa").toDF("w")
      .select(split(expr(
        "replace(trim(regexp_replace(w, '(.)', '$1 ')), 'a a', 'aa')"),
        " ").as("syms"))
      .select(col("syms")).as[Seq[String]].head()
    assert(got === Seq("aa", "a"))
  }

  test("bpeTrainMerges: two rounds on a known corpus pick the right merges") {
    // word "aab" ×2, "ab" ×1 → round 1 pair counts (a,a)=2, (a,b)=3 →
    // best (a,b) cnt 3; after the merge ("a ab"×2, "ab") round 2 best
    // is (a,ab) cnt 2. freq-weighted counts must equal instance counts.
    val wordFreq = Seq(("a a b", 2L), ("a b", 1L)).toDF("symstr", "freq")
    val got = graft.operators.TextAnalysis.bpeTrainMerges(wordFreq, 2)
      .orderBy("round").as[(Int, String, String, Long)].collect().toSeq
    assert(got === Seq((1, "a", "b", 3L), (2, "a", "ab", 2L)))
  }

  test("w11 range frame: same-timestamp ties all land in each other's frame") {
    // two events with identical epoch for one user: a RANGE frame (unlike
    // ROWS) must include BOTH rows in BOTH windows
    val df = Seq((1L, 100L, 10.0), (2L, 100L, 20.0), (3L, 99999999999L, 5.0))
      .toDF("event_id", "ep", "value")
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("ep")).rangeBetween(-3600000000L, 0L)
    val got = df.select(col("event_id"), count(lit(1)).over(w).as("n"))
      .as[(Long, Long)].collect().toMap
    assert(got(1L) === 2 && got(2L) === 2, "range frame must span ties")
    assert(got(3L) === 1, "far-future row sees only itself")
  }

  test("a19_unpivot plans a single scan (Expand), not a union of scans") {
    val plan = Queries.byName("a19_unpivot")
      .fn(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(plan.contains("Expand"), "unpivot should lower to Expand")
    val scans = "Scan parquet".r.findAllIn(plan).length
    assert(scans <= 1, s"expected one parquet scan, saw $scans")
  }

  test("curate_lm_score: keep flag flips exactly at logit 0") {
    val rows = Queries.byName("curate_lm_score")
      .fn(spark, "/root/testdata/sf0.001")
      .select(col("logit"), col("keep")).as[(Double, Boolean)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall { case (l, k) => k === (l > 0) })
  }
}
