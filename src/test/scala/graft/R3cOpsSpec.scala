package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.LongType

/** Semantic pins for the round-3 batch-3 queries: native session-window
  * gap boundaries, the windowed-distinct decomposition, integer-micro
  * character entropy, HLL sketch merge accuracy, and the SemDeDup
  * cell-then-prune behavior on a planted fixture.
  */
class R3cOpsSpec extends SparkSpec {

  import spark.implicits._

  test("session_window: an event at exactly the gap threshold still MERGES") {
    // events at t=0 and t=1800s with a 30-min gap → Spark extends the
    // session while next.ts <= session.end, so exactly-1800 merges and
    // the islands-form boundary is strictly `> 1800` (the
    // w15_session_window oracle's convention, same as w1's).
    def sessions(gapSec: Long): Long =
      Seq((1L, 0L), (1L, gapSec))
        .toDF("user_id", "sec")
        .select(col("user_id"), timestamp_seconds(col("sec")).as("ts"))
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
        .count().count()
    assert(sessions(1800L) === 1, "exact-gap event must merge")
    assert(sessions(1801L) === 2, "over-gap event must open a new session")
  }

  test("session_window end = last event + gap (w15 oracle contract)") {
    val row = Seq((1L, 0L), (1L, 60L))
      .toDF("user_id", "sec")
      .select(col("user_id"), timestamp_seconds(col("sec")).as("ts"))
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .count()
      .select(col("session_window.start").cast("long"),
        col("session_window.end").cast("long"))
      .as[(Long, Long)].head()
    assert(row === ((0L, 60L + 1800L)))
  }

  test("w14 decomposition: first-occurrence running sum == collect_set size") {
    val ev = Seq(
      (1L, 1L, "a"), (1L, 2L, "b"), (1L, 3L, "a"), (1L, 4L, "c"),
      (2L, 5L, "x"), (2L, 6L, "x"))
      .toDF("user_id", "event_id", "event_type")
    val first = row_number().over(
      Window.partitionBy("user_id", "event_type").orderBy("event_id"))
    val running = Window.partitionBy("user_id").orderBy("event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val viaFlag = ev
      .withColumn("fst", when(first === 1, 1L).otherwise(0L))
      .withColumn("n", sum("fst").over(running))
    val viaSet = ev
      .withColumn("n2", size(collect_set("event_type").over(running)).cast(LongType))
    val joined = viaFlag.select("user_id", "event_id", "n")
      .join(viaSet.select(col("user_id"), col("event_id"), col("n2")),
        Seq("user_id", "event_id"))
    assert(joined.filter(col("n") =!= col("n2")).count() === 0)
    assert(viaFlag.filter(col("user_id") === 1L).orderBy("event_id")
      .select("n").as[Long].collect().toSeq === Seq(1L, 2L, 2L, 3L))
  }

  test("char entropy: uniform two-char string scores exactly 1.0") {
    // "aabb": n=4, each char cnt=2 → s_micro = 2·round(2·log2(2)·1e6)
    // = 4e6; H = log2(4) − 4e6/4e6 = 1.0 exactly.
    val got = Seq((1L, "aabb")).toDF("doc_id", "text")
      .select(col("doc_id"),
        explode(transform(sequence(lit(1), length(col("text"))),
          i => col("text").substr(i, lit(1)))).as("c"))
      .groupBy("doc_id", "c").agg(count(lit(1)).as("cnt"))
      .groupBy("doc_id")
      .agg(sum("cnt").as("n"),
        sum(round(col("cnt") * log2(col("cnt")) * 1e6, 0).cast(LongType))
          .as("s_micro"))
      .select(round(log2(col("n")) - col("s_micro") / (col("n") * lit(1e6)), 3))
      .as[Double].head()
    assert(got === 1.0)
    // single repeated char: zero entropy
    val flat = Seq((1L, "aaaa")).toDF("doc_id", "text")
      .select(col("doc_id"),
        explode(transform(sequence(lit(1), length(col("text"))),
          i => col("text").substr(i, lit(1)))).as("c"))
      .groupBy("doc_id", "c").agg(count(lit(1)).as("cnt"))
      .groupBy("doc_id")
      .agg(sum("cnt").as("n"),
        sum(round(col("cnt") * log2(col("cnt")) * 1e6, 0).cast(LongType))
          .as("s_micro"))
      .select(round(log2(col("n")) - col("s_micro") / (col("n") * lit(1e6)), 3))
      .as[Double].head()
    assert(flat === 0.0)
  }

  test("hll sketch partial merge: union of dailies ≈ direct distinct") {
    val ev = (0 until 1000).map(i => (i % 3, i % 50, s"d${i % 7}"))
      .toDF("typ", "uid", "day")
    val merged = ev.groupBy("typ", "day")
      .agg(hll_sketch_agg(col("uid")).as("sk"))
      .groupBy("typ")
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("approx"))
    val exact = ev.groupBy("typ").agg(count_distinct(col("uid")).as("exact"))
    val bad = exact.join(merged, "typ")
      .filter(abs(col("approx") - col("exact")) > lit(0.1) * col("exact"))
      .count()
    assert(bad === 0, "HLL estimate must land within ±10% of exact")
  }

  test("semdedup: planted near-identical vector is pruned, originals kept") {
    // 3 well-separated 4-d vectors as their own centroids, plus one
    // near-copy of vector 0 → same cell, cosine ≈ 1, pruned.
    val vecs = Seq(
      (0L, Array(1.0, 0.0, 0.0, 0.0)),
      (1L, Array(0.0, 1.0, 0.0, 0.0)),
      (2L, Array(0.0, 0.0, 1.0, 0.0)),
      (99L, Array(0.999, 0.001, 0.0, 0.0)))
      .toDF("id", "v")
    val cents = vecs.filter(col("id") < 3)
      .select(col("id").as("cid"), col("v").as("cv"))
    def dot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      graft.operators.Similarity.dotComposed(a, b)
    val assigned = vecs.crossJoin(broadcast(cents))
      .select(col("id"), col("v"), struct(
        (dot(col("v"), col("v")) - lit(2) * dot(col("v"), col("cv")) +
          dot(col("cv"), col("cv"))).as("d2"), col("cid")).as("dc"))
      .groupBy("id").agg(min(col("dc")).as("m"), first(col("v")).as("v"))
      .select(col("id"), col("m.cid").as("cell"), col("v"),
        sqrt(dot(col("v"), col("v"))).as("nrm"))
    val a = assigned.select(col("id").as("id_a"), col("cell"),
      col("v").as("va"), col("nrm").as("na"))
    val b = assigned.select(col("id").as("id_b"), col("cell"),
      col("v").as("vb"), col("nrm").as("nb"))
    val pruned = a.join(b, Seq("cell")).filter(col("id_a") < col("id_b"))
      .filter(round(dot(col("va"), col("vb")) / (col("na") * col("nb")), 6)
        >= 0.95)
      .select(col("id_b").as("id")).distinct()
      .as[Long].collect().toSet
    assert(pruned === Set(99L), "only the planted copy is pruned")
  }
}
