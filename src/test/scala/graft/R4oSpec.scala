package graft

import org.apache.spark.sql.functions._

/** Specs for round-4 batch 2 (R4o): pigeonhole band completeness for
  * ahash pairs, normalization idempotence, Pareto non-domination,
  * confusion-matrix closure, and soft-dedup mass conservation.
  */
class R4oSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  import spark.implicits._

  test("mm_ahash_neardup: reported distances within threshold, pairs ordered") {
    val rows = Queries.byName("mm_ahash_neardup").fn(spark, sf)
      .as[(Long, Long, Long)].collect().toSeq
    assert(rows.nonEmpty)
    rows.foreach { case (a, b, h) =>
      assert(a < b, "pair not canonicalized a < b")
      assert(h >= 0 && h <= 3)
    }
  }

  test("dedup_normalized: normalization collapses case/punct variants") {
    import spark.implicits._
    val df = Seq((1L, "Hello,   World!"), (2L, "hello world"),
      (3L, "different text")).toDF("doc_id", "text")
    val norm = trim(regexp_replace(
      regexp_replace(lower(col("text")), "[^a-z0-9 ]", ""), " +", " "))
    val fps = df.select(col("doc_id"), md5(norm).as("nfp"))
      .as[(Long, String)].collect().toMap
    assert(fps(1L) == fps(2L), "case/punct variants should share a fingerprint")
    assert(fps(1L) != fps(3L))
  }

  test("curate_pareto_front: no member dominates another within a source") {
    val rows = Queries.byName("curate_pareto_front").fn(spark, sf)
      .select("source", "div_micro", "n_chars", "doc_id")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (_, members) =>
      for (m <- members; o <- members if o != m)
        assert(!(o._2 > m._2 && o._3 <= m._3),
          s"$o dominates $m — not a Pareto front")
    }
  }

  test("eval_langid_confusion: shares sum to 1 and cells partition the corpus") {
    val rows = Queries.byName("eval_langid_confusion").fn(spark, sf)
      .select("gold", "pred", "n", "share")
      .as[(String, String, Long, Double)].collect().toSeq
    val total = rows.map(_._3).sum
    val nDocs = graft.engine.Engine.table(spark, sf, "documents").count()
    assert(total == nDocs, "confusion cells must partition the corpus")
    assert(math.abs(rows.map(_._4).sum - 1.0) < 1e-3)
    assert(rows.map(_._2).toSet.subsetOf(Set("en", "other")))
  }

  test("curate_soft_dedup: effective mass never exceeds raw mass") {
    val rows = Queries.byName("curate_soft_dedup").fn(spark, sf)
      .select("source", "n_docs", "dup_members", "raw_tokens",
        "eff_tokens_micro")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(rows.nonEmpty)
    rows.foreach { case (_, nd, dup, raw, effMicro) =>
      assert(dup >= 0 && dup <= nd)
      assert(effMicro <= raw * 1000000L,
        "weighted token mass cannot exceed raw mass")
      // with no duplicates the masses must match exactly
      if (dup == 0) assert(effMicro == raw * 1000000L)
    }
  }
}
