package graft

import org.apache.spark.sql.functions._

/** Specs for round-4 batch 1 (R4n): context-pack budget/prefix
  * invariants, containment bounds and direction, t-closeness range,
  * Kendall pair accounting, and fertility byte/char ordering.
  */
class R4nSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  import spark.implicits._

  test("rag_context_pack: budget respected and ranks form a prefix") {
    val rows = Queries.byName("rag_context_pack").fn(spark, sf)
      .select("q_id", "rank", "n_tokens", "cum_tokens")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(rows.nonEmpty)
    assert(rows.forall(_._4 <= 192L), "cum_tokens exceeded the budget")
    rows.groupBy(_._1).foreach { case (q, rs) =>
      val ranks = rs.map(_._2).sorted
      assert(ranks == (1L to ranks.size), s"query $q ranks not a prefix: $ranks")
      // cum_tokens is the actual running sum of n_tokens in rank order
      val byRank = rs.sortBy(_._2)
      assert(byRank.map(_._3).scanLeft(0L)(_ + _).tail == byRank.map(_._4))
    }
  }

  test("dedup_containment: bounds, direction, and share consistency") {
    val rows = Queries.byName("dedup_containment").fn(spark, sf)
      .select("shared", "size_a", "size_b", "cont_ab", "cont_ba")
      .as[(Long, Long, Long, Double, Double)].collect().toSeq
    assert(rows.nonEmpty)
    rows.foreach { case (shared, sa, sb, ab, ba) =>
      assert(shared <= sa && shared <= sb,
        "intersection larger than a side")
      assert(ab > 0 && ab <= 1.0 && ba > 0 && ba <= 1.0)
      // containment into the smaller set is never the smaller ratio
      if (sa <= sb) assert(ab >= ba) else assert(ba >= ab)
    }
  }

  test("dq_t_closeness: one row per nation, t within [0, 1]") {
    val rows = Queries.byName("dq_t_closeness").fn(spark, sf)
      .select("c_nationkey", "t")
      .as[(Int, Double)].collect().toSeq
    assert(rows.map(_._1).distinct.size == rows.size)
    assert(rows.forall { case (_, t) => t >= 0.0 && t <= 1.0 })
  }

  test("stat_kendall_tau: pair accounting closes and tau in [-1, 1]") {
    val r = Queries.byName("stat_kendall_tau").fn(spark, sf)
      .select("pairs", "concordant", "discordant", "ties_x", "ties_y",
        "ties_xy", "tau_b_micro")
      .as[(Long, Long, Long, Long, Long, Long, Long)].head()
    val (p, c, dd, tx, ty, txy, tau) = r
    assert(c + dd + tx + ty + txy == p, "pair classes don't partition")
    assert(tau >= -1000000L && tau <= 1000000L)
  }

  test("text_fertility: bytes >= chars and ratios well-formed") {
    val rows = Queries.byName("text_fertility").fn(spark, sf)
      .select("lang", "chars", "bytes", "bytes_per_char", "chars_per_token")
      .as[(String, Long, Long, Double, Double)].collect().toSeq
    assert(rows.map(_._1).contains("en"))
    rows.foreach { case (_, ch, by, bpc, cpt) =>
      // UTF-8 bytes can never undercount chars; the synthetic fixtures are
      // ASCII so bpc == 1.0 exactly — on real multibyte corpora bpc > 1
      assert(by >= ch); assert(bpc >= 1.0); assert(cpt > 0.0)
    }
  }
}
