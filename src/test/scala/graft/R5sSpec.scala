package graft

/** Specs for round-5 batch R5s: Shapley efficiency axiom, vocabulary
  * overlap symmetry bounds.
  */
class R5sSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  import spark.implicits._

  test("seq_shapley_attribution: efficiency — phis sum to v(N) − v(∅)") {
    val rows = Queries.byName("seq_shapley_attribution").fn(spark, sf)
      .as[(String, Long, Long)].collect().toSeq
    assert(rows.map(_._1).sorted == Seq("click", "signup", "view"))
    rows.foreach { case (ch, exposed, _) =>
      assert(exposed > 0, s"channel $ch must have exposed users")
    }
    // recompute v(full)−v(empty) from the raw fixture
    val masks = graft.engine.Engine.table(spark, sf, "events")
      .groupBy("user_id")
      .agg(org.apache.spark.sql.functions.expr(
        "CAST(max(event_type = 'view') AS BIGINT) * 1 + " +
          "CAST(max(event_type = 'click') AS BIGINT) * 2 + " +
          "CAST(max(event_type = 'signup') AS BIGINT) * 4").as("m"),
        org.apache.spark.sql.functions.expr(
          "CAST(max(event_type = 'purchase') AS BIGINT)").as("conv"))
      .groupBy("m")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"),
        org.apache.spark.sql.functions.sum("conv").as("c"))
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    def v(m: Long): Double =
      masks.get(m).map { case (n, c) => c.toDouble / n }.getOrElse(0.0)
    val expected = math.round((v(7) - v(0)) * 1e6)
    val total = rows.map(_._3).sum
    assert(math.abs(total - expected) <= 3,
      s"Shapley efficiency: sum $total must equal v(N)-v(empty) $expected")
  }

  test("text_lang_vocab_overlap: pair grid complete, Jaccard bounded") {
    val rows = Queries.byName("text_lang_vocab_overlap").fn(spark, sf)
      .as[(String, String, Long, Long, Long, Long)].collect().toSeq
    assert(rows.nonEmpty)
    val langs = (rows.map(_._1) ++ rows.map(_._2)).distinct.sorted
    assert(rows.size == langs.size * (langs.size - 1) / 2,
      "every unordered language pair exactly once")
    rows.foreach { case (a, b, va, vb, sh, j) =>
      assert(a < b)
      assert(sh <= math.min(va, vb), s"$a-$b shared exceeds a vocab")
      assert(j > 0 && j <= 1000000)
      assert(j == math.round(sh.toDouble * 1e6 / (va + vb - sh)))
    }
  }
}
