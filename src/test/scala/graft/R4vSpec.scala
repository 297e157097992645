package graft

/** Spec for round-4 batch 9 (R4v): PK audit invariants. */
class R4vSpec extends SparkSpec {

  import spark.implicits._

  test("dq_pk_uniqueness: all 10 tables audited, clean fixture has no dups") {
    val rows = Queries.byName("dq_pk_uniqueness").fn(spark, "/root/testdata/sf0.001")
      .select("tbl", "distinct_keys", "dup_keys", "rows_in_dups", "max_multiplicity")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(rows.map(_._1).sorted ==
      graft.engine.Engine.tableNames.sorted, "every fixture table audited")
    rows.foreach { case (tbl, dk, dup, rid, mx) =>
      assert(dk > 0)
      if (tbl == "lineitem") {
        // real fixture finding: the synthetic generator does NOT keep
        // (l_orderkey, l_linenumber) unique — exactly the defect class
        // this audit exists to catch; pin it so a generator fix is loud
        assert(dup > 0L && mx >= 2L,
          s"lineitem composite-key dups vanished (generator changed?)")
      } else {
        assert(dup == 0L && rid == 0L && mx == 1L,
          s"$tbl: fixture PKs must be unique (dup_keys=$dup)")
      }
    }
  }

  test("dq_pk_uniqueness: detects an injected duplicate") {
    import org.apache.spark.sql.functions._
    // replay the audit shape on a frame with a known dup
    val df = Seq(1L, 2L, 2L, 3L).toDF("k")
    val r = df.groupBy("k").agg(count(lit(1)).as("n"))
      .agg(sum(when(col("n") > 1, 1L).otherwise(0L)).as("dup_keys"),
        max("n").as("max_multiplicity"))
      .as[(Long, Long)].head()
    assert(r == ((1L, 2L)))
  }
}
