package graft

import org.apache.spark.sql.functions._
import graft.engine.Ops

/** Relational operator module (SURVEY §2.2–2.4), incl. the pandas-delta
  * guards: ensure_cols no-op, coalesce precedence, tolerant union,
  * keep-first dedup determinism.
  */
class OpsSpec extends SparkSpec {
  import spark.implicits._

  test("P4 ensureCols adds only missing columns") {
    val df = Seq((1, "a")).toDF("id", "name")
    val out = Ops.ensureCols(df, Seq("name" -> lit("X"), "extra" -> lit(7)))
    assert(out.columns.toSeq == Seq("id", "name", "extra"))
    val r = out.collect()(0)
    assert(r.getString(1) == "a") // existing value untouched
    assert(r.getInt(2) == 7)
  }

  test("P8 firstPresent picks first existing candidate, else fallback") {
    val df = Seq((1, 2.0, 3.0)).toDF("id", "b", "c")
    val hit = df.select(Ops.firstPresent(df, Seq("zz", "b", "c"), lit(-1.0)).as("x"))
    assert(hit.collect()(0).getDouble(0) == 2.0)
    val miss = df.select(Ops.firstPresent(df, Seq("zz", "yy"), lit(-1.0)).as("x"))
    assert(miss.collect()(0).getDouble(0) == -1.0)
  }

  test("P8 firstPresent is wholesale: nulls in the chosen column stay null") {
    // reference next(...) picks ONE column; a row that is NaN there does
    // NOT back-fill from a later candidate (fetch_football_data.py:33-35)
    val df = Seq((1, Option.empty[Double], Some(9.0)), (2, Some(2.5), Some(9.0)))
      .toDF("id", "b365h", "psh")
    val out = df.select(col("id"),
        Ops.firstPresent(df, Seq("b365h", "psh"), lit(null).cast("double")).as("x"))
      .orderBy("id").collect()
    assert(out(0).isNullAt(1))          // NOT 9.0
    assert(out(1).getDouble(1) == 2.5)
  }

  test("as-of join: backward inclusive, null before first right, tie by order") {
    import graft.operators.AsofJoin
    val left = Seq((1L, 1, "L0"), (5L, 1, "L1"), (10L, 2, "L2"))
      .toDF("t", "k", "tag")
    val right = Seq((2L, 1, "a", 1L), (5L, 1, "b", 2L), (5L, 1, "b2", 3L), (7L, 1, "c", 4L))
      .toDF("rt", "k", "v", "rid")
    val out = AsofJoin.backward(left, right,
        keyCols = Seq("k"), leftTime = "t", rightTime = "rt",
        carryCols = Seq("v", "rid"), rightOrder = Seq("rid"))
      .select("tag", "asof_v", "asof_rid")
      .collect().map(r => r.getString(0) -> (Option(r.getString(1)), Option(r.get(2)))).toMap
    assert(out("L0") == (None, None))          // before any right row
    assert(out("L1") == (Some("b2"), Some(3L))) // inclusive ≤, max rid wins tie
    assert(out("L2") == (None, None))          // key with no right rows
  }

  test("as-of join carries the latest right row ATOMICALLY (nullable fields)") {
    import graft.operators.AsofJoin
    val left = Seq((3L, 1)).toDF("t", "k")
    val right = Seq((1L, 1, Some(10.0), Some(5L)), (2L, 1, Some(20.0), None))
      .toDF("rt", "k", "price", "qty")
    val r = AsofJoin.backward(left, right,
        keyCols = Seq("k"), leftTime = "t", rightTime = "rt",
        carryCols = Seq("price", "qty")).select("asof_price", "asof_qty").head()
    // latest row is (20.0, null) — a per-column carry would resurrect
    // qty=5 from the older row, fabricating a record that never existed
    assert(r.getDouble(0) == 20.0 && r.isNullAt(1))
  }

  test("J2 joinIfKeyed joins when key exists, defaults when absent") {
    val dim = Seq((1, 0.9)).toDF("k", "rate")
    val withKey = Seq((1, "x"), (2, "y")).toDF("k", "payload")
    val joined = Ops.joinIfKeyed(withKey, dim, "k", Seq("rate" -> lit(0.3)))
    val m = joined.collect().map(r => r.getInt(0) -> Option(r.get(2))).toMap
    assert(m(1).contains(0.9) && m(2).isEmpty) // join path: dim value / null
    val noKey = Seq(("x")).toDF("payload")
    val defaulted = Ops.joinIfKeyed(noKey, dim, "k", Seq("rate" -> lit(0.3)))
    assert(defaulted.collect()(0).getDouble(1) == 0.3)
  }

  test("J5 precedence: existing ▸ joined ▸ default") {
    val df = Seq(
      (Some(1.0), Some(2.0)), (None, Some(2.0)), (None: Option[Double], None: Option[Double]))
      .toDF("existing", "joined")
    val out = df.select(
      Ops.precedence($"existing", $"joined", lit(9.0)).as("v"))
      .collect().map(_.getDouble(0))
    assert(out.toSeq == Seq(1.0, 2.0, 9.0))
  }

  test("A1 unionTolerant null-fills missing columns") {
    val a = Seq((1, "x")).toDF("id", "extra")
    val b = Seq(2).toDF("id")
    val out = Ops.unionTolerant(Seq(a, b)).orderBy("id").collect()
    assert(out.length == 2)
    assert(out(0).getString(1) == "x")
    assert(out(1).isNullAt(1))
  }

  test("A3 dedupKeepFirst keeps the first row per key by explicit order") {
    val df = Seq(("k", 3, "c"), ("k", 1, "a"), ("k", 2, "b"), ("j", 5, "e"))
      .toDF("key", "ord", "payload")
    val out = Ops.dedupKeepFirst(df, Seq("key"), Seq("ord"))
      .orderBy("key").collect()
    assert(out.map(_.getString(2)).toSeq == Seq("e", "a"))
  }

  test("V1 missingColumns reports exactly the absent ones") {
    val df = Seq((1, "a")).toDF("id", "name")
    assert(Ops.missingColumns(df, Seq("id", "xg", "name", "ref")) == Seq("xg", "ref"))
  }
}
