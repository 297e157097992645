package graft

import org.apache.spark.sql.types._

import graft.engine.Engine

/** Fixture-contract canary: every live `/root/testdata` table must load
  * through [[Engine.table]] and satisfy the LOGICAL contract the graded
  * inventory depends on.
  *
  * Motivation: a driver-side fixture regeneration once flipped `events.ts`
  * from parquet TIMESTAMP(NANOS) to timestamp[us]; a loader that pinned the
  * old physical encoding failed at `persistTables`, before the first query,
  * zeroing an entire round's grade. This spec makes any such fixture/loader
  * drift fail `sbt test` loudly, in-round.
  *
  * Contract asserted per table: loads, is non-empty, has EXACTLY the
  * expected column names, and key columns satisfy a type-CLASS predicate
  * (integral / fractional / string / timestamp / array-of-fractional) —
  * never a specific physical encoding, which is the fixtures' prerogative.
  */
class FixtureCanarySpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def integral(dt: DataType) =
    dt == ByteType || dt == ShortType || dt == IntegerType || dt == LongType
  private def fractional(dt: DataType) =
    dt == FloatType || dt == DoubleType || dt.isInstanceOf[DecimalType]
  private def str(dt: DataType)        = dt == StringType
  private def tstamp(dt: DataType)     = dt == TimestampType || dt == TimestampNTZType || dt == DateType
  private def vec(dt: DataType) = dt match {
    case ArrayType(e, _) => fractional(e)
    case _               => false
  }

  /** table -> (exact column list, per-column type-class predicate) */
  private val contract: Map[String, Seq[(String, DataType => Boolean)]] = Map(
    "region"   -> Seq("r_regionkey" -> integral _, "r_name" -> str _),
    "nation"   -> Seq("n_nationkey" -> integral _, "n_name" -> str _, "n_regionkey" -> integral _),
    "customer" -> Seq("c_custkey" -> integral _, "c_name" -> str _, "c_nationkey" -> integral _,
      "c_acctbal" -> fractional _, "c_mktsegment" -> str _),
    "supplier" -> Seq("s_suppkey" -> integral _, "s_name" -> str _, "s_nationkey" -> integral _,
      "s_acctbal" -> fractional _),
    "part"     -> Seq("p_partkey" -> integral _, "p_name" -> str _, "p_brand" -> str _,
      "p_type" -> str _, "p_size" -> integral _, "p_retailprice" -> fractional _),
    "orders"   -> Seq("o_orderkey" -> integral _, "o_custkey" -> integral _, "o_orderstatus" -> str _,
      "o_totalprice" -> fractional _, "o_orderdate" -> tstamp _, "o_orderpriority" -> str _),
    "lineitem" -> Seq("l_orderkey" -> integral _, "l_partkey" -> integral _, "l_suppkey" -> integral _,
      "l_linenumber" -> integral _, "l_quantity" -> fractional _, "l_extendedprice" -> fractional _,
      "l_discount" -> fractional _, "l_tax" -> fractional _, "l_returnflag" -> str _,
      "l_linestatus" -> str _, "l_shipdate" -> tstamp _),
    "events"   -> Seq("event_id" -> integral _, "ts" -> tstamp _, "user_id" -> integral _,
      "event_type" -> str _, "value" -> fractional _, "props" -> str _),
    "documents" -> Seq("doc_id" -> integral _, "text" -> str _, "lang" -> str _,
      "source" -> str _, "n_chars" -> integral _),
    "embeddings" -> Seq("vec_id" -> integral _, "embedding" -> vec _, "label" -> integral _)
  )

  test("contract covers every Engine.tableNames entry") {
    assert(contract.keySet === Engine.tableNames.toSet)
  }

  for (name <- Engine.tableNames) {
    test(s"fixture canary: $name loads via Engine.table and matches the logical contract") {
      val df = Engine.table(spark, sfDir, name)
      val expected = contract(name)
      assert(df.schema.fieldNames.toSeq === expected.map(_._1),
        s"$name column drift: got ${df.schema.fieldNames.mkString(",")}")
      for ((colName, ok) <- expected) {
        val dt = df.schema(colName).dataType
        assert(ok(dt), s"$name.$colName has unexpected logical type $dt")
      }
      assert(df.limit(1).count() === 1L, s"$name is empty")
    }
  }

  test("fixture contract: lang is functionally dependent on doc_id") {
    // ml_naive_bayes_lang's one-explode-pass groups by (doc_id, lang,
    // tok), which silently assumes each doc carries exactly one lang; a
    // doc under two langs would split per-doc counts and skew the model
    // (ADVICE r5). Pin the dependency so fixture drift fails loudly.
    import org.apache.spark.sql.functions.{col, countDistinct, max}
    val viol = Engine.table(spark, sfDir, "documents")
      .groupBy("doc_id")
      .agg(countDistinct(col("lang")).as("nl"))
      .agg(max(col("nl")))
      .head().getLong(0)
    assert(viol == 1L,
      s"a doc_id appears under $viol langs; the (doc_id, lang, tok) " +
        "grouping contract in ml_naive_bayes_lang no longer holds")
  }

  test("events.ts NTZ branch: a synthesized timestamp_ntz fixture normalizes") {
    // The live fixture exercises whichever physical encoding the driver
    // last generated; this pins the TIMESTAMP_NTZ branch regardless.
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft_ntz_").toString
    spark.range(3)
      .select(col("id").as("event_id"),
        expr("timestamp_ntz '2024-01-01 00:00:01' + make_interval(0,0,0,0,0,0,id)")
          .as("ts"),
        col("id").as("user_id"), lit("click").as("event_type"),
        col("id").cast("double").as("value"), lit("{}").as("props"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val df = Engine.table(spark, dir, "events")
    assert(df.schema("ts").dataType === TimestampType)
    assert(df.count() === 3L)
  }

  test("fixture canary: embedding components stay inside [-1, 1]") {
    // Similarity.cosRankKey's no-overflow proof (dot^2 * 1e10 < 10^38 on
    // the HUGEINT oracle side, non-null DECIMAL on the Spark side) needs
    // |component| <= 1 after quantization to round(x * 2^20). Fixture max
    // is ~0.58 today; if a regenerated fixture ever drifts past 1 the
    // failure would otherwise surface as an asymmetric cross-engine
    // grading mismatch (Spark NULL rank keys vs a DuckDB overflow error)
    // instead of here (ADVICE r6).
    import org.apache.spark.sql.functions._
    val mx = Engine.table(spark, sfDir, "embeddings")
      .select(explode(col("embedding")).as("x"))
      .agg(max(abs(col("x").cast("double")))).collect()(0).getDouble(0)
    assert(mx <= 1.0,
      s"max |embedding| = $mx > 1 — cosRankKey's integer-range proof " +
        "no longer holds; re-derive the quantization scale")
  }

  test("fixture canary: events.ts normalizes to session TimestampType exactly") {
    // Engine.table's one normalization promise beyond pass-through: whatever
    // the parquet physical encoding (nanos-as-long, µs NTZ, µs UTC), `ts`
    // comes out as the session TimestampType so downstream date arithmetic
    // and the DuckDB oracle agree.
    val dt = Engine.table(spark, sfDir, "events").schema("ts").dataType
    assert(dt === TimestampType, s"events.ts normalized to $dt, want TimestampType")
  }
}
