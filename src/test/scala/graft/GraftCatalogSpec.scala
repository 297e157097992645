package graft

import org.apache.spark.sql.functions._

import graft.sources.GraftCatalog

/** The DSv2 catalog: three-part-name SQL over the fixture directories,
  * namespace/table listing, pushdown through to the parquet scan, the
  * events nanos contract, and read-only enforcement.
  */
class GraftCatalogSpec extends SparkSpec {

  private def install(): Unit = {
    spark.conf.set("spark.sql.catalog.graft", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft.root", "/root/testdata")
  }

  test("three-part-name SQL resolves and counts") {
    install()
    val n = spark.sql("SELECT count(*) AS n FROM graft.`sf0.001`.nation")
      .head().getLong(0)
    assert(n === 25)
  }

  test("SHOW NAMESPACES / SHOW TABLES surface the fixture layout") {
    install()
    // dotted namespace names come back backtick-quoted
    val ns = spark.sql("SHOW NAMESPACES IN graft")
      .collect().map(_.getString(0)).toSet
    assert(ns.contains("`sf0.001`") && ns.contains("`sf0.01`"), ns)
    val tables = spark.sql("SHOW TABLES IN graft.`sf0.001`")
      .collect().map(_.getString(1)).toSet
    assert(Set("lineitem", "orders", "documents", "embeddings", "events")
      .subsetOf(tables))
  }

  test("filter + projection push down to the catalog's parquet scan") {
    install()
    val df = spark.sql(
      "SELECT l_orderkey FROM graft.`sf0.001`.lineitem WHERE l_orderkey = 1")
    val formatted = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(formatted.contains("PushedFilters") &&
      formatted.contains("l_orderkey"), formatted.takeRight(800))
    assert(df.count() >= 0) // executes through the DSv2 scan
  }

  test("events.ts loads as a timestamp whatever the parquet physical encoding") {
    install()
    // The fixtures have shipped both TIMESTAMP(NANOS) (inferred BIGINT under
    // nanosAsLong) and timestamp[us]; the contract is schema-aware reading,
    // never a pinned physical type.
    val raw = spark.sql("SELECT ts, user_id FROM graft.`sf0.001`.events")
    val df = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.selectExpr("timestamp_micros(ts div 1000) AS ts", "user_id")
      case _ =>
        raw.selectExpr("CAST(ts AS TIMESTAMP) AS ts", "user_id")
    }
    assert(df.schema("ts").dataType.typeName === "timestamp")
    assert(df.limit(5).count() === 5)
  }

  test("catalog is read-only: writes and drops are refused") {
    install()
    intercept[Exception] {
      spark.sql("DROP TABLE graft.`sf0.001`.nation")
    }
    intercept[Exception] {
      spark.sql("CREATE TABLE graft.`sf0.001`.t2 (a INT) USING parquet")
    }
  }

  test("unknown namespace and table produce analysis errors, not crashes") {
    install()
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT * FROM graft.`sf9.9`.nation").collect()
    }
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT * FROM graft.`sf0.001`.nope").collect()
    }
  }
}
