package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.nio.file.Files

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** The graft-http-csv DataSource V2 (SURVEY §2.1 S1's FileDataSourceV2
  * shape): schema inference from the header, quoted-field parsing, real
  * column pruning and filter pushdown (asserted on the physical scan, not
  * just the output), distributed line partitions, driver-side body memo
  * (one GET per URL), and S6 zero-row degradation on fetch failure.
  */
class HttpCsvSourceSpec extends SparkSpec {

  private val csv =
    "team,city,pts\n" +
      "Alpha,\"A, City\",10\n" +
      "Beta,Btown,7\n" +
      "Alpha,Atown,\n" +
      ",Nowhere,3\n"

  private def tmpCsv(body: String): String = {
    val p = Files.createTempFile("graft_dsv2_", ".csv")
    Files.write(p, body.getBytes(StandardCharsets.UTF_8))
    p.toString
  }

  private def scanOf(df: org.apache.spark.sql.DataFrame): BatchScanExec =
    df.queryExecution.executedPlan.collectFirst { case b: BatchScanExec => b }
      .getOrElse(fail("no BatchScanExec in plan"))

  test("header schema inference + quoted fields + null semantics") {
    val df = spark.read.format("graft-http-csv")
      .option("url", tmpCsv(csv)).load()
    assert(df.schema == StructType(Seq(
      StructField("team", StringType), StructField("city", StringType),
      StructField("pts", StringType))))
    val rows = df.collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(rows.length == 4)
    assert(rows.contains(("Alpha", "A, City", "10"))) // comma inside quotes
    assert(rows.contains(("Alpha", "Atown", null)))   // trailing empty → null
    assert(rows.contains((null, "Nowhere", "3")))     // leading empty → null
  }

  test("RFC-4180 newline inside a quoted field stays one record") {
    val body = "team,notes\nAlpha,\"line1\nline2\"\nBeta,plain\n"
    val df = spark.read.format("graft-http-csv")
      .option("url", tmpCsv(body)).load()
    val rows = df.collect().map(r => (r.getString(0), r.getString(1)))
    assert(rows.length == 2)
    assert(rows.contains(("Alpha", "line1\nline2")))
    assert(rows.contains(("Beta", "plain")))
  }

  test("column pruning reaches the scan; pushed EqualTo filters rows at parse") {
    val df = spark.read.format("graft-http-csv")
      .option("url", tmpCsv(csv)).load()
      .filter(col("team") === "Alpha").select("city")
    val scan = scanOf(df)
    assert(scan.scan.readSchema().fieldNames.toSeq == Seq("city"),
      s"scan not pruned: ${scan.scan.readSchema()}")
    assert(scan.scan.description().contains("EqualTo(team,Alpha)"),
      s"filter not pushed: ${scan.scan.description()}")
    assert(df.collect().map(_.getString(0)).sorted.toSeq == Seq("A, City", "Atown"))
  }

  test("IsNotNull pushes; unsupported filters stay post-scan and still apply") {
    val df = spark.read.format("graft-http-csv")
      .option("url", tmpCsv(csv)).load()
      .filter(col("pts").isNotNull && col("pts") > "5") // > not pushable
    val desc = scanOf(df).scan.description()
    assert(desc.contains("IsNotNull(pts)"), desc)
    assert(!desc.contains("GreaterThan"), desc)
    // STRING comparison ("10" < "5" lexicographically): only Beta's "7"
    assert(df.collect().map(_.getString(0)).toSeq == Seq("Beta"))
  }

  test("multiple partitions cover all lines exactly once") {
    val body = "id\n" + (1 to 97).map(_.toString).mkString("\n")
    val df = spark.read.format("graft-http-csv")
      .option("url", tmpCsv(body)).option("numPartitions", "8").load()
    assert(df.rdd.getNumPartitions == 8)
    assert(df.collect().map(_.getString(0).toInt).sorted.toSeq == (1 to 97))
  }

  test("http URL served once per JVM (body memo); user schema skips inference GET") {
    val hits = new java.util.concurrent.atomic.AtomicInteger(0)
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/data.csv", (ex: HttpExchange) => {
      try {
        hits.incrementAndGet()
        val bytes = csv.getBytes(StandardCharsets.UTF_8)
        ex.sendResponseHeaders(200, bytes.length.toLong)
        ex.getResponseBody.write(bytes)
      } finally ex.close()
    })
    server.start()
    try {
      val url = s"http://127.0.0.1:${server.getAddress.getPort}/data.csv"
      val schema = StructType(Seq(StructField("team", StringType),
        StructField("city", StringType), StructField("pts", StringType)))
      val df = spark.read.format("graft-http-csv").schema(schema)
        .option("url", url).load()
      assert(df.count() == 4)
      assert(df.count() == 4) // second action: memo, no extra GET
      assert(hits.get() == 1, s"expected one GET, saw ${hits.get()}")
    } finally server.stop(0)
  }

  test("fetch failure with user schema degrades to zero rows (S6)") {
    val schema = StructType(Seq(StructField("a", StringType)))
    val df = spark.read.format("graft-http-csv").schema(schema)
      .option("url", "/nonexistent/graft/never.csv").load()
    assert(df.count() == 0)
    assert(df.schema == schema)
  }

  test("non-string user schema is rejected loudly") {
    val bad = StructType(Seq(StructField("a",
      org.apache.spark.sql.types.IntegerType)))
    val e = intercept[Exception] {
      spark.read.format("graft-http-csv").schema(bad)
        .option("url", tmpCsv("a\n1\n")).load().collect()
    }
    assert(e.getMessage.contains("string columns"))
  }
}
