package graft

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

/** The graft-shards DSv2 write path: JSON-lines round-trip, the two-phase
  * commit protocol's artifacts (_INDEX.json written last, _tmp cleaned),
  * truncate-on-overwrite, and failure atomicity (a failing job must leave
  * the previous committed output visible and intact).
  */
class ShardSinkSpec extends SparkSpec {

  import spark.implicits._

  private def listNames(dir: String): Set[String] =
    Files.list(Paths.get(dir)).iterator().asScala
      .map(_.getFileName.toString).toSet

  test("round-trip: shards hold every row; index counts match; tmp cleaned") {
    val dir = Files.createTempDirectory("graft_shards_").toString
    val df = (1 to 997).map(i => (i.toLong, s"doc $i", i % 2 == 0, i / 7.0))
      .toDF("id", "text", "flag", "score").repartition(4)
    df.write.format("graft-shards").option("path", dir).mode("append").save()

    val names = listNames(dir)
    assert(names.contains("_INDEX.json"))
    assert(!names.contains("_tmp"), s"tmp debris: $names")
    val shardNames = names.filter(_.startsWith("shard-"))
    assert(shardNames.size == 4, s"expected 4 shards, got $shardNames")
    // declared row counts are embedded in the file names AND the index
    assert(shardNames.toSeq
      .map(_.stripSuffix(".jsonl").split("-").last.toLong).sum == 997)
    val index = new String(
      Files.readAllBytes(Paths.get(dir, "_INDEX.json")), "UTF-8")
    shardNames.foreach(n => assert(index.contains(n), s"$n missing from index"))

    val back = spark.read.json(dir + "/shard-*.jsonl")
    assert(back.count() == 997)
    assert(back.select(sum("id")).head().getLong(0) == (1 to 997).map(_.toLong).sum)
    assert(back.filter(col("text") === "doc 42").count() == 1)
  }

  test("JSON escaping survives hostile strings") {
    val dir = Files.createTempDirectory("graft_shards_").toString
    val hostile = "line1\nline2\t\"quoted\\path\"end"
    Seq((1L, hostile)).toDF("id", "text")
      .coalesce(1).write.format("graft-shards").option("path", dir).mode("append").save()
    val back = spark.read.json(dir + "/shard-*.jsonl").collect()(0)
    assert(back.getAs[String]("text") == hostile)
  }

  test("overwrite truncates previous shards inside commit; append keeps them") {
    val dir = Files.createTempDirectory("graft_shards_").toString
    def write(n: Int, mode: String): Unit =
      (1 to n).map(i => (i.toLong, "x")).toDF("id", "t").coalesce(1)
        .write.format("graft-shards").option("path", dir).mode(mode).save()
    write(10, "append")
    write(20, "overwrite")
    assert(spark.read.json(dir + "/shard-*.jsonl").count() == 20)
    write(5, "append")
    assert(spark.read.json(dir + "/shard-*.jsonl").count() == 25)
  }

  test("append of an identical frame never clobbers; index merges prior shards") {
    val dir = Files.createTempDirectory("graft_shards_").toString
    def append(): Unit =
      (1 to 10).map(i => (i.toLong, "x")).toDF("id", "t").coalesce(1)
        .write.format("graft-shards").option("path", dir).mode("append").save()
    append(); append() // same partition count, same row count: name-collision bait
    assert(spark.read.json(dir + "/shard-*.jsonl").count() == 20)
    val index = new String(
      Files.readAllBytes(Paths.get(dir, "_INDEX.json")), "UTF-8")
    val listed = listNames(dir).filter(_.startsWith("shard-"))
    assert(listed.size == 2, s"expected 2 shards on disk: $listed")
    listed.foreach(n => assert(index.contains(n), s"index lost shard $n"))
  }

  test("NaN/Infinity doubles serialize as null — strict-JSON-legal lines") {
    val dir = Files.createTempDirectory("graft_shards_").toString
    Seq((1L, Double.NaN), (2L, Double.PositiveInfinity), (3L, 2.5))
      .toDF("id", "score").coalesce(1)
      .write.format("graft-shards").option("path", dir).mode("append").save()
    val lines = Files.list(Paths.get(dir)).iterator().asScala
      .filter(_.getFileName.toString.startsWith("shard-")).toSeq
      .flatMap(p => scala.io.Source.fromFile(p.toFile, "UTF-8").getLines())
    lines.foreach(l => assert(!l.contains("NaN") && !l.contains("Infinity"), l))
    val back = spark.read.json(dir + "/shard-*.jsonl")
    assert(back.filter(col("score").isNull).count() == 2)
    assert(back.filter(col("score") === 2.5).count() == 1)
  }

  test("failed job leaves previously committed output intact (no partial visibility)") {
    val dir = Files.createTempDirectory("graft_shards_").toString
    (1 to 10).map(i => (i.toLong, "keep")).toDF("id", "t").coalesce(1)
      .write.format("graft-shards").option("path", dir).mode("append").save()
    // this job fails task-side BEFORE any driver commit: the expression
    // throws on the last row under ANSI division
    intercept[Exception] {
      (0 to 3).toDF("d")
        .select((lit(100) / when(col("d") === 3, lit(0)).otherwise(col("d")))
          .cast("long").as("id"), lit("bad").as("t"))
        .coalesce(1)
        .write.format("graft-shards").option("path", dir).mode("overwrite").save()
    }
    // previous data still fully visible: overwrite truncation happens
    // inside driver commit, which never ran
    val back = spark.read.json(dir + "/shard-*.jsonl")
    assert(back.count() == 10)
    assert(back.filter(col("t") === "keep").count() == 10)
  }

  test("curation E2E to shards: quality-filter -> chunk -> export -> read back complete") {
    import graft.operators.{TextAnalysis => TA}
    val dir = Files.createTempDirectory("graft_shards_").toString
    val docs = graft.engine.Engine.table(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), TA.tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= 50) // quality gate: too-short docs out
    val chunks = docs
      .select(col("doc_id"),
        posexplode(sequence(lit(1), size(col("toks")), lit(40)))
          .as(Seq("chunk_idx", "start")))
      .select(col("doc_id"), col("chunk_idx").cast("long").as("chunk_idx"))
    val expected = chunks.count()
    chunks.repartition(3)
      .write.format("graft-shards").option("path", dir).mode("overwrite").save()
    val back = spark.read.json(dir + "/shard-*.jsonl")
    assert(back.count() == expected)
    // every (doc, chunk) pair survives exactly once
    assert(back.select("doc_id", "chunk_idx").distinct().count() == expected)
    val index = new String(
      Files.readAllBytes(Paths.get(dir, "_INDEX.json")), "UTF-8")
    assert(listNames(dir).count(_.startsWith("shard-")) == 3)
    assert(!index.isEmpty)
  }

  test("unsupported field types are rejected loudly, not stringified") {
    val dir = Files.createTempDirectory("graft_shards_").toString
    val e = intercept[Exception] {
      Seq((1L, Seq(1, 2))).toDF("id", "arr")
        .write.format("graft-shards").option("path", dir).mode("append").save()
    }
    assert(e.getMessage != null)
  }
}
