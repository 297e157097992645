package graft

import graft.engine.Engine

/** Engine.floorScoped contract: the scheduling-floor scope must change
  * WHEN a query's plan executes (AQE off, materialized inside the scope)
  * without changing WHAT it returns, and both of its gates must hold —
  * the conf gate for cluster deployments / plan probes, and the
  * session-conf restore so one scoped query can't leak a disabled AQE
  * into the rest of the session.
  */
class FloorScopeSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("scoped run returns identical rows, in order, to the raw fn") {
    for (name <- Seq("stat_theil_sen", "f7_fractional_odds")) {
      val raw = Queries.byName(name).fn(spark, sf).collect().toSeq
      val scoped = Engine.floorScoped(spark, sf)(
        Queries.byName(name).fn(spark, sf)).collect().toSeq
      assert(scoped == raw, s"$name: scoped result diverged from raw fn")
    }
  }

  test("scoped frame is materialized; session confs are restored") {
    val aqeBefore = spark.conf.get("spark.sql.adaptive.enabled", "true")
    val partsBefore = spark.conf.get("spark.sql.shuffle.partitions")
    val df = Engine.floorScoped(spark, sf)(
      Queries.byName("f9_numeric_coerce").fn(spark, sf))
    // inside the scope the frame was eagerly checkpointed — its executed
    // plan is a checkpoint scan, not the query's own operators
    assert(df.queryExecution.executedPlan.toString.contains("ExistingRDD"),
      "scoped query escaped un-materialized")
    assert(spark.conf.get("spark.sql.adaptive.enabled", "true") == aqeBefore,
      "floorScoped leaked its AQE setting into the session")
    assert(spark.conf.get("spark.sql.shuffle.partitions") == partsBefore,
      "floorScoped leaked its shuffle-partition setting into the session")
  }

  test("conf gate: floorScope=false hands back the raw lazy plan") {
    spark.conf.set("spark.graft.floorScope", "false")
    try {
      val df = Engine.floorScoped(spark, sf)(
        Queries.byName("f9_numeric_coerce").fn(spark, sf))
      assert(!df.queryExecution.executedPlan.toString.contains("ExistingRDD"),
        "scope engaged despite spark.graft.floorScope=false")
    } finally spark.conf.unset("spark.graft.floorScope")
  }

  test("fixtureFloorConfs: gated session twin sets, skips, and never fires over-gate") {
    val aqeWas = spark.conf.get("spark.sql.adaptive.enabled", "true")
    val partsWere = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      // fixture-sized dir: both confs set
      Engine.fixtureFloorConfs(spark, sf)
      assert(spark.conf.get("spark.sql.adaptive.enabled") == "false")
      assert(spark.conf.get("spark.sql.shuffle.partitions") == "6")
      // skip set (the SPARK_EXTRA_CONF A/B path): pinned key untouched
      spark.conf.set("spark.sql.shuffle.partitions", "17")
      Engine.fixtureFloorConfs(spark, sf,
        skip = Set("spark.sql.shuffle.partitions"))
      assert(spark.conf.get("spark.sql.shuffle.partitions") == "17",
        "fixtureFloorConfs clobbered a caller-pinned key")
      // conf gate
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.set("spark.graft.floorScope", "false")
      Engine.fixtureFloorConfs(spark, sf)
      assert(spark.conf.get("spark.sql.adaptive.enabled") == "true",
        "fixtureFloorConfs fired despite floorScope=false")
    } finally {
      spark.conf.unset("spark.graft.floorScope")
      spark.conf.set("spark.sql.adaptive.enabled", aqeWas)
      spark.conf.set("spark.sql.shuffle.partitions", partsWere)
    }
  }

  test("size gate: a production-sized source dir never engages the scope") {
    // a sparse 2 GB file makes the dir read as over-gate without writing
    // 2 GB — File.length reports the logical size
    val dir = java.nio.file.Files.createTempDirectory("graft_big_")
    val big = new java.io.RandomAccessFile(
      dir.resolve("huge.parquet").toFile, "rw")
    try {
      big.setLength(2L << 30)
      big.close()
      val before = spark.conf.get("spark.sql.adaptive.enabled", "true")
      var bodyRanWithAqe: String = null
      val out = Engine.floorScoped(spark, dir.toString) {
        bodyRanWithAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
        spark.range(3).toDF("id")
      }
      assert(bodyRanWithAqe == before,
        "scope flipped AQE despite an over-gate source dir")
      assert(!out.queryExecution.executedPlan.toString.contains("ExistingRDD"),
        "scope materialized despite an over-gate source dir")
    } finally {
      java.nio.file.Files.deleteIfExists(dir.resolve("huge.parquet"))
      java.nio.file.Files.deleteIfExists(dir)
    }
  }
}
