package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Disposable probe: after persistTables, do common table-access shapes
  * hit the in-memory cache (InMemoryTableScan in the executed plan) or
  * fall back to a fresh parquet scan? Dev tool.
  */
object CacheHitProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = Runtime.getRuntime.availableProcessors()
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.engine.Engine.fixtureFloorConfs(spark, sfDir)
    spark.sparkContext.setLogLevel("ERROR")
    graft.engine.Engine.persistTables(spark, sfDir)

    def probe(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val plan = df.queryExecution.executedPlan.toString
      val hit = plan.contains("InMemoryTableScan")
      val fs = plan.contains("FileScan")
      println(s"[cache] $name hit=$hit filescan=$fs")
      if (!hit) println(plan.linesIterator.take(12).mkString("\n"))
    }

    val t = (n: String) => graft.engine.Engine.table(spark, sfDir, n)
    probe("orders full", t("orders"))
    probe("orders project", t("orders").select(col("o_custkey")))
    probe("orders proj+hash", t("orders")
      .select(xxhash64(col("o_custkey").cast("string")).as("h")))
    probe("lineitem project", t("lineitem").select(col("l_orderkey")))
    probe("documents project", t("documents").select(col("doc_id")))
    probe("events project", t("events").select(col("user_id")))
    probe("part project", t("part").select(col("p_brand")))
    val rules = Seq(
      ("orders", "o_custkey", "o_orderstatus"),
      ("lineitem", "l_orderkey", "l_returnflag"),
      ("lineitem", "l_partkey", "l_quantity"))
    val stream = rules.zipWithIndex.map { case ((tbl, a, b), i) =>
      t(tbl).select(lit(i).as("rid"),
        xxhash64(col(a).cast("string")).as("lhs"),
        xxhash64(col(b).cast("string")).as("rhs"))
    }.reduce(_ unionByName _)
    val planU = stream.queryExecution.executedPlan.toString
    println(s"[cache] union3 inMem=${
      planU.linesIterator.count(_.contains("InMemoryTableScan"))} " +
      s"fileScanTop=${planU.linesIterator.count(l =>
        l.contains("FileScan") && !l.contains("InMemoryRelation"))}")
    println(planU.linesIterator.take(25).mkString("\n"))
    spark.stop()
  }
}
