package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Throwaway probe (deleted before round end): log every job's description
  * while pipe_enrich runs, to attribute the 56-job storm.  args: sfDir
  */
object ScratchPipe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    var n = 0
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        n += 1
        val names = js.stageInfos.map(si => si.name.take(60)).mkString(" | ")
        println(f"[job] ${js.jobId}%3d stages=${js.stageInfos.size}%2d  $names")
      }
    })
    // warm-up (first run pays codegen; we want the steady-state job list)
    val q = graft.Queries.byName("pipe_enrich")
    val df = q.fn(spark, sfDir)
    df.foreach(_ => ())
    println("==== warm run ====")
    df.foreach(_ => ())
    println(s"[scratch] total jobs counted = $n")
    val plan = df.queryExecution.executedPlan.toString
    println(s"[scratch] BroadcastExchange nodes = ${"BroadcastExchange".r.findAllIn(plan).size}")
    println(s"[scratch] ReusedExchange nodes    = ${"ReusedExchange".r.findAllIn(plan).size}")
    println(s"[scratch] ShuffleExchange nodes   = ${"Exchange hashpartitioning".r.findAllIn(plan).size}")
    plan.linesIterator.filter(l => l.contains("BroadcastExchange") || l.contains("ReusedExchange") || l.contains("HashAggregate") && l.contains("count"))
      .foreach(l => println("[plan] " + l.trim.take(150)))
    spark.stop()
  }
}
