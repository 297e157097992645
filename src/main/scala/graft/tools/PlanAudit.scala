package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev utility: per-query exchange census — hash/range/broadcast counts
  * in the executed plan, the numbers every "N shuffles" doc claim in the
  * inventory should be checked against.
  * Usage: runMain graft.tools.PlanAudit <sfDir> <q1,q2|all>
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names =
      if (args.length < 2 || args(1) == "all") graft.Queries.all.map(_.name)
      else args(1).split(",").toSeq
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      try {
        val plan = graft.SparkEntry.queries(name)(spark, sfDir)
          .queryExecution.executedPlan.toString
        val hash = "Exchange hashpartitioning".r.findAllIn(plan).size
        val range = "Exchange rangepartitioning".r.findAllIn(plan).size
        val single = "Exchange SinglePartition".r.findAllIn(plan).size
        val bc = "BroadcastExchange".r.findAllIn(plan).size
        val smj = "SortMergeJoin".r.findAllIn(plan).size
        println(f"[plan] $name%-28s hash=$hash range=$range single=$single " +
          f"broadcast=$bc sortmerge=$smj")
      } catch {
        case e: Throwable =>
          println(s"[plan] $name FAILED ${e.getClass.getSimpleName}")
      }
    }
    spark.stop()
  }
}
