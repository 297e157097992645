package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev utility: print a graded query's executed plan under bench-like
  * confs (floor scope off so the query's own shape shows, AQE off so
  * exchanges are visible statically).
  *
  * Usage: runMain graft.tools.ExplainQ <sfDir> <q1,q2,...>
  */
object ExplainQ {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val cpus = Runtime.getRuntime.availableProcessors()
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.graft.floorScope", "false")
    names.foreach { n =>
      println(s"===== $n =====")
      println(graft.Queries.byName(n).fn(spark, sfDir)
        .queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
