package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev utility: time named inventory queries (noop sink, best of N) on a
  * given sf dir — the per-query view Bench gives, without the full
  * inventory. Usage: runMain graft.tools.TimeQuery <sfDir> <q1,q2> [n]
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val n = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      val times = (1 to n).map { _ =>
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[time] $name%-28s best ${times.min}%.2fs  runs ${times.map(t => f"$t%.2f").mkString(" ")}")
    }
    spark.stop()
  }
}
