package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev utility: run named inventory queries in a session with
  * GraftExtensions INSTALLED (FuseArrayDot active), to prove the engine's
  * own queries survive the optimizer rule — esp. derived-key self-joins
  * above fused dot products. Usage: runMain graft.tools.ExtCheck <sfDir> <q1,q2>
  */
object ExtCheck {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      try {
        val n = graft.SparkEntry.queries(name)(spark, sfDir).count()
        println(s"[extcheck] $name OK rows=$n")
      } catch {
        case e: Throwable =>
          println(s"[extcheck] $name FAILED ${e.getClass.getSimpleName}: " +
            s"${String.valueOf(e.getMessage).linesIterator.take(3).mkString(" | ")}")
      }
    }
    spark.stop()
  }
}
