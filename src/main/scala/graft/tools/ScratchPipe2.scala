package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway probe (deleted before round end): does exchange reuse collapse
  * two broadcasts of the same content under different aliases?
  */
object ScratchPipe2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val fact = (1 to 100000).toDF("k").withColumn("k2", col("k") % 50)
    val dim = (1 to 50).map(i => (i, s"v$i")).toDF("team", "v")
    var n = 0
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = { n += 1 }
    })
    // warm
    fact.count()
    n = 0
    val q = fact
      .join(broadcast(dim.select(col("team").as("ka"), col("v").as("va"))),
        col("k") % 50 === col("ka"), "left")
      .join(broadcast(dim.select(col("team").as("kb"), col("v").as("vb"))),
        col("k2") === col("kb"), "left")
    q.foreach(_ => ())
    println(s"[scratch] aliased-double-broadcast jobs = $n")
    Thread.sleep(500)
    n = 0
    val c1 = dim.agg(count(lit(1)).as("n1"))
    val c2 = dim.agg(count(lit(1)).as("n2"))
    val q2 = fact.crossJoin(broadcast(c1)).crossJoin(broadcast(c2))
    q2.foreach(_ => ())
    println(s"[scratch] double-count-broadcast jobs = $n")
    Thread.sleep(500)
    // normalize-like: dim passes through a broadcast lookup join first,
    // then two per-side aliased selects — does reuse survive the nesting?
    n = 0
    val nmap = (1 to 10).map(i => (i, i * 100)).toDF("raw", "canon")
    val dimN = dim.join(broadcast(nmap.select(col("raw").as("__r"),
        col("canon").as("__c"))), col("team") === col("__r"), "left")
      .withColumn("team", coalesce(col("__c"), col("team"))).drop("__r", "__c")
    val q3 = fact
      .join(broadcast(dimN.select(col("team").as("ka"), col("v").as("va"))),
        col("k") % 50 === col("ka"), "left")
      .join(broadcast(dimN.select(col("team").as("kb"), col("v").as("vb"))),
        col("k2") === col("kb"), "left")
    q3.foreach(_ => ())
    println(s"[scratch] nested-normalized-double-broadcast jobs = $n")
    spark.stop()
  }
}
