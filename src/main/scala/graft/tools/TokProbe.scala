package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Disposable probe: time the stages of the boilerplate span pipeline
  * separately — raw scan, regex tokenization, + ngram hash, + explode +
  * partial agg — to attribute the 16-task stage's executor time before
  * writing any kernel. Dev tool.
  */
object TokProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = Runtime.getRuntime.availableProcessors()
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .getOrCreate()
    graft.engine.Engine.fixtureFloorConfs(spark, sfDir)
    spark.sparkContext.setLogLevel("ERROR")
    graft.engine.Engine.persistTables(spark, sfDir)
    val docs = graft.engine.Engine.table(spark, sfDir, "documents")

    def time(name: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      (1 to 3).foreach { rep =>
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        println(f"[tok] $name%-22s rep $rep ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }

    val toks = docs.select(col("doc_id"), col("source"),
      filter(split(regexp_replace(lower(col("text")),
        "[^a-z0-9 ]", " "), "\\s+"), x => x =!= "").as("toks"))
    time("raw scan")(docs.select(col("doc_id"), col("source"), col("text")))
    time("lower only")(docs.select(col("doc_id"), lower(col("text"))))
    time("regex replace")(docs.select(col("doc_id"),
      regexp_replace(lower(col("text")), "[^a-z0-9 ]", " ")))
    time("tokenize")(toks)
    time("tok+sizefilter")(toks.filter(size(col("toks")) >= 5))
    time("tok+ngramhash")(toks.filter(size(col("toks")) >= 5)
      .select(col("doc_id"), col("source"),
        graft.plans.NgramHashes(col("toks"), 5).as("spans")))
    time("tok+ngram+explode")(toks.filter(size(col("toks")) >= 5)
      .select(col("doc_id"), col("source"),
        explode(graft.plans.NgramHashes(col("toks"), 5)).as("span")))
    time("+partial agg")(toks.filter(size(col("toks")) >= 5)
      .select(col("doc_id"), col("source"),
        explode(graft.plans.NgramHashes(col("toks"), 5)).as("span"))
      .groupBy("span", "doc_id", "source").agg(count(lit(1)).as("c")))
    spark.stop()
  }
}
