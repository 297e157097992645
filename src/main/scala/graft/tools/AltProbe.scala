package graft.tools

import org.apache.spark.sql.SparkSession

/** Bisect the bench-context inflation's TRIGGER (round 11): a hot query
  * runs ~2× faster back-to-back than with even ONE other query between
  * executions (ContextProbe found the inflation needs no 365-query
  * session — 3 intervening queries reproduce it fully). This probe runs
  *   phase A: target × reps back-to-back
  *   phase B: (filler, target) × reps
  * for each given filler, printing per-rep target times — if a trivial
  * filler inflates the target, the cause is per-query session state
  * (codegen cache, cleaner, allocator); if only heavy fillers do, it is
  * memory pressure. Dev tool, not a graded surface.
  */
object AltProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val target = if (args.length > 1) args(1) else "ml_naive_bayes_lang"
    val fillers = (if (args.length > 2) args(2)
                   else "p1_select_reorder,stat_levene,g1_pagerank")
      .split(",").toSeq
    val reps = if (args.length > 3) args(3).toInt else 5
    val cpus = Runtime.getRuntime.availableProcessors()
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.graft.streamResultMemo", "false")
      // codegen-cache-eviction A/B knob (the cache is a JVM-wide
      // singleton sized at FIRST codegen, so builder-time env, not
      // SPARK_EXTRA_CONF). GRAFT_CODEGEN_CACHE=100 reproduces the
      // pre-fix inflation: target ~1.0s solo / after trivial fillers,
      // ~2.0s after any plan-heavy filler, instant recovery — the
      // eviction signature. 10000 (the shipped default) flattens it.
      .config("spark.sql.codegen.cache.maxEntries",
        sys.env.getOrElse("GRAFT_CODEGEN_CACHE", "10000"))
      .getOrCreate()
    graft.engine.Engine.fixtureFloorConfs(spark, sfDir)
    spark.sparkContext.setLogLevel("ERROR")

    def run(name: String): Double = {
      val before = spark.sparkContext.getPersistentRDDs.keySet
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.getPersistentRDDs
        .filterNot { case (id, _) => before.contains(id) }
        .foreach { case (_, rdd) => rdd.unpersist(blocking = false) }
      dt
    }

    graft.engine.Engine.persistTables(spark, sfDir)
    graft.operators.Graph.warmDerived(spark, sfDir)
    run(target); fillers.foreach(run) // warm everything once
    val solo = (1 to reps).map(_ => run(target))
    System.err.println(f"[alt] $target solo: " +
      solo.map(t => f"$t%.2f").mkString(" "))
    fillers.foreach { f =>
      val times = (1 to reps).map { _ => run(f); run(target) }
      System.err.println(f"[alt] $target after each $f: " +
        times.map(t => f"$t%.2f").mkString(" "))
    }
    // and once more solo to confirm recovery
    val solo2 = (1 to reps).map(_ => run(target))
    System.err.println(f"[alt] $target solo again: " +
      solo2.map(t => f"$t%.2f").mkString(" "))
    spark.stop()
  }
}
