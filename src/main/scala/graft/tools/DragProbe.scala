package graft.tools

import org.apache.spark.sql.SparkSession

/** Paired within-JVM A/B for the streaming session-drag mechanism
  * (round 10, VERDICT r9 task 1). Host wall-clock on the fixture box
  * drifts ±20% between runs, so tree-vs-tree bench totals cannot
  * isolate a 10% effect; this probe instead alternates, inside ONE
  * session, iterations of:
  *
  *   [run a stateful streaming query] -> [time a fixed batch sentinel]
  *
  * with `spark.graft.streamStateRelease` toggled per iteration. The
  * sentinel-time PAIRED difference (off minus on, same JVM, seconds
  * apart) measures exactly the drag a lingering state-store footprint
  * imposes on the next batch query — immune to slow-host drift, JIT
  * warmup, and pass effects. Dev tool, not a graded surface.
  */
object DragProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val streamQ = if (args.length > 1) args(1) else "stream_view_click_outer"
    val sentinelQ = if (args.length > 2) args(2) else "text_tfidf_top"
    val iters = if (args.length > 3) args(3).toInt else 10
    val cpus = Runtime.getRuntime.availableProcessors()
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // whole-stage-codegen class cache sized for a multi-query session
      // (round 11, VERDICT r10 task 2): the default 100-entry LRU is
      // evicted by any plan-heavy query, so in a 365-query session every
      // query re-Janino-compiles all its generated stages on every pass
      // (~1s on the hot whole-frame-window queries — the whole measured
      // "bench-context inflation"; tools/AltProbe bisected it, and
      // 10000 entries restored isolated-best times with other queries
      // interleaved). JVM-static: must be set at builder time.
      .config("spark.sql.codegen.cache.maxEntries", "10000")
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
    run(sentinelQ); run(streamQ) // warm both paths
    val on = collection.mutable.Buffer.empty[Double]
    val off = collection.mutable.Buffer.empty[Double]
    for (i <- 1 to iters; mode <- Seq(true, false)) {
      spark.conf.set("spark.graft.streamStateRelease", mode.toString)
      run(streamQ)
      val t = run(sentinelQ)
      val prov = org.apache.spark.sql.graft.StateHooks.loadedProviderCount()
      System.err.println(
        f"[drag] iter $i release=$mode sentinel=$t%.3f s loadedProviders=$prov threads=${Thread.activeCount()}")
      (if (mode) on else off) += t
    }
    // thread census: names grouped by prefix (digits stripped) so the
    // leaking pool is identifiable
    val tg = Thread.getAllStackTraces.keySet()
    val hist = new java.util.TreeMap[String, Integer]()
    tg.forEach { t =>
      val k = t.getName.replaceAll("[0-9]+", "#")
      hist.merge(k, 1, (a, b) => a + b)
    }
    hist.forEach((k, v) => if (v >= 3) System.err.println(f"[drag] thr $v%4d $k"))
    def stats(xs: Seq[Double]) =
      f"median=${xs.sorted.apply(xs.size / 2)}%.3f mean=${xs.sum / xs.size}%.3f min=${xs.min}%.3f"
    System.err.println(s"[drag] sentinel with release ON : ${stats(on.toSeq)}")
    System.err.println(s"[drag] sentinel with release OFF: ${stats(off.toSeq)}")
    spark.stop()
  }
}
