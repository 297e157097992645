package graft.tools

import org.apache.spark.sql.SparkSession

/** Reproduce and bisect the BENCH-CONTEXT INFLATION (VERDICT r10 task 2):
  * ~10 hot queries run ~3× slower inside a 365-query bench session than
  * isolated (w30_winsorized 2.06 vs 0.69, ml_naive_bayes_lang 2.01 vs
  * 0.60, stat_levene 2.14 vs 0.80), with flat quartiles — i.e. not the
  * r9 cross-query drag, but per-query pressure in a busy session.
  *
  * Method: one JVM, alternating blocks —
  *   [time hot set] → [pressure block: run N heavy queries] →
  *   [time hot set] → [System.gc(); time hot set] → repeat
  * with per-sample GC-ms, GC-count, heap, storage-memory and
  * code-cache readings. If post-pressure hot times inflate and the
  * post-gc arm recovers them → garbage/allocation pressure; if post-gc
  * stays inflated → live occupancy (storage pool / fragmentation) or
  * JIT deopt. Dev tool, not a graded surface.
  */
object ContextProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val hot = (if (args.length > 1) args(1)
               else "w30_winsorized,ml_naive_bayes_lang,stat_levene,stat_spearman")
      .split(",").toSeq
    val heavy = (if (args.length > 2) args(2)
                 else "g7_hits,g4_bfs_hops,g1_pagerank,dedup_components," +
                   "dedup_minhash_lsh,j12_asof_join,eval_bleu_corpus," +
                   "text_bpe_train,ann_ivf_topk,er_name_cluster")
      .split(",").toSeq
    val iters = if (args.length > 3) args(3).toInt else 3
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
      .config("spark.graft.streamResultMemo", "false")
      .getOrCreate()
    graft.engine.Engine.fixtureFloorConfs(spark, sfDir)
    spark.sparkContext.setLogLevel("ERROR")

    val gcBeans = java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
    def gcMs: Long = { var s = 0L; gcBeans.forEach(b => s += b.getCollectionTime); s }
    def gcN: Long = { var s = 0L; gcBeans.forEach(b => s += b.getCollectionCount); s }
    def heapMb: Long = {
      val r = Runtime.getRuntime; (r.totalMemory - r.freeMemory) >> 20
    }
    def storMb: Long =
      spark.sparkContext.getExecutorMemoryStatus.values
        .map { case (max, free) => max - free }.sum >> 20
    def codeCacheMb: Long = {
      var used = 0L
      java.lang.management.ManagementFactory.getMemoryPoolMXBeans.forEach { p =>
        if (p.getName.contains("CodeHeap") || p.getName.contains("Code Cache"))
          used += p.getUsage.getUsed
      }
      used >> 20
    }

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
    def hotSample(tag: String): Unit = {
      val g0 = gcMs; val n0 = gcN
      val times = hot.map(q => q -> run(q))
      System.err.println(f"[ctx] $tag%-16s gcMs=+${gcMs - g0} gcN=+${gcN - n0} " +
        f"heap=${heapMb}M stor=${storMb}M code=${codeCacheMb}M " +
        times.map { case (q, t) => f"$q=$t%.2f" }.mkString(" "))
    }

    graft.engine.Engine.persistTables(spark, sfDir)
    graft.operators.Graph.warmDerived(spark, sfDir)
    hot.foreach(run); hot.foreach(run) // warm
    hotSample("baseline-a")
    hotSample("baseline-b")
    for (i <- 1 to iters) {
      val g0 = gcMs
      heavy.foreach(run)
      System.err.println(f"[ctx] pressure block $i done (gcMs=+${gcMs - g0})")
      hotSample(s"post-press-$i")
      System.gc(); Thread.sleep(300)
      hotSample(s"post-gc-$i")
    }
    spark.stop()
  }
}
