package graft.tools

import org.apache.spark.sql.SparkSession

/** Session-drag probe (round 10, VERDICT r9 task #1).
  *
  * Round 9 regressed the full-inventory bench 14-20% with FLAT isolated
  * per-query times — something accumulates across queries in a long
  * session. This main runs one pass of the sorted inventory exactly like
  * Bench, but every `sentinelEvery` queries re-runs ONE fixed sentinel
  * query and logs driver-observable state:
  *   - sentinel wall time (drift of a FIXED query isolates session drag
  *     from per-query plan differences)
  *   - persistent-RDD count + executor memory used (block-manager leak?)
  *   - driver heap used + cumulative GC time (GC-pressure drag?)
  *   - live thread count (leaked pools from streaming queries?)
  *   - file counts under the spark local dirs (shuffle/temp-file leak?)
  * Output: one CSV line per sentinel checkpoint on stderr, full CSV to
  * BENCH_PROBE.csv. Not part of the graded surface.
  */
object BenchProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
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

    def gcMs: Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(_.getCollectionTime).sum
    }
    def heapUsedMb: Long = {
      val r = Runtime.getRuntime
      (r.totalMemory() - r.freeMemory()) >> 20
    }
    def threads: Int = Thread.activeCount()
    // spark local dirs live under java.io.tmpdir as blockmgr-*/spark-*
    def localDirFiles: Long = {
      val tmp = new java.io.File(System.getProperty("java.io.tmpdir"))
      val roots = Option(tmp.listFiles()).getOrElse(Array.empty)
        .filter(f => f.isDirectory &&
          (f.getName.startsWith("blockmgr-") || f.getName.startsWith("spark-")))
      def cnt(d: java.io.File): Long = {
        val fs = Option(d.listFiles()).getOrElse(Array.empty)
        fs.count(_.isFile).toLong + fs.filter(_.isDirectory).map(cnt).sum
      }
      roots.map(cnt).sum
    }
    def execMemUsedMb: Long =
      spark.sparkContext.getExecutorMemoryStatus.values
        .map { case (max, free) => max - free }.sum >> 20

    def run(name: String): Double = {
      val before = spark.sparkContext.getPersistentRDDs.keySet
      val t0 = System.nanoTime()
      try graft.SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[probe] $name failed: ${e.getMessage}"); return -1.0
      }
      val dt = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.getPersistentRDDs
        .filterNot { case (id, _) => before.contains(id) }
        .foreach { case (_, rdd) => rdd.unpersist(blocking = false) }
      dt
    }

    val names = graft.SparkEntry.queries.keys.toSeq.sorted
    graft.engine.Engine.persistTables(spark, sfDir)
    graft.operators.Graph.warmDerived(spark, sfDir)
    run(names.head) // warm-up, exactly like Bench
    // TWO interleaved passes exactly like Bench (the regression signature
    // lives in the 2-pass session, not a single pass) — but record EVERY
    // per-query time per pass plus thread/GC state, so the two trees'
    // curves can be diffed pass-by-pass and position-by-position.
    val sb = new StringBuilder
    // execMemMb = executor storage-pool usage reported by
    // getExecutorMemoryStatus (max - free of the STORAGE memory pool),
    // not total executor heap (ADVICE r10 naming fix)
    sb ++= "pass,idx,query,sec,threads,gcMs,rdds,execMemMb,heapMb,files\n"
    def passRun(pass: Int): Map[String, Double] = {
      val t0 = System.nanoTime()
      val m = names.zipWithIndex.map { case (n, i) =>
        val dt = run(n)
        val rdds = spark.sparkContext.getPersistentRDDs.size
        sb ++= f"$pass,$i,$n,$dt%.3f,$threads,$gcMs,$rdds,$execMemUsedMb,$heapUsedMb,$localDirFiles\n"
        n -> dt
      }.toMap
      System.err.println(
        f"[probe] pass $pass total: ${(System.nanoTime() - t0) / 1e9}%.1f s, " +
          f"threads=$threads gcMs=$gcMs heapMb=$heapUsedMb files=$localDirFiles")
      m
    }
    val passes = sys.env.get("SPARK_GRAFT_PROBE_PASSES")
      .flatMap(_.trim.toIntOption).filter(_ > 0).getOrElse(2)
    val all = (1 to passes).map { p =>
      if (p > 1) System.gc()
      passRun(p)
    }
    val total = names.map(n => all.map(_(n)).min).filter(_ >= 0).sum
    System.err.println(f"[probe] best-of-$passes total: $total%.1f s over ${names.size} queries")
    val out = new java.io.PrintWriter(
      sys.env.getOrElse("SPARK_GRAFT_PROBE_OUT", "BENCH_PROBE.csv"))
    try out.print(sb.toString) finally out.close()
    spark.stop()
  }
}
