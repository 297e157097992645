package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics beyond connected components
  * ([[Dedup.connectedComponents]]): PageRank over a distributed edge
  * list, in INTEGER arithmetic so every round is bit-exact across
  * engines and partition orders.
  *
  * Floating-point PageRank sums neighbor contributions in shuffle
  * order — nondeterministic in the low bits, so no hash-compare oracle
  * could grade it. Scaling ranks to integers (1.0 ≡ 1,000,000) makes
  * every contribution sum order-independent and every round a pure
  * function of the previous one: `contrib = rank div outdeg`,
  * `rank' = 0.15·scale + (850 · Σ contrib) div 1000`. Dangling mass is
  * dropped (not redistributed) on both engines alike.
  */
object Graph {

  val Scale = 1000000L

  /** Fixed-round integer PageRank. One edge-join + one dst-groupBy per
    * round (two shuffles); ranks are localCheckpoint'ed each round so
    * round N's plan never re-analyzes round N−1's lineage, and the
    * previous round's blocks are freed eagerly (same discipline as
    * [[Dedup.connectedComponents]] — Dataset.unpersist does NOT free
    * checkpoint blocks). At 100 TB: edges pre-partitioned by src makes
    * the join exchange-free on one side; rounds stay O(edges) each.
    *
    * @param edgesIn two-column (src, dst) directed edge frame; dedup'd
    *                internally.
    */
  def pageRankInt(edgesIn: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1, s"pageRankInt needs iters >= 1, got $iters")
    import Iterate.checkpointRdd
    // pre-partition the (cached) edge list on the join key: the cached
    // partitioning satisfies every round's join requirement, so rounds
    // shuffle only the |nodes|-sized rank table, never the edge list —
    // the same co-location a production run gets from bucketing edges
    val edges = edgesIn.toDF("src", "dst").distinct()
      .repartition(col("src")).cache()
    try {
      val nodes = edges.select(col("src").as("node"))
        .union(edges.select(col("dst").as("node"))).distinct().cache()
      try {
        val outdeg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
        var ranks = nodes.select(col("node"), lit(Scale).as("rank"))
          .localCheckpoint(true)
        var lastCp = ranks
        for (i <- 1 to iters) {
          val contribs = edges
            .join(ranks.withColumnRenamed("node", "src"), "src")
            .join(outdeg, "src")
            .select(col("dst"), expr("rank div deg").as("contrib"))
          val incoming = contribs.groupBy("dst").agg(sum("contrib").as("incoming"))
          val next = nodes
            .join(incoming.withColumnRenamed("dst", "node"), Seq("node"), "left")
            .select(col("node"),
              expr(s"${Scale * 15 / 100} + (850 * coalesce(incoming, 0L)) div 1000")
                .as("rank"))
          // checkpoint every SECOND round: with a fixed round count there
          // is no per-round driver read, so letting the lineage span two
          // rounds halves the materialization jobs while keeping plan
          // depth (and re-analysis cost) bounded — the unbounded-rounds
          // loop in Dedup.connectedComponents can't do this because its
          // fixpoint check forces a job every round anyway
          if (i % 2 == 0 || i == iters) {
            val cp = next.localCheckpoint(true)
            checkpointRdd(lastCp).foreach(_.unpersist(blocking = false))
            lastCp = cp
            ranks = cp
          } else {
            ranks = next
          }
        }
        ranks
      } finally nodes.unpersist(blocking = false)
    } finally edges.unpersist(blocking = false)
  }
}
