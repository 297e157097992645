package graft.operators

import org.apache.spark.sql.DataFrame

/** Shared plumbing for iterative DataFrame loops
  * ([[Dedup.connectedComponents]], [[Graph.pageRankInt]]).
  */
private[graft] object Iterate {

  /** The localCheckpoint'ed frame's underlying RDD. Dataset.unpersist()
    * does NOT free checkpoint blocks (they are plain persisted RDDs, not
    * CacheManager entries) — iterative loops must release each round's
    * blocks eagerly via this handle, or executors hold every round's
    * table until GC-driven cleanup.
    */
  def checkpointRdd(df: DataFrame): Option[org.apache.spark.rdd.RDD[_]] =
    df.queryExecution.analyzed.collectLeaves().collectFirst {
      case r: org.apache.spark.sql.execution.LogicalRDD => r.rdd
    }
}
