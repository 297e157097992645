package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Pins connectedComponents' O(log diameter) convergence — the round-8
  * claim that pointer jumping chases THIS round's pointer table, not the
  * previous round's. A 64-node path graph has diameter 63: one-step
  * label propagation needs ~63 rounds and even one-step-behind jumping
  * needs ~O(diameter); true pointer jumping halves chain depth per
  * round, so capping maxIters at 9 (log2 64 = 6, plus propagation and
  * fixpoint-confirm slack) only converges if the log-round behavior
  * holds. Wrong labels on ANY node = the cap was hit before fixpoint.
  */
class ComponentsConvergenceSpec extends SparkSpec {

  test("a 64-node path converges to one component within 9 rounds") {
    import spark.implicits._
    val edges = (0L until 63L).map(i => (i, i + 1)).toDF("a", "b")
    val nodes = (0L until 64L).toDF("id")
    val out = Dedup.connectedComponents(nodes, edges, maxIters = 9, parts = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.size == 64)
    assert(out.values.forall(_ == 0L),
      s"path did not converge to the min label within 9 rounds: " +
        s"${out.filter(_._2 != 0L).take(5)}")
  }

  test("two disjoint paths keep distinct component minima") {
    import spark.implicits._
    // path 0..15 and path 100..115
    val edges = ((0L until 15L).map(i => (i, i + 1)) ++
      (100L until 115L).map(i => (i, i + 1))).toDF("a", "b")
    val nodes = ((0L to 15L) ++ (100L to 115L)).toDF("id")
    val out = Dedup.connectedComponents(nodes, edges, maxIters = 8, parts = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((0L to 15L).forall(out(_) == 0L))
    assert((100L to 115L).forall(out(_) == 100L))
  }
}
