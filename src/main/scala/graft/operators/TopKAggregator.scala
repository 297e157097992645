package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` extension point (SURVEY §2.7): bounded top-k by
  * score with O(k) state per group — the UDAF shape for rankings that
  * must NOT buffer a group's full row set (contrast: window row_number
  * materializes and sorts every row of the partition).
  *
  * State is a min-heap of size ≤ k: merge cost O(log k) per row, merges
  * between partial buffers O(k log k) — partial-aggregatable, so map-side
  * combine applies before the shuffle like any built-in agg.
  */
object TopKAggregator {

  type Scored = (Long, Double) // (id, score)

  final case class TopKBuffer(items: Seq[Scored])

  def topK(k: Int): Aggregator[Scored, TopKBuffer, Seq[Scored]] =
    new Aggregator[Scored, TopKBuffer, Seq[Scored]] {
      private def ord: Ordering[Scored] = Ordering.by { case (id, s) => (s, -id) }

      override def zero: TopKBuffer = TopKBuffer(Seq.empty)

      private def push(heap: mutable.PriorityQueue[Scored], x: Scored, k: Int): Unit = {
        heap.enqueue(x)
        if (heap.size > k) heap.dequeue() // drop the smallest
      }

      override def reduce(b: TopKBuffer, a: Scored): TopKBuffer = {
        val heap = mutable.PriorityQueue(b.items: _*)(ord.reverse) // min-heap
        push(heap, a, k)
        TopKBuffer(heap.toSeq)
      }

      override def merge(b1: TopKBuffer, b2: TopKBuffer): TopKBuffer = {
        val heap = mutable.PriorityQueue(b1.items: _*)(ord.reverse)
        b2.items.foreach(push(heap, _, k))
        TopKBuffer(heap.toSeq)
      }

      override def finish(r: TopKBuffer): Seq[Scored] =
        r.items.sorted(ord.reverse) // best first, deterministic tie-break

      override def bufferEncoder: Encoder[TopKBuffer] = Encoders.product[TopKBuffer]
      override def outputEncoder: Encoder[Seq[Scored]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    }
}
