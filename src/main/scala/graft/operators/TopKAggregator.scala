package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` extension point (SURVEY §2.7): bounded top-k by
  * score with O(k) state per group — the UDAF shape for rankings that
  * must NOT buffer a group's full row set (contrast: window row_number
  * materializes and sorts every row of the partition).
  *
  * The buffer is a size-≤k sequence kept SORTED ascending (worst item
  * first). Per input row: an O(1) no-allocation reject when the buffer is
  * full and the row can't beat the current minimum — the overwhelmingly
  * common case once a group warms up — else an O(log k)-compare
  * binary-search insert. No heap is ever rebuilt per row (the previous
  * shape paid an O(k) PriorityQueue construction on every input). Buffer
  * merges are O(k log k); partial-aggregatable, so map-side combine
  * applies before the shuffle like any built-in agg.
  */
object TopKAggregator {

  type Scored = (Long, Double) // (id, score)

  /** Invariant: `items` sorted ascending by (score, -id) — items.head is
    * the evictable minimum.
    */
  final case class TopKBuffer(items: Seq[Scored])

  def topK(k: Int): Aggregator[Scored, TopKBuffer, Seq[Scored]] = {
    require(k >= 1, s"topK needs k >= 1, got $k")
    new Aggregator[Scored, TopKBuffer, Seq[Scored]] {
      // val, not def: the ordering is pure and sits on the per-row hot
      // path (fast-reject + every binary-search probe) — a def would
      // allocate a fresh Ordering per call
      private val ord: Ordering[Scored] = Ordering.by { case (id, s) => (s, -id) }

      override def zero: TopKBuffer = TopKBuffer(Seq.empty)

      private def insertPos(items: IndexedSeq[Scored], x: Scored): Int = {
        var lo = 0
        var hi = items.length
        while (lo < hi) {
          val mid = (lo + hi) >>> 1
          if (ord.lt(items(mid), x)) lo = mid + 1 else hi = mid
        }
        lo
      }

      override def reduce(b: TopKBuffer, a: Scored): TopKBuffer = {
        val items = b.items.toIndexedSeq // O(1) on an already-indexed rep
        if (items.length >= k && ord.lteq(a, items.head)) b // fast reject
        else {
          val ins = items.patch(insertPos(items, a), a :: Nil, 0)
          TopKBuffer(if (ins.length > k) ins.drop(1) else ins)
        }
      }

      override def merge(b1: TopKBuffer, b2: TopKBuffer): TopKBuffer = {
        val all = (b1.items ++ b2.items).sorted(ord)
        TopKBuffer(all.takeRight(k))
      }

      override def finish(r: TopKBuffer): Seq[Scored] =
        r.items.sorted(ord.reverse) // best first, deterministic tie-break

      override def bufferEncoder: Encoder[TopKBuffer] = Encoders.product[TopKBuffer]
      override def outputEncoder: Encoder[Seq[Scored]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    }
  }
}
