package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of join as a reusable operator (Spark has no native ASOF).
  *
  * Shape: the UNION-MERGE — union both streams with a side flag, one
  * window per key ordered by (time, side, tie-break), carry the most
  * recent right-side values forward with `last(_, ignoreNulls = true)`,
  * keep only left rows. Shuffle cost is O(|left| + |right|) on the key —
  * never the per-key pair space a range-join + top-1 enumerates (measured
  * 34 s+ vs ~1 s at sf0.1 before this shape was adopted; see
  * QueriesMore.j12's history).
  *
  * [[backward]] matching is inclusive: each left row sees the latest
  * right row with the same key and `rightTime <= leftTime` (right rows
  * sort before left rows at equal times). Left rows before any right row
  * get nulls. Ties among right rows at the same time resolve by
  * `rightOrder` ascending, last wins — pass the column that should
  * dominate (e.g. a monotone id).
  *
  * [[forward]] is the mirror: the EARLIEST right row with
  * `rightTime >= leftTime` (same traversal, time descending), ties
  * resolving to the SMALLEST `rightOrder`. Same cost: the direction only
  * flips the window's sort order, not the shuffle shape.
  */
object AsofJoin {

  def backward(left: DataFrame, right: DataFrame,
               keyCols: Seq[String], leftTime: String, rightTime: String,
               carryCols: Seq[String],
               rightOrder: Seq[String] = Nil): DataFrame =
    merge(left, right, keyCols, leftTime, rightTime, carryCols, rightOrder,
      descending = false)

  def forward(left: DataFrame, right: DataFrame,
              keyCols: Seq[String], leftTime: String, rightTime: String,
              carryCols: Seq[String],
              rightOrder: Seq[String] = Nil): DataFrame =
    merge(left, right, keyCols, leftTime, rightTime, carryCols, rightOrder,
      descending = true)

  private def merge(left: DataFrame, right: DataFrame,
                    keyCols: Seq[String], leftTime: String, rightTime: String,
                    carryCols: Seq[String], rightOrder: Seq[String],
                    descending: Boolean): DataFrame = {
    require(carryCols.nonEmpty, "asof join needs at least one carry column")
    require(rightOrder.forall(carryCols.contains),
      s"rightOrder columns must be carried: ${rightOrder.filterNot(carryCols.contains)}")
    val l = left
      .withColumn("__t", col(leftTime))
      .withColumn("__is_left", lit(1))
    // carry cols travel as ONE struct: last(_, ignoreNulls) then picks the
    // whole latest right ROW atomically — per-column carries would stitch
    // values from different rows whenever a carry field is null on the
    // most recent one. The struct itself is non-null on every right row
    // (even with all fields null) and null-filled on left rows by the
    // tolerant union, which is exactly what ignoreNulls needs.
    // SQL comparison semantics for null times: a null rightTime can never
    // satisfy `rt <= t` / `rt >= t`, so those rows are dropped before the
    // merge (otherwise NULLS FIRST/LAST ordering would make them sort to
    // an extreme and get carried as spurious matches); a null leftTime
    // row stays in the output — left join semantics — but matches nothing
    // (masked below).
    val r0 = right.select(
      keyCols.map(col) :+ col(rightTime).as("__t") :+ lit(0).as("__is_left") :+
        struct(carryCols.map(col): _*).as("__carry"): _*)
      .filter(col("__t").isNotNull)
    val merged = l.unionByName(r0, allowMissingColumns = true)
    // descending traversal visits later times first, so the "most recently
    // seen" right row is the earliest one at-or-after the current left row;
    // __is_left stays ascending in both directions (right rows visible to
    // an equal-time left row = inclusive bound)
    val dir: Column => Column = if (descending) _.desc else _.asc
    val order: Seq[Column] =
      dir(col("__t")) +: col("__is_left").asc +:
        rightOrder.map(c => dir(col("__carry").getField(c)))
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = merged.withColumn("__asof",
      when(col("__t").isNotNull, last(col("__carry"), ignoreNulls = true).over(w)))
    carryCols.foldLeft(carried) { (df, c) =>
        df.withColumn(s"asof_$c", col("__asof").getField(c))
      }
      .filter(col("__is_left") === 1)
      .drop("__t", "__is_left", "__carry", "__asof")
  }
}
