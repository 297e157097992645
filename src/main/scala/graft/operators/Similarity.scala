package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DoubleType

/** Similarity search over an embedding column (`array<float>`).
  *
  * Brute-force cosine top-k is the correctness baseline: broadcast the
  * (small) query set against the full corpus — a map-only pass at any
  * scale, no shuffle except the final per-query top-k.
  *
  * The scale path is [[lshBucketed]]: random-hyperplane signs bucket the
  * corpus so candidate generation is a hash join on the signature instead
  * of a full cross product (IVF-style recall/latency trade).
  *
  * Dot products are double-precision left-to-right folds (`zip_with` +
  * `aggregate`) — deterministic and identical to the oracle's sequential
  * `list_dot_product`, and fully codegen'd (no UDF).
  */
object Similarity {

  def toDoubleVec(c: Column): Column = transform(c, x => x.cast(DoubleType))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** Brute-force top-k neighbors for each query vector.
    * @param corpus (id, vec double[]) — full corpus
    * @param queries (q_id, qv double[]) — broadcast-small query set
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val scored = corpus.crossJoin(broadcast(queries))
      .filter(col("id") =!= col("q_id"))
      .select(col("q_id"), col("id").as("cand"),
        round(cosine(col("qv"), col("vec")), 6).as("cos"))
    val w = Window.partitionBy("q_id").orderBy(desc("cos"), col("cand"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Random-hyperplane LSH signature: sign bits of dot products against
    * `nPlanes` deterministic pseudo-random hyperplanes (plane p, dim i
    * weight = ((p·131 + i·31 + 7) mod 13) − 6). Vectors in the same bucket
    * are near-duplicates candidates; join buckets instead of crossing the
    * corpus.
    */
  def hyperplaneSig(vec: Column, nPlanes: Int, dim: Int): Column = {
    val bits = (0 until nPlanes).map { p =>
      val d = dot(vec, array((0 until dim).map(i =>
        lit(((p * 131 + i * 31 + 7) % 13 - 6).toDouble)): _*))
      when(d > 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** Bucketed near-dup candidates: corpus self-join on the hyperplane
    * signature, emitting bucket occupancy (linear) rather than pairs.
    */
  def lshBucketed(corpus: DataFrame, nPlanes: Int, dim: Int): DataFrame =
    corpus.select(col("id"), hyperplaneSig(col("vec"), nPlanes, dim).as("sig"))
      .groupBy("sig").agg(count(lit(1)).as("n"), min("id").as("min_id"))
}
