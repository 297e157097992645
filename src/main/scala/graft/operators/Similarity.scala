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

  /** Composed-builtins dot product — the no-custom-code fallback. */
  def dotComposed(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** Native codegen'd dot product (graft.plans.ArrayDotProduct): same
    * left-to-right double accumulation as the composed form (bit-identical
    * results), without the intermediate zip array or per-element lambda
    * dispatch.
    */
  def dot(a: Column, b: Column): Column = graft.plans.ArrayDotProduct(a, b)

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
    *
    * The plane matrix ships as ONE `typedlit` literal and the signature is
    * a single nested fold — N separate 64-literal arrays would blow the
    * expression tree up ~100× and stall codegen (observed: 56 s → sub-s
    * on 2 k rows at sf0.1).
    */
  def hyperplaneSig(vec: Column, nPlanes: Int, dim: Int): Column =
    hyperplaneSigFrom(vec, 0, nPlanes, dim)

  /** Signature over the plane range [from, from+nPlanes) — `from = 0` is
    * the base signature; a nonzero `from` yields INDEPENDENT refinement
    * bits for two-level bucketing ([[cappedBucketKey]]).
    */
  def hyperplaneSigFrom(vec: Column, from: Int, nPlanes: Int, dim: Int): Column = {
    val planes: Seq[Seq[Double]] = (from until from + nPlanes).map(p =>
      (0 until dim).map(i => ((p * 131 + i * 31 + 7) % 13 - 6).toDouble))
    val pl = typedlit(planes)
    // dotComposed, not the native array_dot node: when this signature
    // feeds a self-join key, Spark 4.1's constraint inference mis-pushes a
    // filter containing the other side's attributes if a custom expression
    // sits inside the nested lambda (see QueriesExt.sim_neardup_rerank)
    aggregate(sequence(lit(0), lit(nPlanes - 1)), lit(0L), (acc, p) =>
      acc + when(dotComposed(vec, element_at(pl, p + 1)) > 0,
        pow(lit(2.0), p).cast("long")).otherwise(lit(0L)))
  }

  /** Two-level capped bucket key: buckets whose occupancy `n` is within
    * `cap` keep the base signature; oversized buckets are split by
    * `ext` — refinement sign bits from ADDITIONAL hyperplanes — so the
    * within-bucket pair space stops growing as n², without losing
    * determinism (the key is still a pure function of the vector plus the
    * corpus occupancy). Refined keys live above 2^nPlanes so they can
    * never collide with an uncapped base key. Truly indivisible buckets
    * (identical vectors) survive refinement by design: those pairs ARE
    * near-dups and must be enumerated.
    */
  def cappedBucketKey(sig: Column, ext: Column, n: Column,
                      nPlanes: Int, cap: Int): Column =
    when(n <= cap, sig)
      .otherwise(lit(1L << nPlanes) * (ext + 1) + sig)

  /** Bucketed near-dup candidates: corpus self-join on the hyperplane
    * signature, emitting bucket occupancy (linear) rather than pairs.
    */
  def lshBucketed(corpus: DataFrame, nPlanes: Int, dim: Int): DataFrame =
    corpus.select(col("id"), hyperplaneSig(col("vec"), nPlanes, dim).as("sig"))
      .groupBy("sig").agg(count(lit(1)).as("n"), min("id").as("min_id"))
}
