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

  /** Integer-exact component quantization: `round(x * 2^20)` per element,
    * kept as an INTEGRAL-VALUED double array.
    *
    * Why this kills the cross-engine rounding hazard for good: the stored
    * embeddings are FLOATs (24-bit mantissa), so `x * 2^20` is a pure
    * power-of-two rescale — NO rounding happens on either engine — and
    * `round()` of that exact value is the same integer everywhere. Every
    * quantized component is ≤ ~5.5e5, so every pairwise product is ≤ ~3e11
    * and every 64-term dot/norm sum is ≤ ~2e13 — all integers below 2^53,
    * meaning double arithmetic computes them EXACTLY (any summation order,
    * any engine). Downstream cosines derived from these identical integers
    * via correctly-rounded IEEE ops (cast, multiply, sqrt, divide) are
    * bit-equal across Spark and DuckDB, so 6-dp/micro rounding can never
    * again land on different sides of a boundary (the `rag_context_pack`
    * driver-red of rounds 4-5).
    */
  def quantize(c: Column): Column = transform(c, x => round(x * 1048576))

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

  /** Exact integer rank key for cosine ordering over QUANTIZED vectors:
    * sign-preserving `(dot·|dot|·10^10) div (nq·ni)` — a pure-integer,
    * truncating division both engines compute identically (Spark
    * `IntegralDivide` and DuckDB `//` both truncate toward zero), monotone
    * non-decreasing in the true cosine (it is trunc(sign·cos²·10^10)).
    * Magnitudes: |dot| ≤ 2e13 so dot² ≤ 4e26 and dot²·10^10 ≤ 4e36 <
    * 10^38 — fits DECIMAL(38,0) here and HUGEINT in the oracle. Candidates
    * whose cos² agree within 1e-10 tie and fall to the `cand` tiebreak —
    * deterministically, on both engines, because the key is exact.
    */
  def cosRankKey(dotL: Column, nq: Column, ni: Column): Column = {
    import org.apache.spark.sql.GraftSqlBridge
    val num = dotL.cast("decimal(19,0)") * abs(dotL).cast("decimal(19,0)") *
      lit(10000000000L).cast("decimal(11,0)")
    val den = nq.cast("decimal(19,0)") * ni.cast("decimal(19,0)")
    GraftSqlBridge.column(
      new org.apache.spark.sql.catalyst.expressions.IntegralDivide(
        GraftSqlBridge.expression(num), GraftSqlBridge.expression(den)))
  }

  /** Bit-identical cosine from exact integer dot/norms: cast (exact,
    * values < 2^53), one double multiply, one sqrt, one divide — all
    * correctly-rounded IEEE ops, so identical integer inputs give
    * bit-equal doubles on every engine. The oracle must spell the SAME
    * formula: `CAST(dot AS DOUBLE) / sqrt(CAST(nq AS DOUBLE) * CAST(ni
    * AS DOUBLE))`.
    */
  def cosFromInts(dotL: Column, nq: Column, ni: Column): Column =
    dotL.cast(DoubleType) / sqrt(nq.cast(DoubleType) * ni.cast(DoubleType))

  /** Brute-force top-k neighbors for each query vector — integer-exact:
    * components quantize to `round(x·2^20)` ([[quantize]]), dot/norms are
    * exact integers, ranking uses [[cosRankKey]] (no double-typed
    * comparison anywhere in the ordering), and the emitted `cos` is the
    * bit-identical [[cosFromInts]] double.
    * @param corpus (id, vec double[]) — full corpus
    * @param queries (q_id, qv double[]) — broadcast-small query set
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val c2 = corpus.select(col("id"), quantize(col("vec")).as("v"))
      .withColumn("ni", dot(col("v"), col("v")).cast("long"))
    val q2 = queries.select(col("q_id"), quantize(col("qv")).as("qv"))
      .withColumn("nq", dot(col("qv"), col("qv")).cast("long"))
    val scored = c2.crossJoin(broadcast(q2))
      .filter(col("id") =!= col("q_id"))
      .select(col("q_id"), col("id").as("cand"),
        dot(col("qv"), col("v")).cast("long").as("dot_l"),
        col("nq"), col("ni"))
      .withColumn("rk_key", cosRankKey(col("dot_l"), col("nq"), col("ni")))
      .withColumn("cos", cosFromInts(col("dot_l"), col("nq"), col("ni")))
    val w = Window.partitionBy("q_id").orderBy(desc("rk_key"), col("cand"))
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
