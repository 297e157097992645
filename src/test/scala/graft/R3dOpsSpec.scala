package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

import graft.operators.Similarity

/** Semantic pins for round-3 batch 4: unigram-LM micro-bit scoring,
  * Matryoshka energy accounting, and the quantile-sketch tolerance.
  */
class R3dOpsSpec extends SparkSpec {

  import spark.implicits._

  test("unigram logprob: known 3-token corpus scores exact micro-bits") {
    // corpus = one doc "a a b": p(a)=2/3, p(b)=1/3
    val toks = Seq((1L, "a"), (1L, "a"), (1L, "b")).toDF("doc_id", "tok")
    val cnts = toks.groupBy("tok").agg(count(lit(1)).as("cnt"))
    val total = cnts.agg(sum("cnt").as("total"))
    val model = cnts.crossJoin(broadcast(total))
      .select(col("tok"),
        round(-log2(col("cnt").cast(DoubleType) / col("total").cast(DoubleType))
          * 1e6, 0).cast(LongType).as("nll_micro"))
    val got = toks.join(model, "tok").groupBy("doc_id")
      .agg(count(lit(1)).as("n_toks"), sum("nll_micro").as("s_micro"))
      .as[(Long, Long, Long)].head()
    val bitsA = math.round(-math.log(2.0 / 3.0) / math.log(2.0) * 1e6)
    val bitsB = math.round(-math.log(1.0 / 3.0) / math.log(2.0) * 1e6)
    assert(got === ((1L, 3L, 2 * bitsA + bitsB)))
  }

  test("matryoshka energy: prefix-concentrated vs uniform vectors") {
    val df = Seq(
      (1L, Array.tabulate(64)(i => if (i < 16) 1.0 else 0.0)), // all in stub
      (2L, Array.fill(64)(0.5))) // uniform → 16/64 = 0.25
      .toDF("vec_id", "v")
    val v16 = slice(col("v"), 1, 16)
    val got = df.select(col("vec_id"),
      round(Similarity.dotComposed(v16, v16) /
        Similarity.dotComposed(col("v"), col("v")), 6).as("f"))
      .as[(Long, Double)].collect().toMap
    assert(got === Map(1L -> 1.0, 2L -> 0.25))
  }

  test("percentile_approx at accuracy 10000 lands within 1% of exact") {
    val df = (1 to 20000).map(i => ("g", i.toDouble)).toDF("flag", "x")
    val row = df.groupBy("flag")
      .agg(percentile_approx(col("x"), array(lit(0.5), lit(0.99)), lit(10000))
        .as("ap"),
        expr("percentile(x, array(0.5D, 0.99D))").as("ex"))
      .select(
        (abs(element_at(col("ap"), 1) - element_at(col("ex"), 1)) <=
          lit(0.01) * element_at(col("ex"), 1)).as("ok50"),
        (abs(element_at(col("ap"), 2) - element_at(col("ex"), 2)) <=
          lit(0.01) * element_at(col("ex"), 2)).as("ok99"))
      .as[(Boolean, Boolean)].head()
    assert(row === ((true, true)))
  }
}
