package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity
import graft.plans.ArrayDotProduct

/** Native ArrayDotProduct expression vs the composed-builtins form:
  * bit-identical results, null semantics, SQL registration, codegen.
  */
class ArrayDotSpec extends SparkSpec {
  import spark.implicits._

  test("native dot == composed dot bit-for-bit on random-ish vectors") {
    val vecs = (1 to 50).map { i =>
      ((0 until 64).map(j => math.sin(i * 64 + j)).toArray,
        (0 until 64).map(j => math.cos(i * 64 + j)).toArray)
    }
    val df = vecs.toDF("a", "b")
    val out = df.select(
      Similarity.dot($"a", $"b").as("native"),
      Similarity.dotComposed($"a", $"b").as("composed")).collect()
    out.foreach(r => assert(r.getDouble(0) == r.getDouble(1))) // exact
  }

  test("null array → null; empty arrays → 0.0") {
    val df = Seq(
      (Some(Seq(1.0, 2.0)), None: Option[Seq[Double]]),
      (Some(Seq.empty[Double]), Some(Seq.empty[Double])))
      .toDF("a", "b")
    val out = df.select(Similarity.dot($"a", $"b").as("d")).collect()
    assert(out(0).isNullAt(0))
    assert(out(1).getDouble(0) == 0.0)
  }

  test("SQL registration via GraftExtensions-style injection") {
    // same builder the extension installs, registered on the test session
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "array_dot",
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.plans.ArrayDotProduct(children.head, children(1)),
      "built-in")
    val r = spark.sql(
      "SELECT array_dot(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d)) AS d")
      .collect()(0)
    assert(r.getDouble(0) == 32.0)
  }

  test("graft_* SQL functions: the F-surface from pure SQL, same builders the extension installs") {
    graft.plans.GraftExtensions.sqlFunctions.foreach { case (name, arity, f) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, graft.plans.GraftExtensions.expressionBuilder(name, arity, f),
        "built-in")
    }
    val r = spark.sql(
      """SELECT graft_fractional_odds('5/2')              AS odds,
                graft_fractional_odds('junk')             AS bad_odds,
                graft_strip_suffix('Arsenal (ENG)')       AS team,
                graft_haversine(0.0d, 0.0d, 0.0d, 180.0d) AS half_girth,
                CAST(graft_parse_dayfirst('29/02/2024') AS DATE) AS leap,
                graft_parse_dayfirst('31/02/2024')        AS coerced
      """).collect()(0)
    assert(r.getDouble(0) == 3.5)
    assert(r.isNullAt(1))
    assert(r.getString(2) == "Arsenal")
    assert(math.abs(r.getDouble(3) - math.Pi * 6371.0) < 0.5)
    assert(r.getDate(4).toString == "2024-02-29")
    assert(r.isNullAt(5)) // coercing parse: impossible date → null
  }

  test("FuseArrayDot: composed idiom fuses to native node, nested lambdas don't") {
    spark.experimental.extraOptimizations = Seq(graft.plans.FuseArrayDot)
    try {
      val df = spark.range(10)
        .select(array($"id".cast("double"), lit(2.0)).as("a"),
          array(lit(3.0), $"id".cast("double")).as("b"))
        .select(Similarity.dotComposed($"a", $"b").as("d"))
      assert(df.queryExecution.optimizedPlan.toString.contains("array_dot"),
        "composed dot idiom not fused")
      assert(df.orderBy(desc("d")).head().getDouble(0) == 9 * 3.0 + 2.0 * 9)
      // the per-plane dot inside hyperplaneSig references the outer fold
      // variable → must NOT fuse (Spark 4.1 constraint-inference guard)
      val sig = spark.range(3)
        .select(array($"id".cast("double"), lit(1.0), lit(-1.0)).as("v"))
        .select(Similarity.hyperplaneSig($"v", 4, 3).as("s"))
      assert(!sig.queryExecution.optimizedPlan.toString.contains("array_dot"),
        "nested-lambda dot must stay composed")
      sig.collect() // and still executes fine
    } finally spark.experimental.extraOptimizations = Nil
  }

  test("expression participates in whole-stage codegen") {
    // literal Seq.toDF plans as LocalTableScan (no codegen stage); use a
    // range scan so a WholeStageCodegen span exists to assert on
    val df = spark.range(100)
      .select(array($"id".cast("double"), lit(1.0)).as("a"),
        array(lit(2.0), $"id".cast("double")).as("b"))
      .select(ArrayDotProduct($"a", $"b").as("d"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1)") || plan.contains("WholeStageCodegen"))
  }
}
