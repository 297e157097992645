package graft

import org.apache.spark.sql.functions._
import graft.functions.F

/** Scalar-function surface (SURVEY §2.5) — edge cases per reference
  * semantics, including the pandas-delta guards from SURVEY §4.
  */
class FSpec extends SparkSpec {
  import spark.implicits._

  test("F1 day-first coercing parse: valid, leap day, junk") {
    val out = Seq("29/02/2024", "01/12/2023", "not a date", "31/02/2024")
      .toDF("s").select(F.parseDateDayFirst($"s").as("t"))
      .collect().map(r => Option(r.get(0)).map(_.toString))
    assert(out(0).contains("2024-02-29 00:00:00.0"))
    assert(out(1).contains("2023-12-01 00:00:00.0"))
    assert(out(2).isEmpty)
    assert(out(3).isEmpty) // Feb 31 → coerced null, not an error
  }

  test("F7 fractional odds: a/b, plain numeric, junk") {
    val out = Seq("5/2", "2.5", "junk", "7/4").toDF("s")
      .select(F.fractionalToDecimal($"s").as("d"))
      .collect().map(r => Option(r.get(0)))
    assert(out(0).contains(3.5))
    assert(out(1).contains(2.5))
    assert(out(2).isEmpty)
    assert(out(3).contains(2.75))
  }

  test("F8 haversine: zero distance, known distance, fp clamp") {
    val out = Seq((0.0, 0.0, 0.0, 0.0), (48.8566, 2.3522, 51.5074, -0.1278),
        (90.0, 0.0, 90.0, 180.0)) // antipodal-pole case exercises the clamp
      .toDF("a", "b", "c", "d")
      .select(F.haversineKm($"a", $"b", $"c", $"d").as("km"))
      .collect().map(_.getDouble(0))
    assert(out(0) == 0.0)
    assert(math.abs(out(1) - 343.5) < 1.0) // Paris→London ≈ 343.5 km
    assert(!out(2).isNaN)
  }

  test("F8b haversine null fallback is 200 km") {
    val out = Seq((Some(1.0), None: Option[Double])).toDF("lat", "lon")
      .select(F.haversineKmOrDefault($"lat", $"lon", lit(2.0), lit(2.0)).as("km"))
      .collect()
    assert(out(0).getDouble(0) == 200.0)
  }

  test("F10 weighted blend: both, left-only, right-only, neither") {
    val out = Seq((Some(10.0), Some(20.0)), (Some(10.0), None),
        (None: Option[Double], Some(20.0)), (None: Option[Double], None: Option[Double]))
      .toDF("a", "b").select(F.weightedBlend($"a", $"b").as("x"))
      .collect().map(r => Option(r.get(0)))
    assert(out(0).contains(14.0)) // 0.6*10 + 0.4*20
    assert(out(1).contains(10.0))
    assert(out(2).contains(20.0))
    assert(out(3).isEmpty)
  }

  test("F11 clamp: inside, below, above, null→midpoint") {
    val out = Seq(Some(0.5), Some(-3.0), Some(9.0), None)
      .toDF("x").select(F.clampMid($"x", 0.0, 1.0).as("c"))
      .collect().map(_.getDouble(0))
    assert(out.toSeq == Seq(0.5, 0.0, 1.0, 0.5))
  }

  test("F12 sign step / F13 floor rate") {
    val out = Seq((5.0, 34.0), (-2.0, 0.0), (0.0, 68.0)).toDF("x", "y")
      .select(F.signStep($"x").as("s"), F.floorRate($"y").as("r"))
      .collect()
    assert(math.abs(out(0).getDouble(0) - 0.65) < 1e-9)
    assert(math.abs(out(0).getDouble(1) - 0.65) < 1e-9)
    assert(math.abs(out(1).getDouble(0) - 0.45) < 1e-9)
    assert(out(1).getDouble(1) == 0.80)
    assert(math.abs(out(2).getDouble(0) - 0.55) < 1e-9)
    assert(math.abs(out(2).getDouble(1) - 0.50) < 1e-9)
  }

  test("F14 flag int: null→0, value→int") {
    val out = Seq(Some(1), None).toDF("x").select(F.flagInt($"x").as("f"))
      .collect().map(_.getInt(0))
    assert(out.toSeq == Seq(1, 0))
  }

  test("F6 strip paren suffix leaves plain names alone") {
    val out = Seq("Arsenal (ENG)", "Real Madrid", "A (B) (C)").toDF("s")
      .select(F.stripParenSuffix($"s").as("x")).collect().map(_.getString(0))
    assert(out.toSeq == Seq("Arsenal", "Real Madrid", "A"))
  }
}
