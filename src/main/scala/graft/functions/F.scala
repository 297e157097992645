package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType}

/** Scalar-function surface of the engine (SURVEY §2.5, rows F1–F17).
  *
  * Everything here is a pure Catalyst column expression — zero `udf()`
  * registrations, so every function stays inside whole-stage codegen and
  * vectorized evaluation. Each function cites the reference behavior it
  * reproduces (reference = maggs1013/ucl-data-pipeline, read-only at
  * /root/reference).
  */
object F {

  /** F1 — coercing day-first date parse (`dd/MM/yyyy`; unparseable → null).
    * Reference: scripts/fetch_football_data.py:45
    * (`pd.to_datetime(errors="coerce", dayfirst=True)`). Spark 4's
    * CORRECTED parser policy already yields null on bad input via
    * `try_to_timestamp`.
    */
  def parseDateDayFirst(c: Column): Column = try_to_timestamp(c, lit("dd/MM/yyyy"))

  /** F2 — ISO-8601 timestamp parse, tz handled by UTC session.
    * Reference: scripts/fetch_the_odds_api.py:46,148 (tz_localize(None)).
    */
  def parseIso(c: Column): Column = try_to_timestamp(c)

  /** F3 — null default. Reference: scripts/enrich_features.py:31 etc. */
  def fillNull(c: Column, default: Column): Column = coalesce(c, default)

  /** F4 — conditional keep (`Series.where`): keep `c` where non-null else
    * `other`. Reference: scripts/enrich_features.py:29-30.
    */
  def keepOr(c: Column, other: Column): Column =
    when(c.isNotNull, c).otherwise(other)

  /** F5 — trim. Reference: scripts/enrich_features.py:40,43. */
  def strip(c: Column): Column = trim(c)

  /** F6 — strip a trailing parenthesized suffix ("Team (ENG)" → "Team").
    * Reference: scripts/fetch_fbr_team_xg.py:61.
    */
  def stripParenSuffix(c: Column): Column =
    regexp_replace(c, "\\s+\\(.*\\)$", "")

  /** F7 — fractional → decimal odds: "a/b" → 1 + a/b; plain numerics pass
    * through; junk → null. Reference: scripts/utils.py:10-17.
    */
  def fractionalToDecimal(c: Column): Column = {
    val num = split(c, "/").getItem(0).try_cast(DoubleType)
    val den = split(c, "/").getItem(1).try_cast(DoubleType)
    when(c.contains("/"), lit(1.0) + num / den)
      .otherwise(c.try_cast(DoubleType))
  }

  /** F8 — haversine great-circle distance in km, R = 6371.
    * Reference: scripts/enrich_features.py:8-15. Pure column math — no UDF,
    * stays codegen'd.
    */
  def haversineKm(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column = {
    val dphi = radians(lat2 - lat1) / 2
    val dlmb = radians(lon2 - lon1) / 2
    val a = pow(sin(dphi), 2) +
      cos(radians(lat1)) * cos(radians(lat2)) * pow(sin(dlmb), 2)
    // clamp: fp rounding can push `a` past 1.0, turning asin into NaN
    lit(2 * 6371.0) * asin(sqrt(least(lit(1.0), a)))
  }

  /** F8b — haversine with the reference's 200.0 km fallback when any
    * coordinate is null. Reference: scripts/enrich_features.py:114-116.
    */
  def haversineKmOrDefault(lat1: Column, lon1: Column, lat2: Column, lon2: Column,
                           default: Double = 200.0): Column =
    when(lat1.isNull || lon1.isNull || lat2.isNull || lon2.isNull, lit(default))
      .otherwise(haversineKm(lat1, lon1, lat2, lon2))

  /** F9 — coercing numeric cast (junk → null, matching pandas
    * `to_numeric(errors="coerce")` under Spark 4's default ANSI mode).
    * Reference: scripts/fetch_fbr_team_xg.py:110-111.
    */
  def toDouble(c: Column): Column = c.try_cast(DoubleType)

  /** F10 — weighted null-tolerant blend: wa*a + wb*b if both present, else
    * whichever is present, else null.
    * Reference: scripts/fetch_fbr_team_xg.py:113-123 (weights 0.60/0.40).
    */
  def weightedBlend(a: Column, b: Column, wa: Double = 0.60, wb: Double = 0.40): Column =
    when(a.isNotNull && b.isNotNull, lit(wa) * a + lit(wb) * b)
      .otherwise(coalesce(a, b))

  /** F11 — clamp to [lo, hi]; null/non-numeric → midpoint.
    * Reference: scripts/bootstrap_team_priors.py:8-11.
    */
  def clampMid(c: Column, lo: Double, hi: Double): Column = {
    // NB: Spark's greatest/least SKIP nulls (null, lo) → lo, so a bare
    // coalesce-around-clamp would send null to `lo`, not the midpoint.
    // Guard the null/uncastable branch explicitly.
    val v = c.try_cast(DoubleType)
    when(v.isNull, lit((lo + hi) / 2.0))
      .otherwise(least(greatest(v, lit(lo)), lit(hi)))
  }

  /** F12 — sign-step heuristic: base + step*sign(c), null → 0 step.
    * Reference: scripts/bootstrap_team_priors.py:27 (0.55 + 0.10*sign).
    */
  def signStep(c: Column, base: Double = 0.55, step: Double = 0.10): Column =
    lit(base) + lit(step) * when(c > 0, 1).when(c < 0, -1).otherwise(0)

  /** F13 — floored decay rate: base − k*max(0, c/scale), null c → 0.
    * Reference: scripts/bootstrap_team_priors.py:28
    * (0.80 − 0.15*max(0, xga/34)).
    */
  def floorRate(c: Column, base: Double = 0.80, k: Double = 0.15,
                scale: Double = 34.0): Column =
    lit(base) - lit(k) * greatest(lit(0.0), coalesce(c, lit(0.0)) / lit(scale))

  /** F14 — flag cast: null → 0 → int.
    * Reference: scripts/enrich_features.py:102.
    */
  def flagInt(c: Column): Column = coalesce(c, lit(0)).cast(IntegerType)

  /** Space-joined word n-gram array, built INCREMENTALLY: each n-gram
    * extends the (n−1)-gram one token, via nested `zip_with` over the
    * (n−1)-gram array minus its last element and the token array shifted
    * by n−1. The naive `transform(sequence(...), i -> concat_ws(slice(
    * toks, i, n)))` allocates a fresh n-element slice and re-joins all n
    * tokens PER POSITION — Σn² interpreted-lambda work per document
    * (higher-order functions never enter whole-stage codegen); the
    * incremental form is Σn. Same strings, same downstream hashes —
    * measured 1.28 → 0.68 s on eval_bleu_corpus (round 11) and applied
    * to the 5-gram boilerplate family (round 12). Total (ADVICE r12):
    * arrays shorter than n yield an EMPTY array — without the guard the
    * fold's negative slice lengths were undefined, and every caller had
    * to remember the `size(toks) >= n` filter.
    */
  def ngrams(arr: Column, n: Int): Column = {
    val folded = (2 to n).foldLeft(arr) { (prev, k) =>
      zip_with(
        slice(prev, lit(1), size(prev) - 1),
        slice(arr, lit(k), size(arr) - k + 1),
        (a, b) => concat(a, lit(" "), b))
    }
    if (n <= 1) folded
    else when(size(arr) >= n, folded)
      .otherwise(array().cast("array<string>"))
  }

  /** F15 — constant feature defaults, centralized (the reference repeats
    * these literals in three places and they must agree:
    * scripts/fetch_football_data.py:48-52, scripts/enrich_features.py:48-52,
    * scripts/enrich_features.py:160-168).
    */
  object Defaults {
    val restDays = 4
    val travelKmHome = 0.0
    val travelKmAway = 200.0
    val injuryIndex = 0.3
    val gkRating = 0.6
    val setpieceRating = 0.6
    val refPenRate = 0.30
    val crowdIndex = 0.7
  }
}
