package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Reusable relational operators of the engine (SURVEY §2.2–2.4).
  *
  * All schema-driven decisions (column present? which candidate exists?)
  * resolve at PLAN time against `df.columns` — never per row — so every
  * operator stays a pure Catalyst plan fragment and scales to arbitrary
  * data sizes with zero driver involvement.
  */
object Ops {

  /** Output sort for REPORT-SIZED results (≤ a few thousand rows), used
    * by ~200 inventory queries via `.transform(Ops.reportSort(...))`.
    *
    * The partition count is a session conf, not a hard-coded shape
    * (ADVICE r10): at fixture scale the default 1 plans a single
    * exchange + in-partition sort — order-equivalent to a global sort
    * but with no RangePartitioner SAMPLING JOB, which is a whole extra
    * job per query for a result that fits one partition. A cluster run
    * over corpus-scale outputs sets `spark.graft.reportSortPartitions`
    * > 1 and the same call plans the normal parallel range sort
    * (`orderBy`) — no code edits, exactly the lever the advisor asked
    * to expose.
    */
  def reportSort(cols: Column*)(df: DataFrame): DataFrame = {
    // malformed knob value degrades to the single-partition default
    // instead of NumberFormatException-ing every report query (ADVICE r11)
    val n = df.sparkSession.conf
      .get("spark.graft.reportSortPartitions", "1").trim
      .toIntOption.filter(_ > 0).getOrElse(1)
    if (n <= 1) df.repartition(1).sortWithinPartitions(cols: _*)
    else df.orderBy(cols: _*)
  }

  def reportSort(first: String, rest: String*)(df: DataFrame): DataFrame =
    reportSort((first +: rest).map(col): _*)(df)

  /** P3 — prefix every column of a dimension table
    * (reference enrich_features.py:53-54 `add_prefix`).
    */
  def prefixAll(df: DataFrame, prefix: String): DataFrame =
    df.select(df.columns.map(c => col(c).as(prefix + c)): _*)

  /** P4 — ensure_cols: add each (name, default) column only if absent
    * (reference enrich_features.py:20-24).
    */
  def ensureCols(df: DataFrame, defaults: Seq[(String, Column)]): DataFrame =
    defaults.foldLeft(df) { case (acc, (c, v)) =>
      if (acc.columns.contains(c)) acc else acc.withColumn(c, v)
    }

  /** P8 — first-present column fallback, resolved against the schema
    * (reference fetch_football_data.py:33-43). The reference picks the
    * FIRST candidate that exists WHOLESALE (`next(c for c in ... if c in
    * df.columns)`) — rows that are null in that column STAY null, they do
    * not back-fill from later candidates. `otherwise` applies only when no
    * candidate column exists at all.
    */
  def firstPresent(df: DataFrame, candidates: Seq[String], otherwise: Column): Column =
    candidates.find(df.columns.contains).map(col).getOrElse(otherwise)

  /** J2 — join only when the fact actually carries the key column; else
    * supply constant defaults (reference enrich_features.py:64-71).
    */
  def joinIfKeyed(fact: DataFrame, dim: DataFrame, key: String,
                  defaults: Seq[(String, Column)]): DataFrame =
    if (fact.columns.contains(key))
      ensureCols(fact.join(broadcast(dim), Seq(key), "left"), defaults)
    else ensureCols(fact, defaults)

  /** J5 — pandas merge-suffix precedence, done right: pre-existing fact
    * value wins, else the joined dim value, else the literal default
    * (reference enrich_features.py:26-34). The dim column must be aliased
    * to a fresh name before the join; this just encodes the precedence.
    */
  def precedence(existing: Column, joined: Column, default: Column): Column =
    coalesce(existing, joined, default)

  /** A1 — tolerant union-all of N frames
    * (reference fetch_football_data.py:56-69 `pd.concat`).
    */
  def unionTolerant(frames: Seq[DataFrame]): DataFrame = {
    require(frames.nonEmpty,
      "unionTolerant needs at least one frame (use Sources.emptyWithSchema for the zero-source case)")
    frames.reduce(_.unionByName(_, allowMissingColumns = true))
  }

  /** A3 — keep-FIRST dedup (pandas drop_duplicates semantics), made
    * deterministic with an explicit order (reference
    * bootstrap_team_priors.py:35; SURVEY §4 pandas-delta (a)).
    */
  def dedupKeepFirst(df: DataFrame, keys: Seq[String], order: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order.map(col): _*)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** V1 — schema contract check: which required columns are missing
    * (reference validate_data.py:16-18,29-36). Plan-time, zero jobs.
    */
  def missingColumns(df: DataFrame, required: Seq[String]): Seq[String] =
    required.filterNot(df.columns.contains)
}
