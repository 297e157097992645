package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.engine.Ops
import graft.functions.F

/** Entry point 3 parity (SURVEY §3): xG hybrid blend + team priors.
  *
  * Two-season full outer join → coercing numeric cast → 0.60/0.40
  * null-tolerant blend (fetch_fbr_team_xg.py:104-126), then the priors
  * heuristics + keep-first dedup (bootstrap_team_priors.py:13-36).
  */
object XgHybrid {

  /** J8 + F9 + F10 + P2: current ⟗ last season on (team, league_id),
    * hybrid = weighted blend per metric.
    */
  def blend(cur: DataFrame, last: DataFrame): DataFrame = {
    val metrics = Seq("xg", "xga", "xgd", "xgd90")
    val c = cur.select(col("team") +: col("league_id") +:
      metrics.map(m => F.toDouble(col(m)).as(s"${m}_cur")): _*)
    val l = last.select(col("team").as("__t") +: col("league_id").as("__l") +:
      metrics.map(m => F.toDouble(col(m)).as(s"${m}_last")): _*)
    val joined = c.join(l,
      col("team") === col("__t") && col("league_id") === col("__l"), "full_outer")
    joined.select(
      coalesce(col("team"), col("__t")).as("team") +:
        coalesce(col("league_id"), col("__l")).as("league_id") +:
        metrics.map(m => F.weightedBlend(col(s"${m}_cur"), col(s"${m}_last"))
          .as(s"${m}_hybrid")): _*)
  }

  /** Team priors (bootstrap_team_priors.py:24-35): derived ratings via the
    * F11–F13 heuristics, then keep-first dedup on team. Clamp bounds match
    * the reference exactly: gk ∈ [0.55, 0.90], setpiece ∈ [0.50, 0.85]
    * (bootstrap_team_priors.py:31-32). The reference's drop_duplicates
    * keeps first-in-file order; league_id is the deterministic stand-in for
    * that ordinal here (a team appearing in several leagues resolves to the
    * lowest league_id, every run).
    */
  def teamPriors(xg: DataFrame): DataFrame = {
    val rated = xg.select(
      col("team"), col("league_id"),
      F.clampMid(F.floorRate(col("xga_hybrid")), 0.55, 0.90).as("gk_rating"),
      F.clampMid(F.signStep(col("xgd90_hybrid")), 0.50, 0.85).as("setpiece_rating"),
      lit(F.Defaults.crowdIndex).as("crowd_index"))
    Ops.dedupKeepFirst(rated, Seq("team"), Seq("league_id")).drop("league_id")
  }
}
