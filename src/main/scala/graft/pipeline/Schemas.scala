package graft.pipeline

import org.apache.spark.sql.types._

/** Canonical schema contracts (SURVEY §1, §5): the reference declares these
  * implicitly in four places (templates/HIST_matches_template.csv:1,
  * templates/UPCOMING_fixtures_template.csv:1, validate_data.py:29-34,
  * ensure_min_files.py:28-44); the engine declares them once, explicitly.
  */
object Schemas {

  val histColumns: Seq[String] = Seq(
    "date", "home_team", "away_team", "home_goals", "away_goals",
    "home_odds_dec", "draw_odds_dec", "away_odds_dec",
    "home_rest_days", "away_rest_days", "home_travel_km", "away_travel_km",
    "home_injury_index", "away_injury_index", "home_gk_rating", "away_gk_rating",
    "home_setpiece_rating", "away_setpiece_rating", "ref_pen_rate", "crowd_index")

  val upcomingColumns: Seq[String] = histColumns.filterNot(
    c => c == "home_goals" || c == "away_goals")

  private def d(n: String) = StructField(n, DoubleType)
  private def s(n: String) = StructField(n, StringType)
  private def i(n: String) = StructField(n, IntegerType)
  private def ts(n: String) = StructField(n, TimestampType)

  /** The six dimension contracts (reference ensure_min_files.py:28-44). */
  val teamsMaster: StructType = StructType(Seq(
    s("team"), d("gk_rating"), d("setpiece_rating"), d("crowd_index")))
  val stadiums: StructType = StructType(Seq(
    s("team"), s("stadium"), d("lat"), d("lon")))
  val refBaselines: StructType = StructType(Seq(s("ref_name"), d("ref_pen_rate")))
  val injuries: StructType = StructType(Seq(ts("date"), s("team"), d("injury_index")))
  val lineups: StructType = StructType(Seq(
    ts("date"), s("team"), i("key_att_out"), i("key_def_out"), i("keeper_changed")))
  val teamNameMap: StructType = StructType(Seq(s("raw"), s("canonical")))

  /** xG hybrid output contract (reference fetch_fbr_team_xg.py:125). */
  val xgHybrid: StructType = StructType(Seq(
    s("team"), i("league_id"),
    d("xg_hybrid"), d("xga_hybrid"), d("xgd_hybrid"), d("xgd90_hybrid")))

  val hist: StructType = StructType(
    ts("date") +: histColumns.drop(1).map {
      case c @ ("home_team" | "away_team") => s(c)
      case c @ ("home_goals" | "away_goals" | "home_rest_days" | "away_rest_days") => i(c)
      case c => d(c)
    })

  val upcoming: StructType = StructType(
    hist.fields.filterNot(f => f.name == "home_goals" || f.name == "away_goals"))
}
