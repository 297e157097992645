package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** F16 — The Odds API nested-JSON extraction
  * (reference fetch_the_odds_api.py:118-152).
  *
  * Reference control flow per game: scan bookmakers IN ORDER; inside each,
  * take the FIRST `h2h` market (inner break); collect outcome prices keyed
  * by name; stop at the first bookmaker that yielded ANY of home/draw/away
  * (outer break). Draw falls back to the "Tie" alias.
  *
  * Spark shape: `from_json` with the full explicit schema, then
  * higher-order `filter`/`exists`/`try_element_at` — NOT `explode`, which
  * would enumerate all bookmakers and lose first-match semantics (and
  * multiply the row count at scale).
  */
object OddsJson {

  val outcomeType: StructType = StructType(Seq(
    StructField("name", StringType), StructField("price", DoubleType)))
  val marketType: StructType = StructType(Seq(
    StructField("key", StringType),
    StructField("outcomes", ArrayType(outcomeType))))
  val bookmakerType: StructType = StructType(Seq(
    StructField("key", StringType),
    StructField("markets", ArrayType(marketType))))
  val gameType: StructType = StructType(Seq(
    StructField("home_team", StringType),
    StructField("away_team", StringType),
    StructField("commence_time", StringType),
    StructField("bookmakers", ArrayType(bookmakerType))))
  val gamesSchema: ArrayType = ArrayType(gameType)

  /** First h2h market of one bookmaker (inner-loop break semantics). */
  private def firstH2h(bm: Column): Column =
    try_element_at(filter(bm.getField("markets"), m => m.getField("key") === "h2h"),
      lit(1))

  /** Price of the outcome named `name` in the first h2h market. */
  private def priceFor(bm: Column, name: Column): Column =
    try_element_at(filter(firstH2h(bm).getField("outcomes"),
      o => o.getField("name") === name && o.getField("price").isNotNull), lit(1))
      .getField("price")

  /** Parse a raw JSON body (one array of games) into the canonical
    * UPCOMING frame: date, home_team, away_team, {home,draw,away}_odds_dec.
    */
  def parseGames(spark: SparkSession, jsonBody: String): DataFrame = {
    import spark.implicits._
    val games = Seq(jsonBody).toDF("body")
      .select(explode(from_json(col("body"), gamesSchema)).as("g"))
    extract(games, col("g"))
  }

  /** Extraction over a parsed game struct column. */
  def extract(df: DataFrame, g: Column): DataFrame = {
    val home = g.getField("home_team")
    val away = g.getField("away_team")
    // outer break: first bookmaker whose first h2h market yields any of
    // home / away / draw(or tie)
    def anyOdds(bm: Column): Column =
      priceFor(bm, home).isNotNull || priceFor(bm, away).isNotNull ||
        priceFor(bm, lit("Draw")).isNotNull || priceFor(bm, lit("Tie")).isNotNull
    val chosen = try_element_at(filter(g.getField("bookmakers"), anyOdds _), lit(1))
    df.select(
      // F.parseIso (formatless try_to_timestamp under the UTC session)
      // accepts every ISO variant the API may emit — 'Z', '+00:00',
      // fractional seconds — where a fixed pattern would null them all
      graft.functions.F.parseIso(g.getField("commence_time")).as("date"),
      home.as("home_team"),
      away.as("away_team"),
      priceFor(chosen, home).as("home_odds_dec"),
      coalesce(priceFor(chosen, lit("Draw")), priceFor(chosen, lit("Tie")))
        .as("draw_odds_dec"),
      priceFor(chosen, away).as("away_odds_dec"))
  }
}
