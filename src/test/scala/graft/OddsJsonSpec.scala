package graft

import graft.pipeline.OddsJson

/** F16 first-bookmaker-wins nested extraction
  * (reference fetch_the_odds_api.py:118-152).
  */
class OddsJsonSpec extends SparkSpec {

  private val json =
    """[
      {"home_team":"A","away_team":"B","commence_time":"2026-01-02T18:30:00Z",
       "bookmakers":[
         {"key":"empty_bm","markets":[{"key":"totals","outcomes":[{"name":"Over","price":1.9}]}]},
         {"key":"bm1","markets":[
            {"key":"h2h","outcomes":[{"name":"A","price":2.1},{"name":"B","price":3.4},{"name":"Draw","price":3.1}]},
            {"key":"h2h","outcomes":[{"name":"A","price":9.9}]}]},
         {"key":"bm2","markets":[{"key":"h2h","outcomes":[{"name":"A","price":5.0}]}]}]},
      {"home_team":"C","away_team":"D","commence_time":"2026-01-03T20:00:00Z",
       "bookmakers":[
         {"key":"tie_bm","markets":[{"key":"h2h","outcomes":[{"name":"Tie","price":3.3}]}]}]},
      {"home_team":"E","away_team":"F","commence_time":"2026-01-04T12:00:00Z",
       "bookmakers":[{"key":"no_h2h","markets":[{"key":"totals","outcomes":[]}]}]}
    ]"""

  test("first bookmaker with h2h odds wins; later bookmakers and markets ignored") {
    val out = OddsJson.parseGames(spark, json).orderBy("date").collect()
    val g0 = out(0)
    assert(g0.getAs[String]("home_team") == "A")
    assert(g0.getAs[Double]("home_odds_dec") == 2.1) // bm1, not bm2's 5.0
    assert(g0.getAs[Double]("draw_odds_dec") == 3.1)
    assert(g0.getAs[Double]("away_odds_dec") == 3.4)
    assert(g0.getTimestamp(0).toString.startsWith("2026-01-02 18:30:00"))
  }

  test("Tie aliases Draw; unmatched names stay null") {
    val g1 = OddsJson.parseGames(spark, json).orderBy("date").collect()(1)
    assert(g1.getAs[Double]("draw_odds_dec") == 3.3)
    assert(g1.isNullAt(g1.fieldIndex("home_odds_dec")))
  }

  test("no h2h market anywhere → all odds null, row still present") {
    val g2 = OddsJson.parseGames(spark, json).orderBy("date").collect()(2)
    assert(g2.isNullAt(g2.fieldIndex("home_odds_dec")))
    assert(g2.isNullAt(g2.fieldIndex("draw_odds_dec")))
    assert(g2.isNullAt(g2.fieldIndex("away_odds_dec")))
  }
}
