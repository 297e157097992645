package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.engine.Engine

/** Round-7 batch 1: spatial tile-pyramid aggregation — the map-tile
  * rollup every geo dashboard and spatial-index build runs.
  */
object QueriesR7a {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Engine.table(s, dir, name)

  // ------------- geo_quadkey_rollup: Bing-style quadkey tile pyramid

  private val quadkeyRollup = Q(
    "geo_quadkey_rollup",
    "Quadkey TILE-PYRAMID rollup (the Bing-maps scheme): every customer " +
      "point encodes into a base-4 quadkey string — at each zoom level " +
      "the digit is 2·y_bit + x_bit, so a tile's children share its " +
      "prefix and COARSER levels aggregate from FINER ones by prefix " +
      "truncation, never re-touching the points. The pyramid here is " +
      "levels {2, 4, 6} (4 → 256 → 4096 tiles): one keyed aggregation " +
      "at the finest level, then two re-aggregations of the 4096-row " +
      "tile frame — the mergeable-rollup discipline that makes tile " +
      "serving O(tiles), not O(points), at 100 TB (the same shape as " +
      "the HLL cube). Grid math is pure integer bit extraction " +
      "(x div 2^s mod 2) over floor-normalized coordinates — " +
      "identical IEEE trees on both engines, no trig, no float " +
      "surface; balances are exact cents.",
    (s, d) => {
      val D = 6 // finest zoom: 2^6 × 2^6 = 4096 tiles
      // the inventory's synthetic coordinate scheme (j26_nearest_geo /
      // geo_grid_join). The /184 and /368 divisors are sized for the
      // scheme's NOMINAL envelope lat ∈ [-90, 94), lon ∈ [-180, 184) —
      // base mod range plus the +4 fractional jitter — so x,y ≤ 63 holds
      // even if the fixture ever uses the full key space; the attainable
      // values today (c_nationkey ≤ 24) stay well inside it (lat < 82,
      // lon < 136). ADVICE r7.
      val pts = t(s, d, "customer").select(
        ((col("c_nationkey") * 7 % 180) - 90 +
          (col("c_custkey") % 100) / 100.0 * 4).as("lat"),
        ((col("c_nationkey") * 13 % 360) - 180 +
          (col("c_custkey") % 137) / 137.0 * 4).as("lon"),
        round(col("c_acctbal") * 100, 0).cast(LongType).as("cents"))
      val grid = pts.select(
        floor((col("lon") + 180) / 368 * 64).cast(LongType).as("x"),
        floor((col("lat") + 90) / 184 * 64).cast(LongType).as("y"),
        col("cents"))
      def digit(l: Int): Column = {
        val sh = 1L << (D - l)
        (col("y") / sh).cast(LongType) % 2 * 2 +
          (col("x") / sh).cast(LongType) % 2
      }
      val qk = concat((1 to D).map(l => digit(l).cast("string")): _*)
      // ONE pass over the points builds the finest level; the frame is
      // bounded by the tile count (≤ 4^6 rows at ANY corpus size), so it
      // materializes once and both coarser levels re-aggregate it
      val fine = grid.select(qk.as("tile"), col("cents"))
        .groupBy("tile")
        .agg(count(lit(1)).as("n"), sum("cents").as("cents"))
        .localCheckpoint(true)
      val levels = Seq(2, 4, 6).map { l =>
        fine.groupBy(substring(col("tile"), 1, l).as("tile"))
          .agg(sum("n").cast(LongType).as("n"),
            sum("cents").cast(LongType).as("cents"))
          .select(lit(l.toLong).as("level"), col("tile"), col("n"),
            col("cents"))
      }
      levels.reduce(_ unionByName _).orderBy("level", "tile")
    },
    Some("""WITH pts AS (
              SELECT (c_nationkey * 7 % 180) - 90 +
                       (c_custkey % 100) / 100.0 * 4 AS lat,
                     (c_nationkey * 13 % 360) - 180 +
                       (c_custkey % 137) / 137.0 * 4 AS lon,
                     CAST(round(c_acctbal * 100, 0) AS BIGINT) AS cents
              FROM customer),
            grid AS (
              SELECT CAST(floor((lon + 180) / 368 * 64) AS BIGINT) AS x,
                     CAST(floor((lat + 90) / 184 * 64) AS BIGINT) AS y,
                     cents
              FROM pts),
            qk AS (
              SELECT
                CAST((y // 32) % 2 * 2 + (x // 32) % 2 AS VARCHAR) ||
                CAST((y // 16) % 2 * 2 + (x // 16) % 2 AS VARCHAR) ||
                CAST((y // 8) % 2 * 2 + (x // 8) % 2 AS VARCHAR) ||
                CAST((y // 4) % 2 * 2 + (x // 4) % 2 AS VARCHAR) ||
                CAST((y // 2) % 2 * 2 + (x // 2) % 2 AS VARCHAR) ||
                CAST(y % 2 * 2 + x % 2 AS VARCHAR) AS tile,
                cents
              FROM grid),
            fine AS (
              SELECT tile, CAST(count(*) AS BIGINT) AS n,
                     CAST(sum(cents) AS BIGINT) AS cents
              FROM qk GROUP BY tile)
            SELECT level, tile, CAST(n AS BIGINT) AS n,
                   CAST(cents AS BIGINT) AS cents
            FROM (
              SELECT CAST(2 AS BIGINT) AS level, substr(tile, 1, 2) AS tile,
                     sum(n) AS n, sum(cents) AS cents
              FROM fine GROUP BY 2
              UNION ALL
              SELECT CAST(4 AS BIGINT), substr(tile, 1, 4),
                     sum(n), sum(cents)
              FROM fine GROUP BY 2
              UNION ALL
              SELECT CAST(6 AS BIGINT), tile, n, cents FROM fine)
            ORDER BY level, tile"""))

  val all: Seq[Q] = Seq(quadkeyRollup)
}
