package graft

import graft.engine.Ck.Ops

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
        .ckpt(true)
      val levels = Seq(2, 4, 6).map { l =>
        fine.groupBy(substring(col("tile"), 1, l).as("tile"))
          .agg(sum("n").cast(LongType).as("n"),
            sum("cents").cast(LongType).as("cents"))
          .select(lit(l.toLong).as("level"), col("tile"), col("n"),
            col("cents"))
      }
      levels.reduce(_ unionByName _).transform(graft.engine.Ops.reportSort("level", "tile"))
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

  // ------------- geo_quadkey_join: tile-local spatial join on the same index

  private val quadkeyJoin = Q(
    "geo_quadkey_join",
    "Tile-local SPATIAL JOIN on the quadkey index — the LOOKUP side of " +
      "the tile pyramid geo_quadkey_rollup builds (same level-6 grid, " +
      "same digit encoding): customers probe their own tile, suppliers " +
      "register in their tile plus its 8 neighbors (the ±1 expansion on " +
      "the SMALLER side — 9 rows per supplier, never per fact row), and " +
      "the equi-join on the quadkey STRING yields candidate pairs that " +
      "an exact distance predicate then filters (dist² ≤ 8 in degree " +
      "space; √8 < the 2.875° tile height, so adjacency provably " +
      "covers the radius and no pair is missed). The expanded supplier " +
      "frame is broadcast — a dim-sized index at any corpus scale; at " +
      "100 TB with two fact-sized sides the same plan becomes a shuffle " +
      "equi-join on the tile key, skew-bounded by tile occupancy. Each " +
      "qualifying pair matches exactly ONCE (the customer's own tile — " +
      "supplier expansion tiles are distinct), so no post-join dedup. " +
      "Coordinates are the rollup's fixture scheme; all float math is " +
      "identical IEEE expression trees on both engines.",
    (s, d) => {
      val D = 6
      val cust = t(s, d, "customer").select(
        col("c_custkey"),
        ((col("c_nationkey") * 7 % 180) - 90 +
          (col("c_custkey") % 100) / 100.0 * 4).as("lat"),
        ((col("c_nationkey") * 13 % 360) - 180 +
          (col("c_custkey") % 137) / 137.0 * 4).as("lon"))
      val supp = t(s, d, "supplier").select(
        col("s_suppkey"),
        ((col("s_suppkey") * 11 % 180) - 90 +
          (col("s_suppkey") % 100) / 100.0 * 4).as("slat"),
        ((col("s_suppkey") * 17 % 360) - 180 +
          (col("s_suppkey") % 137) / 137.0 * 4).as("slon"))
      def tileX(lon: Column): Column =
        floor((lon + 180) / 368 * 64).cast(LongType)
      def tileY(lat: Column): Column =
        floor((lat + 90) / 184 * 64).cast(LongType)
      def qk(x: Column, y: Column): Column = concat((1 to D).map { l =>
        val sh = 1L << (D - l)
        ((y / sh).cast(LongType) % 2 * 2 +
          (x / sh).cast(LongType) % 2).cast("string")
      }: _*)
      val cq = cust.select(col("c_custkey"), col("lat"), col("lon"),
        qk(tileX(col("lon")), tileY(col("lat"))).as("tile"))
      val sq = supp
        .withColumn("dx", explode(array(lit(-1L), lit(0L), lit(1L))))
        .withColumn("dy", explode(array(lit(-1L), lit(0L), lit(1L))))
        .select(col("s_suppkey"), col("slat"), col("slon"),
          (tileX(col("slon")) + col("dx")).as("x2"),
          (tileY(col("slat")) + col("dy")).as("y2"))
        .filter(col("x2").between(0, 63) && col("y2").between(0, 63))
        .select(col("s_suppkey"), col("slat"), col("slon"),
          qk(col("x2"), col("y2")).as("tile"))
      val d2 = (col("lat") - col("slat")) * (col("lat") - col("slat")) +
        (col("lon") - col("slon")) * (col("lon") - col("slon"))
      // no broadcast HINT: the expanded index is dim-sized here and
      // Catalyst's stats broadcast it on their own (PlanShapeSpec pins
      // that), but at 100 TB a fact-sized supplier side must be free to
      // fall back to the shuffle equi-join — ScaleSpec proves the same
      // plan survives that switch with identical values
      cq.join(sq, "tile")
        .filter(d2 <= 8.0)
        .select(col("tile"), col("c_custkey"), col("s_suppkey"),
          round(d2, 6).as("dist2"))
        .transform(graft.engine.Ops.reportSort("c_custkey", "s_suppkey"))
    },
    Some {
      def qkSql(x: String, y: String): String = (1 to 6).map { l =>
        val sh = 1L << (6 - l)
        s"CAST(($y // $sh) % 2 * 2 + ($x // $sh) % 2 AS VARCHAR)"
      }.mkString(" || ")
      s"""WITH cust AS (
            SELECT c_custkey,
                   (c_nationkey * 7 % 180) - 90 +
                     (c_custkey % 100) / 100.0 * 4 AS lat,
                   (c_nationkey * 13 % 360) - 180 +
                     (c_custkey % 137) / 137.0 * 4 AS lon
            FROM customer),
          supp AS (
            SELECT s_suppkey,
                   (s_suppkey * 11 % 180) - 90 +
                     (s_suppkey % 100) / 100.0 * 4 AS slat,
                   (s_suppkey * 17 % 360) - 180 +
                     (s_suppkey % 137) / 137.0 * 4 AS slon
            FROM supplier),
          cq AS (
            SELECT c_custkey, lat, lon,
                   CAST(floor((lon + 180) / 368 * 64) AS BIGINT) AS x,
                   CAST(floor((lat + 90) / 184 * 64) AS BIGINT) AS y
            FROM cust),
          sq0 AS (
            SELECT s_suppkey, slat, slon,
                   CAST(floor((slon + 180) / 368 * 64) AS BIGINT) + dx AS x2,
                   CAST(floor((slat + 90) / 184 * 64) AS BIGINT) + dy AS y2
            FROM supp
            CROSS JOIN (SELECT unnest([-1, 0, 1]) AS dx)
            CROSS JOIN (SELECT unnest([-1, 0, 1]) AS dy)),
          cqk AS (
            SELECT c_custkey, lat, lon, ${qkSql("x", "y")} AS tile FROM cq),
          sqk AS (
            SELECT s_suppkey, slat, slon, ${qkSql("x2", "y2")} AS tile
            FROM sq0 WHERE x2 BETWEEN 0 AND 63 AND y2 BETWEEN 0 AND 63)
          SELECT tile, c_custkey, s_suppkey,
                 round(CAST((lat-slat)*(lat-slat) + (lon-slon)*(lon-slon)
                   AS DOUBLE), 6) AS dist2
          FROM cqk JOIN sqk USING (tile)
          WHERE (lat-slat)*(lat-slat) + (lon-slon)*(lon-slon) <= 8.0
          ORDER BY c_custkey, s_suppkey"""
    })

  val all: Seq[Q] = Seq(quadkeyRollup, quadkeyJoin)
}
