package graft

import graft.engine.Ck.Ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.{DoubleType, LongType}

import graft.engine.Engine
import graft.operators.Similarity

/** Round-5 batch 4: IVF probe-count tuning curve, Friedman
  * repeated-measures test, absorbing-chain funnel reach.
  */
object QueriesR5f {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Engine.table(s, dir, name)

  // ------- sim_ivf_probe_sweep: recall@5 vs nprobe tuning curve

  private val ivfProbeSweep = Q(
    "sim_ivf_probe_sweep",
    "The IVF tuning curve: recall@5 and candidate volume at nprobe ∈ " +
      "{1,2,4,8} against brute-force ground truth — the measurement " +
      "that picks the probe count before deploying an ANN index. Every " +
      "query ranks the 8 coarse cells once (a broadcast grid), every " +
      "candidate is scored ONCE tagged with its cell's per-query rank, " +
      "and the four probe levels are an explode over that scored frame " +
      "(bounded ×4) — not four separate retrieval runs. Ground truth " +
      "is exact top-5 for the 10 fixed queries (bounded: |queries|·" +
      "|corpus|, and at scale the brute-force side is the thing the " +
      "sweep is sizing a replacement for). The d² argmin and cosine " +
      "trees are the compositional forms that fold identically to the " +
      "oracle's list_dot_product.",
    (s, d) => {
      // scheduling-floor discipline: the broadcast-heavy sweep ran as 12
      // AQE stage-at-a-time scheduler jobs; off, it's the cache
      // materialization plus a build per broadcast. Result materialized
      // inside the scope, conf restored in finally.
      val aqeWas = s.conf.get("spark.sql.adaptive.enabled", "true")
      s.conf.set("spark.sql.adaptive.enabled", "false")
      try {
      def emb() = t(s, d, "embeddings")
        .select(col("vec_id").as("id"),
          Similarity.quantize(Similarity.toDoubleVec(col("embedding")))
            .as("vec"))
      def cents() = t(s, d, "embeddings").filter(col("vec_id") < 8)
        .select(col("vec_id").as("cid"),
          Similarity.quantize(Similarity.toDoubleVec(col("embedding")))
            .as("cv"))
      def dotC(x: Column, y: Column) = Similarity.dotComposed(x, y)
      def d2(v: Column, c: Column) =
        dotC(v, v) - lit(2) * dotC(v, c) + dotC(c, c)
      def cosC(x: Column, y: Column) =
        dotC(x, y) / (sqrt(dotC(x, x)) * sqrt(dotC(y, y)))
      val cells = emb().crossJoin(broadcast(cents()))
        .select(col("id"),
          struct(d2(col("vec"), col("cv")).as("d2"), col("cid")).as("dc"))
        .groupBy("id").agg(min(col("dc")).as("m"))
        .select(col("id"), col("m.cid").as("cell"))
      val q = emb().filter(col("id") >= 100 && col("id") < 110)
        .select(col("id").as("q_id"), col("vec").as("qv"))
      // per-query cell ranking: 10×8 broadcast grid
      val wCell = Window.partitionBy("q_id").orderBy("qd2", "cell")
      val probe = q.crossJoin(broadcast(cents()))
        .select(col("q_id"), col("cid").as("cell"),
          d2(col("qv"), col("cv")).as("qd2"))
        .withColumn("crank", row_number().over(wCell))
        .select("q_id", "cell", "crank")
      val cand = emb().join(cells, "id")
        .select(col("id").as("cand"), col("vec").as("cv2"), col("cell"))
      val scored = cand
        .join(broadcast(probe), "cell")
        .join(broadcast(q), "q_id")
        .filter(col("cand") =!= col("q_id"))
        .select(col("q_id"), col("cand"), col("crank"),
          round(cosC(col("qv"), col("cv2")), 6).as("cos"))
      // brute-force exact top-5 per query — the ground truth
      val wBf = Window.partitionBy("q_id").orderBy(desc("cos"), col("cand"))
      val bf = emb().crossJoin(broadcast(q))
        .filter(col("id") =!= col("q_id"))
        .select(col("q_id"), col("id").as("cand"),
          round(cosC(col("qv"), col("vec")), 6).as("cos"))
        .withColumn("bfrank", row_number().over(wBf))
        .filter(col("bfrank") <= 5)
        .select("q_id", "cand")
      val wIvf = Window.partitionBy("p", "q_id")
        .orderBy(desc("cos"), col("cand"))
      // swept feeds BOTH the top-5 ranking and the volume rollup — cache
      // it so the whole scoring pipeline (argmin cells + cosine) runs once
      val swept = scored
        .select(col("q_id"), col("cand"), col("crank"), col("cos"),
          explode(array(lit(1), lit(2), lit(4), lit(8))).as("p"))
        .filter(col("crank") <= col("p"))
        .cache()
      val top = swept.withColumn("rk", row_number().over(wIvf))
        .filter(col("rk") <= 5)
      val hits = top.join(bf, Seq("q_id", "cand"), "left_semi")
        .groupBy("p").agg(count(lit(1)).as("hits"))
      def dd(c: String) = col(c).cast(DoubleType)
      swept.groupBy("p")
        .agg(countDistinct("q_id").as("n_q"), count(lit(1)).as("n_cand"))
        .join(hits, Seq("p"), "left").na.fill(0L, Seq("hits"))
        .select(col("p").cast(LongType).as("nprobe"), col("n_q"),
          col("n_cand"), col("hits"),
          round(dd("hits") / (dd("n_q") * 5.0) * 1e6, 0).cast(LongType)
            .as("recall_micro"))
        .coalesce(1).sortWithinPartitions("nprobe")
        .ckpt(true)
      } finally {
        s.conf.set("spark.sql.adaptive.enabled", aqeWas)
      }
    },
    Some("""WITH e AS (SELECT vec_id AS id,
                       list_transform(embedding::DOUBLE[],
                         x -> round(x * 1048576)) AS v
                       FROM embeddings),
            c AS (SELECT id AS cid, v AS cv FROM e WHERE id < 8),
            cells AS (
              SELECT id, m.cid AS cell FROM (
                SELECT e.id,
                       min(struct_pack(
                         d2 := list_dot_product(e.v, e.v)
                               - 2 * list_dot_product(e.v, c.cv)
                               + list_dot_product(c.cv, c.cv),
                         cid := c.cid)) AS m
                FROM e CROSS JOIN c GROUP BY e.id)),
            q AS (SELECT id AS q_id, v AS qv FROM e
                  WHERE id >= 100 AND id < 110),
            probe AS (
              SELECT q_id, cell, row_number() OVER
                       (PARTITION BY q_id ORDER BY qd2, cell) AS crank
              FROM (SELECT q_id, cid AS cell,
                           list_dot_product(qv, qv)
                           - 2 * list_dot_product(qv, cv)
                           + list_dot_product(cv, cv) AS qd2
                    FROM q CROSS JOIN c)),
            cand AS (SELECT e.id AS cand, e.v AS cv2, cells.cell
                     FROM e JOIN cells ON e.id = cells.id),
            scored AS (
              SELECT q.q_id, cand, crank,
                     round(list_dot_product(qv, cv2) /
                           (sqrt(list_dot_product(qv, qv)) *
                            sqrt(list_dot_product(cv2, cv2))), 6) AS cos
              FROM cand JOIN probe USING (cell) JOIN q USING (q_id)
              WHERE cand <> q_id),
            bf AS (
              SELECT q_id, cand FROM (
                SELECT q_id, id AS cand,
                       row_number() OVER (PARTITION BY q_id ORDER BY
                         round(list_dot_product(qv, v) /
                               (sqrt(list_dot_product(qv, qv)) *
                                sqrt(list_dot_product(v, v))), 6) DESC,
                         id) AS bfrank
                FROM e CROSS JOIN q WHERE id <> q_id)
              WHERE bfrank <= 5),
            swept AS (
              SELECT p, q_id, cand, cos
              FROM scored
              CROSS JOIN (SELECT unnest([1, 2, 4, 8]) AS p)
              WHERE crank <= p),
            top AS (
              SELECT p, q_id, cand FROM (
                SELECT p, q_id, cand, row_number() OVER
                         (PARTITION BY p, q_id
                          ORDER BY cos DESC, cand) AS rk
                FROM swept)
              WHERE rk <= 5),
            hits AS (
              SELECT p, CAST(count(*) AS BIGINT) AS hits
              FROM top SEMI JOIN bf USING (q_id, cand)
              GROUP BY 1),
            vol AS (
              SELECT p, CAST(count(DISTINCT q_id) AS BIGINT) AS n_q,
                     CAST(count(*) AS BIGINT) AS n_cand
              FROM swept GROUP BY 1)
            SELECT CAST(p AS BIGINT) AS nprobe, n_q, n_cand,
                   coalesce(hits, 0) AS hits,
                   CAST(round(CAST(coalesce(hits, 0) AS DOUBLE) /
                       (CAST(n_q AS DOUBLE) * 5.0) * 1e6, 0) AS BIGINT)
                     AS recall_micro
            FROM vol LEFT JOIN hits USING (p)
            ORDER BY nprobe"""))

  // ------- stat_friedman: rank-based repeated-measures across blocks

  private val friedman = Q(
    "stat_friedman",
    "Friedman test — 'do the k treatments differ when measured on the " +
      "same blocks' (the nonparametric repeated-measures ANOVA): " +
      "months are blocks, order statuses are treatments, the metric is " +
      "mean order value per cell. Only complete blocks (all k " +
      "treatments present) rank; ranks are over the BOUNDED month × " +
      "status grid, never over the fact table — the only full-table " +
      "work is one keyed rollup. Cell means quantize to integer micros " +
      "before ranking so rank order is engine-stable; the χ²_F algebra " +
      "runs on exact integer rank sums.",
    (s, d) => {
      val cells = t(s, d, "orders")
        .groupBy(date_trunc("month", col("o_orderdate")).as("m"),
          col("o_orderstatus").as("st"))
        .agg(sum((col("o_totalprice") * 100).cast(LongType)).as("sc"),
          count(lit(1)).as("nc"))
        .withColumn("v_micro",
          round(col("sc").cast(DoubleType) / col("nc") * 1e4, 0)
            .cast(LongType))
      val complete = cells
        .withColumn("kIn", count(lit(1)).over(Window.partitionBy("m")))
        .filter(col("kIn") === 3)
      val ranked = complete.withColumn("rk",
        row_number().over(Window.partitionBy("m")
          .orderBy("v_micro", "st")).cast(LongType))
      // the χ²_F scalars ride whole-frame windows over the k-row (=3)
      // treatment rollup — bounded frame, and one fewer agg + crossJoin
      // than a separate totals subquery
      val wAll = Window.partitionBy(lit(1))
      val perT = ranked.groupBy("st")
        .agg(sum("rk").as("r_sum"), count(lit(1)).as("n_blocks"))
        .withColumn("n", max("n_blocks").over(wAll))
        .withColumn("k", count(lit(1)).over(wAll))
        .withColumn("rr", sum(col("r_sum") * col("r_sum")).over(wAll))
      def dd(c: String) = col(c).cast(DoubleType)
      val chi = (lit(12.0) / (dd("n") * dd("k") * (dd("k") + 1)) * dd("rr")
        - lit(3.0) * dd("n") * (dd("k") + 1))
      perT
        .select(col("st"), col("n_blocks"), col("r_sum"),
          round(chi * 1e6, 0).cast(LongType).as("chi2_f_micro"))
        .transform(graft.engine.Ops.reportSort("st"))
    },
    Some("""WITH cells AS (
              SELECT date_trunc('month', o_orderdate) AS m,
                     o_orderstatus AS st,
                     CAST(round(CAST(sum(CAST(round(o_totalprice * 100, 0)
                              AS BIGINT)) AS DOUBLE) / count(*) * 1e4, 0)
                       AS BIGINT) AS v_micro
              FROM orders GROUP BY 1, 2),
            complete AS (
              SELECT * FROM (
                SELECT m, st, v_micro,
                       count(*) OVER (PARTITION BY m) AS kin
                FROM cells)
              WHERE kin = 3),
            ranked AS (
              SELECT m, st,
                     CAST(row_number() OVER (PARTITION BY m
                       ORDER BY v_micro, st) AS BIGINT) AS rk
              FROM complete),
            pert AS (
              SELECT st, CAST(sum(rk) AS BIGINT) AS r_sum,
                     CAST(count(*) AS BIGINT) AS n_blocks
              FROM ranked GROUP BY 1),
            tot AS (
              SELECT CAST(max(n_blocks) AS BIGINT) AS n,
                     CAST(count(*) AS BIGINT) AS k,
                     CAST(sum(r_sum * r_sum) AS BIGINT) AS rr
              FROM pert)
            SELECT st, n_blocks, r_sum,
                   CAST(round((12.0 / (CAST(n AS DOUBLE) * k * (k + 1))
                       * CAST(rr AS DOUBLE)
                       - 3.0 * CAST(n AS DOUBLE) * (k + 1)) * 1e6, 0)
                     AS BIGINT) AS chi2_f_micro
            FROM pert, tot
            ORDER BY st"""))

  // ------- seq_absorbing_funnel: integer-quantized absorbing chain

  private val absorbingFunnel = Q(
    "seq_absorbing_funnel",
    "Absorbing-Markov funnel: from each starting event type, the " +
      "probability a user is still purchase-free after 1, 2 and 3 " +
      "transitions under the corpus chain (purchase = absorbing state, " +
      "so its outgoing edges are cut). The transition matrix is the " +
      "BOUNDED type×type grid from one lag-pair rollup; matrix powers " +
      "are grid self-joins. Everything is integer-quantized BEFORE " +
      "summation: p = (1e6·c) div rowTot, products accumulate in picos " +
      "and re-truncate to micros between steps — identical integer ops " +
      "on both engines, so three chained matrix products stay " +
      "bit-exact (a double matrix power is accumulation-order " +
      "dependent).",
    (s, d) => {
      val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val pairs = t(s, d, "events")
        .select(col("user_id"), col("event_id"), col("ts"),
          col("event_type").as("nxt"))
        .withColumn("prv", lag("nxt", 1).over(byUser))
        .filter(col("prv").isNotNull)
        .select("prv", "nxt")
      // the bounded grid is checkpointed ONCE — a/direct/m2/m3 all
      // derive from it without re-running the event-lag window
      val counts = pairs.groupBy("prv", "nxt").agg(count(lit(1)).as("c"))
        .withColumn("rt", sum("c").over(Window.partitionBy("prv")))
        .withColumn("pm", expr("(1000000 * c) div rt"))
        .ckpt()
      // A: the chain restricted to non-purchase transitions (absorbing
      // state's outgoing edges cut; reaching it ends the walk)
      val a = counts.filter(col("prv") =!= "purchase" &&
          col("nxt") =!= "purchase")
        .select(col("prv").as("i"), col("nxt").as("j"), col("pm"))
      val m2 = a.as("x").join(a.as("y"), col("x.j") === col("y.i"))
        .groupBy(col("x.i").as("i"), col("y.j").as("j"))
        .agg(sum(col("x.pm") * col("y.pm")).as("pico"))
        .withColumn("pm2", expr("pico div 1000000"))
        .ckpt()
      val m3 = m2.as("x").join(a.as("y"), col("x.j") === col("y.i"))
        .groupBy(col("x.i").as("i"), col("y.j").as("j"))
        .agg(sum(col("x.pm2") * col("y.pm")).as("pico"))
        .withColumn("pm3", expr("pico div 1000000"))
      // the three alive sums + the direct edge collapse into ONE grouped
      // aggregation over a tagged union of the (bounded) step frames —
      // instead of three aggs glued by three tiny joins
      val steps = a.select(col("i"), col("pm").as("v"), lit(1L).as("stp"))
        .unionByName(m2.select(col("i"), col("pm2").as("v"),
          lit(2L).as("stp")))
        .unionByName(m3.select(col("i"), col("pm3").as("v"),
          lit(3L).as("stp")))
        .unionByName(counts.filter(col("prv") =!= "purchase" &&
            col("nxt") === "purchase")
          .select(col("prv").as("i"), col("pm").as("v"), lit(0L).as("stp")))
      steps.groupBy("i")
        .agg(coalesce(sum(when(col("stp") === 0, col("v"))), lit(0L))
            .as("p_purchase_micro"),
          sum(when(col("stp") === 1, col("v"))).as("alive1_micro"),
          sum(when(col("stp") === 2, col("v"))).as("alive2_micro"),
          sum(when(col("stp") === 3, col("v"))).as("alive3_micro"))
        .filter(col("alive1_micro").isNotNull &&
          col("alive2_micro").isNotNull && col("alive3_micro").isNotNull)
        .select(col("i").as("start_type"), col("p_purchase_micro"),
          col("alive1_micro"), col("alive2_micro"), col("alive3_micro"))
        .transform(graft.engine.Ops.reportSort("start_type"))
    },
    Some("""WITH seq AS (
              SELECT user_id, event_type AS nxt,
                     lag(event_type) OVER (PARTITION BY user_id
                       ORDER BY ts, event_id) AS prv
              FROM events),
            pairs AS (SELECT prv, nxt FROM seq WHERE prv IS NOT NULL),
            counts AS (
              SELECT prv, nxt, CAST(count(*) AS BIGINT) AS c,
                     CAST(sum(count(*)) OVER (PARTITION BY prv)
                       AS BIGINT) AS rt
              FROM pairs GROUP BY 1, 2),
            p AS (SELECT prv, nxt, (1000000 * c) // rt AS pm FROM counts),
            a AS (SELECT prv AS i, nxt AS j, pm FROM p
                  WHERE prv <> 'purchase' AND nxt <> 'purchase'),
            m2 AS (
              SELECT x.i AS i, y.j AS j,
                     CAST(sum(x.pm * y.pm) AS BIGINT) // 1000000 AS pm2
              FROM a x JOIN a y ON x.j = y.i GROUP BY 1, 2),
            m3 AS (
              SELECT x.i AS i, y.j AS j,
                     CAST(sum(x.pm2 * y.pm) AS BIGINT) // 1000000 AS pm3
              FROM m2 x JOIN a y ON x.j = y.i GROUP BY 1, 2),
            a1 AS (SELECT i, CAST(sum(pm) AS BIGINT) AS alive1_micro
                   FROM a GROUP BY 1),
            a2 AS (SELECT i, CAST(sum(pm2) AS BIGINT) AS alive2_micro
                   FROM m2 GROUP BY 1),
            a3 AS (SELECT i, CAST(sum(pm3) AS BIGINT) AS alive3_micro
                   FROM m3 GROUP BY 1),
            direct AS (SELECT prv AS i, pm AS p_purchase_micro
                       FROM p WHERE prv <> 'purchase'
                                AND nxt = 'purchase')
            SELECT a1.i AS start_type,
                   coalesce(p_purchase_micro, 0) AS p_purchase_micro,
                   alive1_micro, alive2_micro, alive3_micro
            FROM a1 JOIN a2 ON a1.i = a2.i JOIN a3 ON a1.i = a3.i
            LEFT JOIN direct ON a1.i = direct.i
            ORDER BY start_type"""))

  val all: Seq[Q] = Seq(ivfProbeSweep, friedman, absorbingFunnel)
}
