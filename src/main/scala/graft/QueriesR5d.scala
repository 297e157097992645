package graft

import graft.engine.Ck.Ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.{DoubleType, LongType}

import graft.engine.Engine
import graft.operators.Graph

/** Round-5 batch 2: Cramér's V association matrix (one scan, all pairs),
  * embedding isotropy audit, local clustering coefficients on the
  * memoized backbone, and an MCC/F1 threshold sweep.
  */
object QueriesR5d {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Engine.table(s, dir, name)

  // ------- stat_cramers_v: categorical association matrix in one scan

  private val cramersV = Q(
    "stat_cramers_v",
    "Cramér's V for every tracked categorical column pair of lineitem " +
      "— the 'which dimensions are redundant' screen before one-hot " +
      "encoding or stratified sampling. ONE table scan: each row " +
      "explodes into (pair, a, b) tuples for the 3 column pairs, so " +
      "adding pairs costs map-side width, never another scan; after " +
      "the keyed (pair,a,b) count the contingency tables are bounded " +
      "grids (≤49 cells). χ² per-cell contributions are rounded to " +
      "integer micros BEFORE the per-pair sum — a double sum over " +
      "cells would be accumulation-order dependent across engines — " +
      "and V = sqrt(χ²/(N·(min(r,c)−1))) comes off that deterministic " +
      "integer.",
    (s, d) => {
      val raw = t(s, d, "lineitem")
        .withColumn("qb", concat(lit("q"),
          floor(col("l_quantity") / 10).cast(LongType)))
        .withColumn("mo", concat(lit("m"),
          month(col("l_shipdate")).cast(LongType)))
        .select(explode(array(
          struct(lit("rf_ls").as("pair"), col("l_returnflag").as("a"),
            col("l_linestatus").as("b")),
          struct(lit("qb_rf").as("pair"), col("qb").as("a"),
            col("l_returnflag").as("b")),
          struct(lit("mo_ls").as("pair"), col("mo").as("a"),
            col("l_linestatus").as("b")))).as("t"))
        .select(col("t.pair").as("pair"), col("t.a").as("a"),
          col("t.b").as("b"))
      // hash-agg absorbs the ×3 explode map-side (the shuffle carries the
      // ≤few-hundred-cell grid, not the fact rows); marginals ride
      // WINDOWS over that bounded grid instead of four tiny broadcast
      // joins — window partitions are capped by category cardinalities,
      // so the frames stay bounded at any corpus size
      val cells = raw.groupBy("pair", "a", "b").agg(count(lit(1)).as("obs"))
      def dd(c: String) = col(c).cast(DoubleType)
      val enriched = cells
        .withColumn("rt", sum("obs").over(Window.partitionBy("pair", "a")))
        .withColumn("ct", sum("obs").over(Window.partitionBy("pair", "b")))
        .withColumn("n", sum("obs").over(Window.partitionBy("pair")))
      val e = dd("rt") * dd("ct") / dd("n")
      val perPair = enriched
        .withColumn("cell_micro",
          round((dd("obs") - e) * (dd("obs") - e) / e * 1e6, 0)
            .cast(LongType))
        .groupBy("pair").agg(sum("cell_micro").as("chi2_micro"),
          max("n").as("n"), countDistinct("a").as("r"),
          countDistinct("b").as("c"))
      perPair
        .select(col("pair"), col("n"), col("r"), col("c"),
          col("chi2_micro"),
          round(sqrt(dd("chi2_micro") / 1e6 /
            (dd("n") * (least(col("r"), col("c")).cast(DoubleType) - 1)))
            * 1e6, 0).cast(LongType).as("v_micro"))
        .transform(graft.engine.Ops.reportSort("pair"))
    },
    Some("""WITH raw AS (
              SELECT 'rf_ls' AS pair, l_returnflag AS a, l_linestatus AS b
              FROM lineitem
              UNION ALL
              SELECT 'qb_rf',
                     'q' || CAST(CAST(floor(l_quantity / 10) AS BIGINT)
                                 AS VARCHAR),
                     l_returnflag
              FROM lineitem
              UNION ALL
              SELECT 'mo_ls',
                     'm' || CAST(CAST(month(l_shipdate) AS BIGINT)
                                 AS VARCHAR),
                     l_linestatus
              FROM lineitem),
            cells AS (
              SELECT pair, a, b, CAST(count(*) AS BIGINT) AS obs
              FROM raw GROUP BY 1, 2, 3),
            rt AS (SELECT pair, a, sum(obs) AS rt FROM cells GROUP BY 1, 2),
            ct AS (SELECT pair, b, sum(obs) AS ct FROM cells GROUP BY 1, 2),
            nn AS (
              SELECT pair, CAST(sum(obs) AS BIGINT) AS n,
                     CAST(count(DISTINCT a) AS BIGINT) AS r,
                     CAST(count(DISTINCT b) AS BIGINT) AS c
              FROM cells GROUP BY 1),
            chi AS (
              SELECT cells.pair AS pair,
                     CAST(sum(CAST(round(
                       (CAST(obs AS DOUBLE) - CAST(rt.rt AS DOUBLE) * ct.ct / nn.n)
                       * (CAST(obs AS DOUBLE) - CAST(rt.rt AS DOUBLE) * ct.ct / nn.n)
                       / (CAST(rt.rt AS DOUBLE) * ct.ct / nn.n) * 1e6, 0)
                       AS BIGINT)) AS BIGINT) AS chi2_micro
              FROM cells
              JOIN rt ON cells.pair = rt.pair AND cells.a = rt.a
              JOIN ct ON cells.pair = ct.pair AND cells.b = ct.b
              JOIN nn ON cells.pair = nn.pair
              GROUP BY 1)
            SELECT pair, n, r, c, chi2_micro,
                   CAST(round(sqrt(CAST(chi2_micro AS DOUBLE) / 1e6 /
                       (CAST(n AS DOUBLE) *
                        (CAST(least(r, c) AS DOUBLE) - 1))) * 1e6, 0)
                     AS BIGINT) AS v_micro
            FROM chi JOIN nn USING (pair)
            ORDER BY pair"""))

  // ------- sim_isotropy: embedding-space isotropy audit

  private val isotropy = Q(
    "sim_isotropy",
    "Embedding isotropy audit — anisotropic spaces (all vectors " +
      "leaning into a shared cone) break cosine retrieval, and the " +
      "fleet-wide screen is ‖mean unit vector‖², which equals the " +
      "expected cosine of a RANDOM pair without touching any pair " +
      "space. Per-row unit components quantize to integer micros " +
      "before the per-dimension sum (cross-row double sums are " +
      "accumulation-order dependent), per-dim μ² quantizes to picos " +
      "before the 64-term total, and the norm spread rides the same " +
      "integer-micro rails — one map pass + one 64-key agg at any " +
      "corpus size, everything partial-aggregatable.",
    (s, d) => {
      val base = t(s, d, "embeddings")
        .select(col("embedding").cast("array<double>").as("x"))
        .withColumn("norm",
          sqrt(aggregate(col("x"), lit(0.0), (acc, v) => acc + v * v)))
        .filter(col("norm") > 0)
      val norms = base.select(
        round(col("norm") * 1e6, 0).cast(LongType).as("nm"))
        .agg(count(lit(1)).as("n"), sum("nm").as("sum_nm"),
          min("nm").as("min_norm_micro"), max("nm").as("max_norm_micro"))
      val units = base.select(col("norm"), posexplode(col("x")))
        .select(col("pos"),
          round(col("col") / col("norm") * 1e6, 0).cast(LongType).as("um"))
      def dd(c: String) = col(c).cast(DoubleType)
      val perDim = units.groupBy("pos")
        .agg(sum("um").as("su"), count(lit(1)).as("nd"))
        .withColumn("mu", dd("su") / (dd("nd") * 1e6))
        .withColumn("term_pico",
          round(col("mu") * col("mu") * 1e12, 0).cast(LongType))
      val iso = perDim.agg(count(lit(1)).as("dim"),
        sum("term_pico").as("iso_pico"))
      norms.crossJoin(broadcast(iso))
        .select(col("n"), col("dim"),
          round(dd("sum_nm") / dd("n"), 0).cast(LongType)
            .as("mean_norm_micro"),
          col("min_norm_micro"), col("max_norm_micro"), col("iso_pico"))
    },
    Some("""WITH base AS (
              SELECT embedding::DOUBLE[] AS x,
                     sqrt(list_sum(list_transform(embedding::DOUBLE[],
                       v -> v * v))) AS nrm
              FROM embeddings),
            ok AS (SELECT x, nrm FROM base WHERE nrm > 0),
            norms AS (
              SELECT CAST(count(*) AS BIGINT) AS n,
                     CAST(sum(CAST(round(nrm * 1e6, 0) AS BIGINT))
                       AS BIGINT) AS sum_nm,
                     CAST(min(CAST(round(nrm * 1e6, 0) AS BIGINT))
                       AS BIGINT) AS min_norm_micro,
                     CAST(max(CAST(round(nrm * 1e6, 0) AS BIGINT))
                       AS BIGINT) AS max_norm_micro
              FROM ok),
            units AS (
              SELECT j, CAST(round(x[j] / nrm * 1e6, 0) AS BIGINT) AS um
              FROM ok CROSS JOIN
                   (SELECT unnest(range(1, 65)) AS j)),
            perdim AS (
              SELECT j, sum(um) AS su, count(*) AS nd FROM units GROUP BY 1),
            terms AS (
              SELECT CAST(round((CAST(su AS DOUBLE) / (nd * 1e6)) *
                       (CAST(su AS DOUBLE) / (nd * 1e6)) * 1e12, 0)
                     AS BIGINT) AS term_pico
              FROM perdim),
            iso AS (
              SELECT CAST(count(*) AS BIGINT) AS dim,
                     CAST(sum(term_pico) AS BIGINT) AS iso_pico
              FROM terms)
            SELECT n, dim,
                   CAST(round(CAST(sum_nm AS DOUBLE) / n, 0) AS BIGINT)
                     AS mean_norm_micro,
                   min_norm_micro, max_norm_micro, iso_pico
            FROM norms, iso"""))

  // ------- g12_clustering_coeff: local clustering on the backbone

  private val clusteringCoeff = Q(
    "g12_clustering_coeff",
    "Local clustering coefficient per node on the memoized top-2000 " +
      "co-purchase backbone (Graph.backbone — shared across the graph " +
      "family, built once per sfDir): triangles enumerate once through " +
      "the ordered-wedge join (g3's machinery), then every triangle " +
      "credits its THREE corners via an explode — no per-node " +
      "neighborhood self-join. coeff = 2·tri/(deg·(deg−1)) is a " +
      "rational of exact integers, so the micro output is " +
      "engine-stable. Wedge space stays bounded by the backbone cut " +
      "at any corpus size; top-25 by coefficient with integer " +
      "tie-break keys.",
    (s, d) => {
      val e = Graph.backbone(s, d).select("a", "b").ckpt()
      val und = e.select(col("a").as("v"), col("b").as("w"))
        .unionAll(e.select(col("b").as("v"), col("a").as("w")))
      val deg = und.groupBy("v").agg(count(lit(1)).as("deg"))
      val w = e.as("e1").join(e.as("e2"), col("e1.b") === col("e2.a"))
        .select(col("e1.a").as("x"), col("e1.b").as("y"), col("e2.b").as("z"))
      val tri = w.join(e.as("e3"),
        col("x") === col("e3.a") && col("z") === col("e3.b"), "left_semi")
      val perNode = tri.select(explode(array(col("x"), col("y"), col("z")))
          .as("v"))
        .groupBy("v").agg(count(lit(1)).as("tri_cnt"))
      def dd(c: String) = col(c).cast(DoubleType)
      deg.join(perNode, Seq("v"), "left")
        .na.fill(0L, Seq("tri_cnt"))
        .filter(col("deg") >= 2)
        .select(col("v").as("node"), col("deg"), col("tri_cnt"),
          round(lit(2.0) * dd("tri_cnt") / (dd("deg") * (dd("deg") - 1))
            * 1e6, 0).cast(LongType).as("coeff_micro"))
        .orderBy(col("coeff_micro").desc, col("node"))
        .limit(25)
    },
    Some("""WITH ed AS (SELECT DISTINCT o_custkey AS c, l_suppkey AS s
                        FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
                 cap AS (SELECT c, list_sort(list(DISTINCT s))[1:20] AS ss
                         FROM ed GROUP BY c),
                 pr AS (SELECT unnest(flatten(list_transform(range(1, len(ss)),
                          i -> list_transform(range(i + 1, len(ss) + 1),
                            j -> {'a': ss[i], 'b': ss[j]})))) AS p
                        FROM cap WHERE len(ss) >= 2),
                 e AS (SELECT a, b FROM (SELECT p.a AS a, p.b AS b, count(*) AS n
                                         FROM pr GROUP BY p.a, p.b
                                         ORDER BY n DESC, a, b LIMIT 2000)),
                 und AS (SELECT a AS v FROM e UNION ALL SELECT b FROM e),
                 deg AS (SELECT v, CAST(count(*) AS BIGINT) AS deg
                         FROM und GROUP BY 1),
                 w AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
                       FROM e e1 JOIN e e2 ON e1.b = e2.a),
                 tri AS (SELECT x, y, z FROM w
                         WHERE EXISTS (SELECT 1 FROM e e3
                                       WHERE e3.a = w.x AND e3.b = w.z)),
                 pern AS (SELECT v, CAST(count(*) AS BIGINT) AS tri_cnt
                          FROM (SELECT x AS v FROM tri
                                UNION ALL SELECT y FROM tri
                                UNION ALL SELECT z FROM tri)
                          GROUP BY 1)
            SELECT deg.v AS node, deg,
                   coalesce(tri_cnt, 0) AS tri_cnt,
                   CAST(round(2.0 * coalesce(tri_cnt, 0) /
                       (CAST(deg AS DOUBLE) * (deg - 1)) * 1e6, 0)
                     AS BIGINT) AS coeff_micro
            FROM deg LEFT JOIN pern ON deg.v = pern.v
            WHERE deg >= 2
            ORDER BY coeff_micro DESC, node
            LIMIT 25"""))

  // ------- ml_mcc_sweep: MCC + F1 across score thresholds

  private val mccSweep = Q(
    "ml_mcc_sweep",
    "Matthews-correlation + F1 sweep across binned score thresholds " +
      "for the balance-predicts-high-value classifier (ml_roc_points' " +
      "scaffold): per 500-unit balance band, cumulative TP/FP from the " +
      "top band down give the full confusion matrix at that cut, and " +
      "MCC = (tp·tn − fp·fn)/√((tp+fp)(tp+fn)(tn+fp)(tn+fn)) — the " +
      "single-number summary that stays honest under class imbalance, " +
      "where accuracy and even F1 mislead. All four counts are exact " +
      "BIGINTs (the band rollup is bounded, the cumulative window " +
      "rides ≤ a few dozen band rows), so every emitted micro is a " +
      "deterministic rational of integers; √ splits into two factors " +
      "to stay inside exact-double range.",
    (s, d) => {
      val scored = t(s, d, "orders")
        .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
        .select(
          floor(col("c_acctbal") / 500).cast(LongType).as("band"),
          (col("o_totalprice") > 300000).cast(LongType).as("pos"))
      val perBand = scored.groupBy("band")
        .agg(sum("pos").as("tp_band"),
          (count(lit(1)) - sum("pos")).as("fp_band"))
      val totals = perBand.agg(sum("tp_band").as("tot_p"),
        sum("fp_band").as("tot_n"))
      val wDesc = Window.orderBy(col("band").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      def dd(c: String) = col(c).cast(DoubleType)
      val conf = perBand
        .withColumn("tp", sum("tp_band").over(wDesc).cast(LongType))
        .withColumn("fp", sum("fp_band").over(wDesc).cast(LongType))
        .crossJoin(broadcast(totals))
        .withColumn("fn", (col("tot_p") - col("tp")).cast(LongType))
        .withColumn("tn", (col("tot_n") - col("fp")).cast(LongType))
      val den = sqrt(dd("tp") + dd("fp")) * sqrt(dd("tp") + dd("fn")) *
        sqrt(dd("tn") + dd("fp")) * sqrt(dd("tn") + dd("fn"))
      val mcc = when(den > 0,
        (dd("tp") * dd("tn") - dd("fp") * dd("fn")) / den).otherwise(lit(0.0))
      val f1 = when(lit(2.0) * dd("tp") + dd("fp") + dd("fn") > 0,
        lit(2.0) * dd("tp") / (lit(2.0) * dd("tp") + dd("fp") + dd("fn")))
        .otherwise(lit(0.0))
      conf.select(col("band"), col("tp"), col("fp"), col("fn"), col("tn"),
          round(mcc * 1e6, 0).cast(LongType).as("mcc_micro"),
          round(f1 * 1e6, 0).cast(LongType).as("f1_micro"))
        .transform(graft.engine.Ops.reportSort(desc("band")))
    },
    Some("""WITH scored AS (
              SELECT CAST(floor(c_acctbal / 500) AS BIGINT) AS band,
                     CAST(o_totalprice > 300000 AS BIGINT) AS pos
              FROM orders JOIN customer ON o_custkey = c_custkey),
            pb AS (
              SELECT band, sum(pos) AS tp_band,
                     count(*) - sum(pos) AS fp_band
              FROM scored GROUP BY band),
            tot AS (SELECT sum(tp_band) AS tot_p, sum(fp_band) AS tot_n
                    FROM pb),
            c AS (
              SELECT band,
                     CAST(sum(tp_band) OVER (ORDER BY band DESC) AS BIGINT)
                       AS tp,
                     CAST(sum(fp_band) OVER (ORDER BY band DESC) AS BIGINT)
                       AS fp
              FROM pb),
            conf AS (
              SELECT band, tp, fp,
                     CAST(tot_p - tp AS BIGINT) AS fn,
                     CAST(tot_n - fp AS BIGINT) AS tn
              FROM c, tot),
            m AS (
              SELECT band, tp, fp, fn, tn,
                     sqrt(CAST(tp + fp AS DOUBLE)) *
                     sqrt(CAST(tp + fn AS DOUBLE)) *
                     sqrt(CAST(tn + fp AS DOUBLE)) *
                     sqrt(CAST(tn + fn AS DOUBLE)) AS den
              FROM conf)
            SELECT band, tp, fp, fn, tn,
                   CAST(round(CASE WHEN den > 0
                       THEN (CAST(tp AS DOUBLE) * tn -
                             CAST(fp AS DOUBLE) * fn) / den
                       ELSE 0.0 END * 1e6, 0) AS BIGINT) AS mcc_micro,
                   CAST(round(CASE WHEN 2.0 * tp + fp + fn > 0
                       THEN 2.0 * CAST(tp AS DOUBLE) /
                            (2.0 * CAST(tp AS DOUBLE) + fp + fn)
                       ELSE 0.0 END * 1e6, 0) AS BIGINT) AS f1_micro
            FROM m ORDER BY band DESC"""))

  val all: Seq[Q] = Seq(cramersV, isotropy, clusteringCoeff, mccSweep)
}
