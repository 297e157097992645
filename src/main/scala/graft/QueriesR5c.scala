package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.{DoubleType, LongType}

import graft.engine.Engine
import graft.operators.Graph

/** Round-5 batch 3: degree assortativity, rich-club coefficient,
  * precision-recall curve, Brier score decomposition.
  */
object QueriesR5c {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Engine.table(s, dir, name)

  // ------------- g10_assortativity: degree-degree correlation

  private val assortativity = Q(
    "g10_assortativity",
    "Degree assortativity of the co-purchase backbone — Newman's " +
      "Pearson correlation over edge-endpoint degrees (hubs linking " +
      "hubs ⇒ positive; hub-and-spoke ⇒ negative), the one-number " +
      "summary of a graph's mixing structure. Degrees from one rollup " +
      "of the memoized backbone (Graph.backbone — shared across the " +
      "graph family, built once per run), joined to both endpoints; " +
      "the correlation is the standard sufficient-statistics form over " +
      "exact BIGINT degree sums on the DIRECTED-both-ways edge list " +
      "(each undirected edge contributes both (j,k) and (k,j), the " +
      "convention that makes the formula symmetric).",
    (s, d) => {
      val e0 = Graph.backbone(s, d).select("a", "b")
      val und = e0.select(col("a").as("v"), col("b").as("w"))
        .unionAll(e0.select(col("b").as("v"), col("a").as("w")))
      val deg = und.groupBy("v").agg(count(lit(1)).as("dg"))
      val pairs = und
        .join(deg.withColumnRenamed("v", "vv").withColumnRenamed("dg", "dj"),
          col("v") === col("vv"))
        .join(deg.withColumnRenamed("v", "ww").withColumnRenamed("dg", "dk"),
          col("w") === col("ww"))
        .select(col("dj"), col("dk"))
      val agg = pairs.agg(count(lit(1)).as("m"),
        sum("dj").as("sj"), sum("dk").as("sk"),
        sum(col("dj") * col("dk")).as("sjk"),
        sum(col("dj") * col("dj")).as("sjj"),
        sum(col("dk") * col("dk")).as("skk"))
      def dd(c: String) = col(c).cast(DoubleType)
      val num = dd("m") * dd("sjk") - dd("sj") * dd("sk")
      val den = sqrt((dd("m") * dd("sjj") - dd("sj") * dd("sj")) *
        (dd("m") * dd("skk") - dd("sk") * dd("sk")))
      // den = 0 when every node has the same degree (a regular graph —
      // the tiny-SF smoke fixture degenerates to one): assortativity is
      // undefined there; both engines emit 0 so the guard itself grades
      agg.select(col("m"),
        when(den > 0, round(num / den * 1e6, 0))
          .otherwise(lit(0.0)).cast(LongType).as("assort_micro"))
    },
    Some("""WITH ed AS (SELECT DISTINCT o_custkey AS c, l_suppkey AS s
                        FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
            cap AS (SELECT c, list_sort(list(DISTINCT s))[1:20] AS ss
                    FROM ed GROUP BY c),
            pr AS (SELECT unnest(flatten(list_transform(range(1, len(ss)),
                     i -> list_transform(range(i + 1, len(ss) + 1),
                       j -> {'a': ss[i], 'b': ss[j]})))) AS p
                   FROM cap WHERE len(ss) >= 2),
            e0 AS (SELECT a, b FROM (SELECT p.a AS a, p.b AS b,
                                            count(*) AS n
                                     FROM pr GROUP BY p.a, p.b
                                     ORDER BY n DESC, a, b LIMIT 2000)),
            und AS (SELECT a AS v, b AS w FROM e0
                    UNION ALL SELECT b, a FROM e0),
            deg AS (SELECT v, CAST(count(*) AS BIGINT) AS dg
                    FROM und GROUP BY v),
            pairs AS (
              SELECT dj.dg AS dj, dk.dg AS dk
              FROM und JOIN deg dj ON und.v = dj.v
                       JOIN deg dk ON und.w = dk.v),
            agg AS (
              SELECT CAST(count(*) AS BIGINT) AS m,
                     CAST(sum(dj) AS BIGINT) AS sj,
                     CAST(sum(dk) AS BIGINT) AS sk,
                     CAST(sum(dj * dk) AS BIGINT) AS sjk,
                     CAST(sum(dj * dj) AS BIGINT) AS sjj,
                     CAST(sum(dk * dk) AS BIGINT) AS skk
              FROM pairs)
            SELECT m,
                   CAST(CASE WHEN sqrt((CAST(m AS DOUBLE) * sjj -
                                        CAST(sj AS DOUBLE) * sj) *
                                       (CAST(m AS DOUBLE) * skk -
                                        CAST(sk AS DOUBLE) * sk)) > 0
                     THEN round((CAST(m AS DOUBLE) * sjk -
                                 CAST(sj AS DOUBLE) * sk) /
                       sqrt((CAST(m AS DOUBLE) * sjj -
                             CAST(sj AS DOUBLE) * sj) *
                            (CAST(m AS DOUBLE) * skk -
                             CAST(sk AS DOUBLE) * sk)) * 1e6, 0)
                     ELSE 0.0 END AS BIGINT) AS assort_micro
            FROM agg"""))

  // ------------- g11_rich_club: connectivity of the high-degree core

  private val richClub = Q(
    "g11_rich_club",
    "Rich-club coefficient φ(k) of the co-purchase backbone for " +
      "k ∈ {2,4,6,8}: among nodes with degree > k, the realized " +
      "fraction of possible edges — 'do the hubs form a club'. Each k " +
      "row is two bounded aggregations over the memoized backbone " +
      "(degree rollup reused across k via one grid join); counts " +
      "exact, the fraction micro-rounded.",
    (s, d) => {
      val e0 = Graph.backbone(s, d).select("a", "b")
      val und = e0.select(col("a").as("v"), col("b").as("w"))
        .unionAll(e0.select(col("b").as("v"), col("a").as("w")))
      val deg = und.groupBy("v").agg(count(lit(1)).as("dg"))
      val ks = {
        import s.implicits._
        Seq(2, 4, 6, 8).toDF("k")
      }
      val nk = ks.crossJoin(deg)
        .filter(col("dg") > col("k"))
        .groupBy("k").agg(count(lit(1)).as("n_rich"))
      val ek = ks.crossJoin(
          e0.join(deg.withColumnRenamed("v", "a")
              .withColumnRenamed("dg", "da"), "a")
            .join(deg.withColumnRenamed("v", "b")
              .withColumnRenamed("dg", "db"), "b"))
        .filter(col("da") > col("k") && col("db") > col("k"))
        .groupBy("k").agg(count(lit(1)).as("e_rich"))
      def dd(c: String) = col(c).cast(DoubleType)
      nk.join(ek, Seq("k"), "left").na.fill(0L, Seq("e_rich"))
        .select(col("k"), col("n_rich"), col("e_rich"),
          when(col("n_rich") >= 2,
            round(lit(2.0) * dd("e_rich") /
              (dd("n_rich") * (dd("n_rich") - 1)) * 1e6, 0))
            .otherwise(lit(0.0)).cast(LongType).as("phi_micro"))
        .transform(graft.engine.Ops.reportSort("k"))
    },
    Some("""WITH ed AS (SELECT DISTINCT o_custkey AS c, l_suppkey AS s
                        FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
            cap AS (SELECT c, list_sort(list(DISTINCT s))[1:20] AS ss
                    FROM ed GROUP BY c),
            pr AS (SELECT unnest(flatten(list_transform(range(1, len(ss)),
                     i -> list_transform(range(i + 1, len(ss) + 1),
                       j -> {'a': ss[i], 'b': ss[j]})))) AS p
                   FROM cap WHERE len(ss) >= 2),
            e0 AS (SELECT a, b FROM (SELECT p.a AS a, p.b AS b,
                                            count(*) AS n
                                     FROM pr GROUP BY p.a, p.b
                                     ORDER BY n DESC, a, b LIMIT 2000)),
            und AS (SELECT a AS v, b AS w FROM e0
                    UNION ALL SELECT b, a FROM e0),
            deg AS (SELECT v, CAST(count(*) AS BIGINT) AS dg
                    FROM und GROUP BY v),
            ks AS (SELECT unnest([2, 4, 6, 8]) AS k),
            nk AS (SELECT k, CAST(count(*) AS BIGINT) AS n_rich
                   FROM ks CROSS JOIN deg WHERE dg > k GROUP BY k),
            ek AS (SELECT k, CAST(count(*) AS BIGINT) AS e_rich
                   FROM ks CROSS JOIN (
                     SELECT da.dg AS da, db.dg AS db
                     FROM e0 JOIN deg da ON e0.a = da.v
                             JOIN deg db ON e0.b = db.v)
                   WHERE da > k AND db > k GROUP BY k)
            SELECT nk.k, n_rich, coalesce(e_rich, 0) AS e_rich,
                   CAST(CASE WHEN n_rich >= 2
                     THEN round(2.0 * coalesce(e_rich, 0) /
                            (CAST(n_rich AS DOUBLE) * (n_rich - 1)) * 1e6, 0)
                     ELSE 0.0 END AS BIGINT) AS phi_micro
            FROM nk LEFT JOIN ek ON nk.k = ek.k
            ORDER BY nk.k"""))

  // ------------- ml_pr_points: precision-recall curve

  private val prPoints = Q(
    "ml_pr_points",
    "Binned precision-recall curve for the ml_roc_points task (balance " +
      "band predicts high-value order) — the curve that matters under " +
      "class imbalance, where ROC flatters weak models: cumulative " +
      "TP/(TP+FP) and TP/P from the highest score band down, one " +
      "bounded groupBy + a running sum over ≤ a few dozen band rows. " +
      "Emits F1 per threshold too — the operating-point picker.",
    (s, d) => {
      val scored = t(s, d, "orders")
        .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
        .select(
          floor(col("c_acctbal") / 500).cast(LongType).as("band"),
          (col("o_totalprice") > 300000).cast(LongType).as("pos"))
      val perBand = scored.groupBy("band")
        .agg(sum("pos").as("tp_band"),
          (count(lit(1)) - sum("pos")).as("fp_band"))
      val totals = perBand.agg(sum("tp_band").as("tot_p"))
      val wDesc = Window.orderBy(col("band").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      def dd(c: String) = col(c).cast(DoubleType)
      val prec = dd("cum_tp") / (dd("cum_tp") + dd("cum_fp"))
      val rec = dd("cum_tp") / dd("tot_p")
      perBand
        .withColumn("cum_tp", sum("tp_band").over(wDesc))
        .withColumn("cum_fp", sum("fp_band").over(wDesc))
        .crossJoin(broadcast(totals))
        .select(col("band"),
          col("cum_tp").cast(LongType).as("cum_tp"),
          col("cum_fp").cast(LongType).as("cum_fp"),
          round(prec * 1e6, 0).cast(LongType).as("precision_micro"),
          round(rec * 1e6, 0).cast(LongType).as("recall_micro"),
          round(lit(2.0) * prec * rec / (prec + rec) * 1e6, 0)
            .cast(LongType).as("f1_micro"))
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
            c AS (
              SELECT band,
                     sum(tp_band) OVER (ORDER BY band DESC) AS cum_tp,
                     sum(fp_band) OVER (ORDER BY band DESC) AS cum_fp
              FROM pb),
            f AS (
              SELECT band, CAST(cum_tp AS BIGINT) AS cum_tp,
                     CAST(cum_fp AS BIGINT) AS cum_fp,
                     CAST(cum_tp AS DOUBLE) /
                       (CAST(cum_tp AS DOUBLE) + cum_fp) AS prec,
                     CAST(cum_tp AS DOUBLE) /
                       (SELECT sum(tp_band) FROM pb) AS rec
              FROM c)
            SELECT band, cum_tp, cum_fp,
                   CAST(round(prec * 1e6, 0) AS BIGINT) AS precision_micro,
                   CAST(round(rec * 1e6, 0) AS BIGINT) AS recall_micro,
                   CAST(round(2.0 * prec * rec / (prec + rec) * 1e6, 0)
                     AS BIGINT) AS f1_micro
            FROM f ORDER BY band DESC"""))

  // ------------- ml_brier_decomp: calibration decomposition

  private val brier = Q(
    "ml_brier_decomp",
    "Brier score with the Murphy decomposition (reliability − " +
      "resolution + uncertainty) for a banded probability forecast of " +
      "high-value orders: p̂ = clamped balance-band/40 (a deterministic " +
      "monotone forecast), 10 forecast bins, per-bin (n_k, p̂_k, o_k); " +
      "REL = Σnₖ(p̂ₖ−oₖ)²/N punishes miscalibration, RES = Σnₖ(oₖ−ō)²/N " +
      "rewards discrimination. Per-bin terms micro-rounded and summed " +
      "as BIGINT (float-sum determinism discipline); everything after " +
      "the one groupBy is a ≤10-row grid.",
    (s, d) => {
      // the forecast is carried as INTEGER fortieths (b40 ∈ 0..40, p̂ =
      // b40/40): per-bin mean forecast then sums exact BIGINTs — summing
      // the inexact double 1/40 multiples would be accumulation-order
      // dependent and unhashable
      val scored = t(s, d, "orders")
        .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
        .select(
          least(greatest(floor(col("c_acctbal") / 500), lit(0L)), lit(40L))
            .cast(LongType).as("b40"),
          (col("o_totalprice") > 300000).cast(LongType).as("y"))
        .withColumn("bin", expr("b40 div 4"))
      val perBin = scored.groupBy("bin")
        .agg(count(lit(1)).as("n_k"), sum("y").as("pos_k"),
          sum("b40").as("sum_b40"))
      val totals = perBin.agg(sum("n_k").as("n"), sum("pos_k").as("pos"))
      def dd(c: String) = col(c).cast(DoubleType)
      val phk = dd("sum_b40") / (lit(40.0) * dd("n_k"))
      val ok = dd("pos_k") / dd("n_k")
      val obar = dd("pos") / dd("n")
      val terms = perBin.crossJoin(broadcast(totals))
        .select(col("bin"), col("n_k"), col("pos_k"),
          round(phk * 1e6, 0).cast(LongType).as("ph_micro"),
          round(ok * 1e6, 0).cast(LongType).as("o_micro"),
          round(dd("n_k") * (phk - ok) * (phk - ok) * 1e6, 0)
            .cast(LongType).as("rel_term_micro"),
          round(dd("n_k") * (ok - obar) * (ok - obar) * 1e6, 0)
            .cast(LongType).as("res_term_micro"))
      terms.transform(graft.engine.Ops.reportSort("bin"))
    },
    Some("""WITH scored AS (
              SELECT CAST(least(greatest(floor(c_acctbal / 500), 0), 40)
                       AS BIGINT) AS b40,
                     CAST(o_totalprice > 300000 AS BIGINT) AS y
              FROM orders JOIN customer ON o_custkey = c_custkey),
            binned AS (
              SELECT b40 // 4 AS bin, b40, y FROM scored),
            pb AS (
              SELECT bin, CAST(count(*) AS BIGINT) AS n_k,
                     CAST(sum(y) AS BIGINT) AS pos_k,
                     CAST(sum(b40) AS BIGINT) AS sum_b40
              FROM binned GROUP BY bin),
            tot AS (SELECT sum(n_k) AS n, sum(pos_k) AS pos FROM pb)
            SELECT bin, n_k, pos_k,
                   CAST(round(CAST(sum_b40 AS DOUBLE) / (40.0 * n_k) * 1e6,
                     0) AS BIGINT) AS ph_micro,
                   CAST(round(CAST(pos_k AS DOUBLE) / n_k * 1e6, 0)
                     AS BIGINT) AS o_micro,
                   CAST(round(CAST(n_k AS DOUBLE) *
                     (CAST(sum_b40 AS DOUBLE) / (40.0 * n_k) -
                      CAST(pos_k AS DOUBLE) / n_k) *
                     (CAST(sum_b40 AS DOUBLE) / (40.0 * n_k) -
                      CAST(pos_k AS DOUBLE) / n_k) * 1e6, 0)
                     AS BIGINT) AS rel_term_micro,
                   CAST(round(CAST(n_k AS DOUBLE) *
                     (CAST(pos_k AS DOUBLE) / n_k -
                      CAST(pos AS DOUBLE) / n) *
                     (CAST(pos_k AS DOUBLE) / n_k -
                      CAST(pos AS DOUBLE) / n) * 1e6, 0) AS BIGINT)
                     AS res_term_micro
            FROM pb, tot ORDER BY bin"""))

  val all: Seq[Q] = Seq(assortativity, richClub, prPoints, brier)
}
