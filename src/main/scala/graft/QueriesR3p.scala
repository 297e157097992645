package graft

import graft.engine.Ck.Ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

import graft.engine.Engine

/** Round-3 batch 16: nearest-centroid (Rocchio) classification over
  * embeddings, median-absolute-deviation robust outlier detection, and
  * the Lorenz curve + Gini coefficient with distributed (banded) ranks.
  */
object QueriesR3p {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Engine.table(s, dir, name)

  // ------------- sim_centroid_classify: Rocchio nearest centroid

  private val centroid = Q(
    "sim_centroid_classify",
    "Nearest-centroid (Rocchio) classification: per-label MEAN " +
      "embeddings train from micro-quantized per-dimension integer " +
      "sums (exact, order-free), and every vector classifies by " +
      "cosine-to-centroid — the n in mean and ||v|| cancel under " +
      "argmax, so the score is dot(v,Σc)/√(Σc·Σc): two correctly-" +
      "rounded IEEE ops over exact integers, bit-identical across " +
      "engines. Training is one groupBy over (label, dim); scoring " +
      "joins each vector dim against the 640-row centroid table " +
      "(broadcast at any corpus size). Output: the confusion matrix " +
      "against true labels — the drift check for embedding-space " +
      "class structure.",
    (s, d) => {
      val dims = t(s, d, "embeddings")
        .select(col("vec_id"), col("label"),
          posexplode(col("embedding")).as(Seq("dim", "f")))
        .select(col("vec_id"), col("label"), col("dim"),
          round(col("f").cast(DoubleType) * 1e6, 0).cast(LongType)
            .as("qv"))
      val cent = dims.groupBy(col("label").as("c_label"), col("dim"))
        .agg(sum("qv").as("qsum"))
      val cnorm = cent.groupBy("c_label")
        .agg(sum((col("qsum") * col("qsum")).cast(DecimalType(38, 0)))
          .as("c_norm2"))
      val scores = dims
        .join(broadcast(cent), "dim")
        .groupBy(col("vec_id"), col("label"), col("c_label"))
        .agg(sum((col("qv") * col("qsum")).cast(DecimalType(38, 0)))
          .as("num"))
        .join(broadcast(cnorm), "c_label")
        .select(col("vec_id"), col("label"), col("c_label"),
          (col("num").cast(DoubleType) /
            sqrt(col("c_norm2").cast(DoubleType))).as("score"))
      val pred = scores.withColumn("rn", row_number().over(
          Window.partitionBy("vec_id")
            .orderBy(desc("score"), col("c_label"))))
        .filter(col("rn") === 1)
      pred.groupBy(col("label").as("actual"),
          col("c_label").as("predicted"))
        .agg(count(lit(1)).as("n_vecs"))
        .transform(graft.engine.Ops.reportSort("actual", "predicted"))
    },
    Some("""WITH dims AS (
              SELECT vec_id, label, i - 1 AS dim,
                     CAST(round(CAST(embedding[CAST(i AS INT)] AS DOUBLE)
                       * 1e6, 0) AS BIGINT) AS qv
              FROM (SELECT vec_id, label, embedding,
                           unnest(range(1, len(embedding) + 1)) AS i
                    FROM embeddings)),
            cent AS (SELECT label AS c_label, dim,
                            CAST(sum(qv) AS BIGINT) AS qsum
                     FROM dims GROUP BY 1, 2),
            cnorm AS (SELECT c_label, sum(qsum * qsum) AS c_norm2
                      FROM cent GROUP BY 1),
            num AS (SELECT vec_id, d.label, c.c_label,
                           sum(d.qv * c.qsum) AS num
                    FROM dims d JOIN cent c USING (dim)
                    GROUP BY 1, 2, 3),
            scores AS (SELECT vec_id, label, num.c_label,
                              CAST(num AS DOUBLE) /
                                sqrt(CAST(c_norm2 AS DOUBLE)) AS score
                       FROM num JOIN cnorm USING (c_label)),
            pred AS (SELECT vec_id, label, c_label
                     FROM (SELECT *, row_number() OVER
                             (PARTITION BY vec_id
                              ORDER BY score DESC, c_label) AS rn
                           FROM scores)
                     WHERE rn = 1)
            SELECT label AS actual, c_label AS predicted,
                   CAST(count(*) AS BIGINT) AS n_vecs
            FROM pred GROUP BY 1, 2 ORDER BY actual, predicted"""))

  // ------------- w18_anomaly_mad: robust MAD outlier detection

  private val mad = Q(
    "w18_anomaly_mad",
    "Robust outlier detection via median absolute deviation — the " +
      "anomaly screen that, unlike the z-score (w8), survives the " +
      "outliers it hunts: per event type, median and MAD compute on " +
      "DOUBLED integer cents (interpolated medians land on exact " +
      "half-integers, so ×2/×4 scaling keeps every comparison in " +
      "BIGINTs), and a row is anomalous when 2·|2x−med2| > 6·mad4/2 " +
      "— i.e. |x−med| > 3·MAD, evaluated entirely in integers. Two " +
      "grouped exact-percentile passes + one map-side flag count.",
    (s, d) => {
      val base = t(s, d, "events")
        .select(col("event_type").as("etype"),
          round(col("value") * 100, 0).cast(LongType).as("cents"))
      val med = base.groupBy("etype")
        .agg(round(expr("percentile(cents, 0.5)") * 2, 0)
          .cast(LongType).as("med2"))
      val dev = base.join(broadcast(med), "etype")
        .select(col("etype"), col("cents"), col("med2"),
          abs(col("cents") * 2 - col("med2")).as("d2"))
      val madAgg = dev.groupBy("etype")
        .agg(round(expr("percentile(d2, 0.5)") * 2, 0)
          .cast(LongType).as("mad4"))
      dev.join(broadcast(madAgg), "etype")
        .groupBy("etype")
        .agg(count(lit(1)).as("n"),
          max("med2").as("med2"),
          max("mad4").as("mad4"),
          sum((col("d2") * 4 > col("mad4") * 6).cast(LongType))
            .as("n_outliers"))
        .transform(graft.engine.Ops.reportSort("etype"))
    },
    Some("""WITH base AS (
              SELECT event_type AS etype,
                     CAST(round(value * 100, 0) AS BIGINT) AS cents
              FROM events),
            med AS (SELECT etype,
                           CAST(round(quantile_cont(cents, 0.5) * 2, 0)
                             AS BIGINT) AS med2
                    FROM base GROUP BY 1),
            dev AS (SELECT etype, cents, med2,
                           abs(cents * 2 - med2) AS d2
                    FROM base JOIN med USING (etype)),
            madt AS (SELECT etype,
                            CAST(round(quantile_cont(d2, 0.5) * 2, 0)
                              AS BIGINT) AS mad4
                     FROM dev GROUP BY 1)
            SELECT etype, CAST(count(*) AS BIGINT) AS n,
                   max(med2) AS med2, max(mad4) AS mad4,
                   CAST(sum(CAST(d2 * 4 > mad4 * 6 AS BIGINT)) AS BIGINT)
                     AS n_outliers
            FROM dev JOIN madt USING (etype)
            GROUP BY etype ORDER BY etype"""))

  // ------------- stat_gini_lorenz: concentration with banded ranks

  private val gini = Q(
    "stat_gini_lorenz",
    "Lorenz curve + Gini coefficient of customer spend concentration " +
      "with DISTRIBUTED ranks: per-customer totals (exact cents) band " +
      "by spend, band offsets come from the tiny band histogram, and " +
      "within-band row_numbers complete the global rank — no single-" +
      "partition sort at any scale (ties share a value, so tie order " +
      "cannot change Σrank·x). Output: spend deciles with cumulative " +
      "share (integer micros) and the Gini " +
      "G = (2Σr·x − (n+1)Σx)/(nΣx) as one micro-rounded double tree " +
      "over exact DECIMAL sums.",
    (s, d) => {
      // spend feeds BOTH the band histogram and the ranked join, and
      // ranked feeds BOTH the scalar totals and the decile rollup — each
      // re-derivation used to run as its own broadcast-build subquery
      // (18 driver jobs of pure scheduling floor). Materialize each
      // shared frame once; the two 1-row broadcasts (n for the decile
      // split, gini/sx for the final select) fuse into ONE scalar frame
      // crossJoined before the decile groupBy, which carries the
      // constants through as grouping columns.
      val spend = t(s, d, "orders")
        .groupBy("o_custkey")
        .agg(sum(round(col("o_totalprice") * 100, 0).cast(LongType))
          .as("x"))
        .withColumn("band", expr("x div 1000000"))
        // lazy (round 9; was eager): every consumer lives in the ONE
        // final compiled plan now, so truncation without a blocking job
        // suffices — the persisted blocks still compute once
        .ckpt(false)
      val bandW = Window.orderBy("band")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val hist = spend.groupBy("band").agg(count(lit(1)).as("bc"))
        .select(col("band"), (sum("bc").over(bandW) - col("bc"))
          .as("off"))
      val ranked = spend.join(hist, "band")
        .select(col("o_custkey"), col("x"),
          (col("off") + row_number().over(Window.partitionBy("band")
            .orderBy("x", "o_custkey"))).as("r"))
        .ckpt(false)
      val tot = ranked.agg(
        count(lit(1)).as("n"),
        sum("x").as("sx"),
        sum((col("r") * col("x")).cast(DecimalType(38, 0))).as("srx"))
      def dd(c: String) = col(c).cast(DoubleType)
      val scal = tot.select(col("n"), col("sx"),
        round((lit(2.0) * dd("srx") - (dd("n") + 1) * dd("sx")) /
          (dd("n") * dd("sx")) * 1e6, 0).cast(LongType)
          .as("gini_micro"))
      // 1-row scalar frame rides as a cartesian — the broadcast build
      // was its own scheduler job (5 → 2 jobs total with the lazy
      // checkpoints above)
      val deciles = ranked.hint("shuffle_replicate_nl").crossJoin(scal)
        .select(expr("((r - 1) * 10) div n").as("decile"), col("x"),
          col("sx"), col("gini_micro"))
        .groupBy("decile", "sx", "gini_micro")
        .agg(count(lit(1)).as("n_cust"), sum("x").as("decile_cents"))
      val decW = Window.orderBy("decile")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      deciles
        .withColumn("cum_cents", sum("decile_cents").over(decW))
        .select(col("decile"), col("n_cust"), col("decile_cents"),
          col("cum_cents"),
          expr("cum_cents * 1000000 div sx").as("cum_share_micro"),
          col("gini_micro"))
        // 10-row output already in one partition after the unpartitioned
        // cumulative window — sort in place, no range-sample job
        .sortWithinPartitions("decile")
    },
    Some("""WITH spend AS (
              SELECT o_custkey,
                     CAST(sum(CAST(round(o_totalprice * 100, 0)
                       AS BIGINT)) AS BIGINT) AS x
              FROM orders GROUP BY 1),
            ranked AS (
              SELECT o_custkey, x,
                     CAST(row_number() OVER (ORDER BY x, o_custkey)
                       AS BIGINT) AS r
              FROM spend),
            tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
                           CAST(sum(x) AS BIGINT) AS sx,
                           sum(r * x) AS srx
                    FROM ranked),
            g AS (SELECT n, sx,
                         CAST(round((2.0 * CAST(srx AS DOUBLE) -
                             (CAST(n AS DOUBLE) + 1) * CAST(sx AS DOUBLE))
                           / (CAST(n AS DOUBLE) * CAST(sx AS DOUBLE))
                           * 1e6, 0) AS BIGINT) AS gini_micro
                  FROM tot),
            dec AS (SELECT ((r - 1) * 10) // n AS decile, x
                    FROM ranked CROSS JOIN (SELECT n FROM tot) tn),
            agg AS (SELECT decile,
                           CAST(count(*) AS BIGINT) AS n_cust,
                           CAST(sum(x) AS BIGINT) AS decile_cents
                    FROM dec GROUP BY 1)
            SELECT decile, n_cust, decile_cents,
                   CAST(sum(decile_cents) OVER (ORDER BY decile
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS BIGINT) AS cum_cents,
                   (CAST(sum(decile_cents) OVER (ORDER BY decile
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS BIGINT) * 1000000) // (SELECT sx FROM g)
                     AS cum_share_micro,
                   (SELECT gini_micro FROM g) AS gini_micro
            FROM agg ORDER BY decile"""))

  val all: Seq[Q] = Seq(centroid, mad, gini)
}
