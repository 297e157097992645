package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.LongType

import graft.engine.Engine

/** Round-3 batch 35: running-peak drawdown on daily volumes, the
  * Mann-Whitney U rank test, and a 64-bit average-hash image
  * fingerprint with band buckets.
  */
object QueriesR4i {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Engine.table(s, dir, name)

  // ------------- w28_drawdown: worst drop from the running daily peak

  private val drawdown = Q(
    "w28_drawdown",
    "Running-peak drawdown of daily event volume per user — the " +
      "volume-collapse metric SRE dashboards borrow from finance: " +
      "drawdown_t = (running max of daily count) − (today's count), " +
      "and the headline number is the worst such drop plus the FIRST " +
      "day it was attained (ties pinned to the earliest day, " +
      "deterministically). All integer arithmetic on exact counts; " +
      "two user-keyed windows + one groupBy — a single hash shuffle " +
      "on user_id at any scale, no self-joins.",
    (s, d) => {
      val daily = t(s, d, "events")
        .groupBy(col("user_id"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("y"))
      val run = Window.partitionBy("user_id").orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val whole = Window.partitionBy("user_id")
      daily
        .withColumn("peak", max("y").over(run))
        .withColumn("dd", (col("peak") - col("y")).cast(LongType))
        .withColumn("max_dd", max("dd").over(whole))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_days"),
          max("y").cast(LongType).as("peak_daily"),
          max("dd").as("max_drawdown"),
          date_format(min(when(col("dd") === col("max_dd"), col("day"))),
            "yyyy-MM-dd").as("drawdown_day"))
        .transform(graft.engine.Ops.reportSort("user_id"))
    },
    Some("""WITH daily AS (
              SELECT user_id, CAST(ts AS DATE) AS day,
                     CAST(count(*) AS BIGINT) AS y
              FROM events GROUP BY 1, 2),
            dd AS (
              SELECT user_id, day, y,
                     max(y) OVER (PARTITION BY user_id ORDER BY day
                       ROWS UNBOUNDED PRECEDING) - y AS dd
              FROM daily),
            mx AS (
              SELECT user_id, day, y, dd,
                     max(dd) OVER (PARTITION BY user_id) AS max_dd
              FROM dd)
            SELECT user_id,
                   CAST(count(*) AS BIGINT) AS n_days,
                   CAST(max(y) AS BIGINT) AS peak_daily,
                   CAST(max(dd) AS BIGINT) AS max_drawdown,
                   strftime(min(CASE WHEN dd = max_dd THEN day END),
                     '%Y-%m-%d') AS drawdown_day
            FROM mx GROUP BY 1 ORDER BY user_id"""))

  // ------------- stat_mann_whitney: rank-sum U test, tie-corrected

  private val mannWhitney = Q(
    "stat_mann_whitney",
    "Mann-Whitney U rank test per market segment: does the " +
      "order-price distribution differ between fulfilled (F) and open " +
      "(O) orders? Average ranks are kept in DOUBLED integer units " +
      "(2·rank + tie_count − 1), so the rank sum and U·2 are exact " +
      "BIGINTs — no float rank drift between engines; the z-score " +
      "applies the standard tie correction Σ(t³−t). Ranks need a " +
      "total order only WITHIN a segment (one window per segment — " +
      "at 100 TB you'd bin values first, same plan); tie counts are " +
      "a second tiny keyed aggregate joined back on the segment.",
    (s, d) => {
      val base = t(s, d, "orders")
        .filter(col("o_orderstatus").isin("F", "O"))
        .join(broadcast(t(s, d, "customer")),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_mktsegment").as("seg"),
          col("o_totalprice").as("v"),
          (col("o_orderstatus") === "F").as("g1"))
      val r2 = (lit(2L) * rank().over(Window.partitionBy("seg").orderBy("v")) +
        count(lit(1)).over(Window.partitionBy("seg", "v")) - 1L)
        .cast(LongType)
      // 5 segment keys into the 2x-floor bucket count (Engine
      // .computeParts): fewer hash collisions than the 6-partition
      // session floor ⇒ fewer segments serialized through one task
      // (measured 0.40 -> 0.33 s); hash(seg) satisfies both windows
      val segAgg = base
        .repartition(graft.engine.Engine.computeParts(s, d), col("seg"))
        .withColumn("r2", r2)
        .groupBy("seg")
        .agg(sum(col("g1").cast(LongType)).cast(LongType).as("n1"),
          sum((!col("g1")).cast(LongType)).cast(LongType).as("n2"),
          sum(when(col("g1"), col("r2")).otherwise(0L)).cast(LongType)
            .as("r1_2"))
      val ties = base
        .groupBy("seg", "v").agg(count(lit(1)).as("t"))
        .groupBy("seg")
        .agg(sum(col("t") * col("t") * col("t") - col("t"))
          .cast(LongType).as("tsum"))
      val n = (col("n1") + col("n2")).cast("double")
      val u1 = (col("u1_x2").cast("double")) / 2.0
      val mu = col("n1").cast("double") * col("n2").cast("double") / 2.0
      val variance = col("n1").cast("double") * col("n2").cast("double") / 12.0 *
        ((n + 1.0) - col("tsum").cast("double") / (n * (n - 1.0)))
      segAgg.join(ties, "seg")
        .withColumn("u1_x2",
          (col("r1_2") - col("n1") * (col("n1") + 1L)).cast(LongType))
        .select(col("seg"), col("n1"), col("n2"), col("u1_x2"),
          round(u1, 6).as("u1"),
          round(when(variance > 0.0, (u1 - mu) / sqrt(variance)), 6)
            .as("z"))
        .transform(graft.engine.Ops.reportSort("seg"))
    },
    Some("""WITH base AS (
              SELECT c_mktsegment AS seg, o_totalprice AS v,
                     o_orderstatus = 'F' AS g1
              FROM orders JOIN customer ON o_custkey = c_custkey
              WHERE o_orderstatus IN ('F', 'O')),
            rk AS (
              SELECT seg, g1,
                     CAST(2 * rank() OVER (PARTITION BY seg ORDER BY v)
                          + count(*) OVER (PARTITION BY seg, v) - 1
                       AS BIGINT) AS r2
              FROM base),
            segagg AS (
              SELECT seg,
                     CAST(sum(CASE WHEN g1 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n1,
                     CAST(sum(CASE WHEN g1 THEN 0 ELSE 1 END) AS BIGINT)
                       AS n2,
                     CAST(sum(CASE WHEN g1 THEN r2 ELSE 0 END) AS BIGINT)
                       AS r1_2
              FROM rk GROUP BY 1),
            ties AS (
              SELECT seg, CAST(sum(t*t*t - t) AS BIGINT) AS tsum
              FROM (SELECT seg, v, CAST(count(*) AS BIGINT) AS t
                    FROM base GROUP BY 1, 2) GROUP BY 1)
            SELECT seg, n1, n2,
                   CAST(r1_2 - n1 * (n1 + 1) AS BIGINT) AS u1_x2,
                   round(CAST(r1_2 - n1 * (n1 + 1) AS DOUBLE) / 2, 6)
                     AS u1,
                   round(CASE WHEN
                       CAST(n1 AS DOUBLE) * n2 / 12.0 *
                         ((n1 + n2 + 1.0) -
                          CAST(tsum AS DOUBLE) /
                            ((n1 + n2) * (n1 + n2 - 1.0))) > 0
                     THEN (CAST(r1_2 - n1 * (n1 + 1) AS DOUBLE) / 2 -
                           CAST(n1 AS DOUBLE) * n2 / 2.0) /
                          sqrt(CAST(n1 AS DOUBLE) * n2 / 12.0 *
                            ((n1 + n2 + 1.0) -
                             CAST(tsum AS DOUBLE) /
                               ((n1 + n2) * (n1 + n2 - 1.0))))
                     END, 6) AS z
            FROM segagg JOIN ties USING (seg)
            ORDER BY seg"""))

  // ------------- mm_image_ahash: 64-bit average hash + band buckets

  private val imageAhash = Q(
    "mm_image_ahash",
    "Average-hash (aHash) image fingerprint over the multimodal " +
      "fake-decode path: each doc's 8×8 grayscale tile (deterministic " +
      "pixel synthesis standing in for the resize+decode kernel — the " +
      "codec is the documented stub, the hashing plumbing is real) is " +
      "thresholded against the tile mean (strict 64·p > Σp, so the " +
      "comparison stays in integers) and packed into two 32-bit " +
      "halves — the signed-safe way to carry a 64-bit hash as BIGINTs " +
      "in ANY engine. Docs then band into 256 buckets by the top " +
      "byte, and bucket occupancy joins back via broadcast (bucket " +
      "table is bounded at 256 rows at any corpus size) — exactly " +
      "the banding step a pHash near-dup sweep runs at 100 TB. " +
      "Map-only + one bounded groupBy; zero unbounded shuffles.",
    (s, d) => {
      val px = (0 until 64).map(j =>
        (col("doc_id") * 131071L + lit(j.toLong) * 40503L) % 256L)
      val withTotal = t(s, d, "documents")
        .select(col("doc_id"))
        .withColumn("px_total", px.reduce(_ + _))
      def bit(j: Int): Column = px(j) * 64L > col("px_total")
      val hashed = withTotal.select(
        col("doc_id"),
        (0 until 32).map(j => when(bit(j), lit(1L << j)).otherwise(0L))
          .reduce(_ + _).cast(LongType).as("ahash_lo"),
        (32 until 64).map(j => when(bit(j), lit(1L << (j - 32))).otherwise(0L))
          .reduce(_ + _).cast(LongType).as("ahash_hi"),
        (0 until 64).map(j => when(bit(j), 1L).otherwise(0L))
          .reduce(_ + _).cast(LongType).as("n_set"))
        .withColumn("bucket", shiftright(col("ahash_hi"), 24).cast(LongType))
      val buckets = hashed.groupBy("bucket")
        .agg(count(lit(1)).as("bucket_size"))
      hashed.join(broadcast(buckets), "bucket")
        .select(col("doc_id"), col("ahash_lo"), col("ahash_hi"),
          col("n_set"), col("bucket"), col("bucket_size"))
        .transform(graft.engine.Ops.reportSort("doc_id"))
    },
    Some("""WITH px AS (
              SELECT doc_id, i,
                     (doc_id * 131071 + i * 40503) % 256 AS p
              FROM documents, range(0, 64) t(i)),
            tot AS (
              SELECT doc_id, i, p,
                     sum(p) OVER (PARTITION BY doc_id) AS total
              FROM px),
            agg AS (
              SELECT doc_id,
                     CAST(sum(CASE WHEN i < 32 AND p * 64 > total
                              THEN 1::BIGINT << i ELSE 0 END) AS BIGINT)
                       AS ahash_lo,
                     CAST(sum(CASE WHEN i >= 32 AND p * 64 > total
                              THEN 1::BIGINT << (i - 32) ELSE 0 END)
                       AS BIGINT) AS ahash_hi,
                     CAST(sum(CASE WHEN p * 64 > total THEN 1 ELSE 0 END)
                       AS BIGINT) AS n_set
              FROM tot GROUP BY 1),
            b AS (
              SELECT ahash_hi >> 24 AS bucket,
                     CAST(count(*) AS BIGINT) AS bucket_size
              FROM agg GROUP BY 1)
            SELECT doc_id, ahash_lo, ahash_hi, n_set,
                   CAST(ahash_hi >> 24 AS BIGINT) AS bucket, bucket_size
            FROM agg JOIN b ON (agg.ahash_hi >> 24) = b.bucket
            ORDER BY doc_id"""))

  val all: Seq[Q] = Seq(drawdown, mannWhitney, imageAhash)
}
