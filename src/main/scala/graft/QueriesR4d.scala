package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.LongType

import graft.engine.Engine
import graft.operators.Dedup

/** Round-3 batch 30: STL-lite seasonal decomposition, reciprocal-rank
  * fusion of two rankers, and an order-insensitive shard manifest.
  */
object QueriesR4d {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Engine.table(s, dir, name)

  // ------------- w26_stl_lite: trend / seasonal / residual

  private val stl = Q(
    "w26_stl_lite",
    "STL-lite decomposition of the daily event series: trend = centered " +
      "7-day moving average (full windows only), seasonal = per-ISO-dow " +
      "mean of the detrended series, residual = what's left — the " +
      "decomposition a forecaster runs before modeling anything. " +
      "Detrending stays in integer bp (y·10000 − MA·10000 as exact " +
      "sums); the only floats are three single divisions of exact " +
      "integers, identical on both engines, rounded once. All windows " +
      "run over the per-day rollup — bounded by the horizon, never " +
      "event volume (the ECDF-family discipline).",
    (s, d) => {
      val daily = t(s, d, "events")
        .groupBy(to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("y"))
      val w7 = Window.orderBy("day").rowsBetween(-3, 3)
      val trended = daily
        .withColumn("n7", count(lit(1)).over(w7))
        .withColumn("s7", sum("y").over(w7).cast(LongType))
        .filter(col("n7") === 7L)
        .withColumn("trend", round(col("s7").cast("double") / 7, 6))
        .withColumn("detr_x7", col("y") * 7L - col("s7"))
        .withColumn("isodow", (weekday(col("day")) + 1).cast(LongType))
      val seas = trended.groupBy("isodow")
        .agg(sum("detr_x7").cast(LongType).as("sd"),
          count(lit(1)).as("nd"))
        .select(col("isodow"),
          round(col("sd").cast("double") / (col("nd") * 7), 6)
            .as("seasonal"))
      trended.join(broadcast(seas), "isodow")
        .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
          col("y"), col("trend"), col("seasonal"),
          round(col("detr_x7").cast("double") / 7 - col("seasonal"), 6)
            .as("residual"))
        .transform(graft.engine.Ops.reportSort("day"))
    },
    Some("""WITH daily AS (SELECT CAST(ts AS DATE) AS day,
                                  CAST(count(*) AS BIGINT) AS y
                           FROM events GROUP BY 1),
            trended AS (
              SELECT day, y,
                     CAST(count(*) OVER w AS BIGINT) AS n7,
                     CAST(sum(y) OVER w AS BIGINT) AS s7,
                     CAST(isodow(day) AS BIGINT) AS isodow
              FROM daily
              WINDOW w AS (ORDER BY day
                           ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
            full_w AS (
              SELECT day, y, isodow,
                     round(CAST(s7 AS DOUBLE) / 7, 6) AS trend,
                     y * 7 - s7 AS detr_x7
              FROM trended WHERE n7 = 7),
            seas AS (
              SELECT isodow,
                     round(CAST(sum(detr_x7) AS DOUBLE)
                           / (count(*) * 7), 6) AS seasonal
              FROM full_w GROUP BY 1)
            SELECT strftime(day, '%Y-%m-%d') AS day, y, trend, seasonal,
                   round(CAST(detr_x7 AS DOUBLE) / 7 - seasonal, 6)
                     AS residual
            FROM full_w JOIN seas USING (isodow)
            ORDER BY day"""))

  // ------------- sim_rrf_fusion: reciprocal-rank fusion of two rankers

  private val rrf = Q(
    "sim_rrf_fusion",
    "Reciprocal-rank fusion of two independent rankers (quality score " +
      "and document length) — the standard zero-tuning way to merge " +
      "rankings whose scores aren't comparable: rrf = Σ 1e6 div " +
      "(60 + rank_i), kept INTEGER so the fusion needs no float " +
      "tolerance; docs missing from a ranker's top-100 contribute 0. " +
      "Each ranker's candidate cut is a TakeOrdered (never a global " +
      "sort window over the corpus); ranks are assigned within the " +
      "bounded top-100, the fusion is one full-outer join of two " +
      "100-row frames. The shape under every hybrid-search stack.",
    (s, d) => {
      def top100(ranked: DataFrame, scoreCol: String): DataFrame =
        ranked.orderBy(desc(scoreCol), col("doc_id")).limit(100)
          .withColumn("rank", row_number().over(
            Window.orderBy(desc(scoreCol), col("doc_id"))).cast(LongType))
          .select(col("doc_id"), col("rank"))
      val docs = t(s, d, "documents")
      val byQuality = top100(docs.select(col("doc_id"),
        graft.operators.TextAnalysis.qualityScore(col("text")).as("q")), "q")
      val byLength = top100(docs.select(col("doc_id"),
        col("n_chars").cast(LongType).as("len")), "len")
      byQuality.select(col("doc_id"), col("rank").as("rank_q"))
        .join(byLength.select(col("doc_id"), col("rank").as("rank_len")),
          Seq("doc_id"), "full_outer")
        .select(col("doc_id"),
          coalesce(col("rank_q"), lit(0L)).as("rank_q"),
          coalesce(col("rank_len"), lit(0L)).as("rank_len"),
          (when(col("rank_q").isNotNull,
            expr("1000000 div (60 + rank_q)")).otherwise(0L) +
           when(col("rank_len").isNotNull,
             expr("1000000 div (60 + rank_len)")).otherwise(0L))
            .as("rrf_micro"))
        .orderBy(desc("rrf_micro"), col("doc_id")).limit(20)
    },
    Some("""WITH q AS (
              SELECT doc_id,
                     round(least(CAST(1.0 AS DOUBLE),
                       len(string_split(text, ' ')) / 100.0) *
                       (1.0 - len(list_filter(string_split(text, ' '),
                          x -> x IN ('the','a','of','and','to'))) /
                         len(string_split(text, ' '))), 6) AS s
              FROM documents),
            top_q AS (SELECT doc_id, CAST(row_number() OVER
                        (ORDER BY s DESC, doc_id) AS BIGINT) AS rank_q
                      FROM (SELECT * FROM q
                            ORDER BY s DESC, doc_id LIMIT 100)),
            top_len AS (SELECT doc_id, CAST(row_number() OVER
                          (ORDER BY n_chars DESC, doc_id) AS BIGINT)
                            AS rank_len
                        FROM (SELECT doc_id, n_chars FROM documents
                              ORDER BY n_chars DESC, doc_id LIMIT 100))
            SELECT doc_id,
                   coalesce(rank_q, 0) AS rank_q,
                   coalesce(rank_len, 0) AS rank_len,
                   (CASE WHEN rank_q IS NOT NULL
                         THEN 1000000 // (60 + rank_q) ELSE 0 END +
                    CASE WHEN rank_len IS NOT NULL
                         THEN 1000000 // (60 + rank_len) ELSE 0 END)
                     AS rrf_micro
            FROM top_q FULL OUTER JOIN top_len USING (doc_id)
            ORDER BY rrf_micro DESC, doc_id LIMIT 20"""))

  // ------------- curate_shard_manifest: order-insensitive checksums

  private val manifest = Q(
    "curate_shard_manifest",
    "Shard manifest with ORDER-INSENSITIVE checksums — the integrity " +
      "record a dataset release ships: docs hash-route to 16 shards " +
      "(content-stable md5-prefix, like the samplers), and each " +
      "shard's checksum is the bit_xor fold of per-doc content hashes " +
      "— commutative, so any partitioning/ordering of the shard " +
      "produces the same digest, which is exactly what makes it " +
      "verifiable after a distributed write. One map pass + one " +
      "16-group rollup at any scale; byte and doc totals ride along.",
    (s, d) =>
      t(s, d, "documents")
        .select((Dedup.tokenId(col("doc_id").cast("string")) % 16L)
          .as("shard"),
          col("n_chars"), Dedup.tokenId(col("text")).as("h"))
        .groupBy("shard")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_chars").cast(LongType).as("total_chars"),
          expr("bit_xor(h)").as("checksum"))
        .orderBy("shard"),
    Some("""SELECT ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                     ::BIGINT % 16 AS shard,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(n_chars) AS BIGINT) AS total_chars,
                   bit_xor(('0x' || substr(md5(text), 1, 8))::BIGINT)
                     AS checksum
            FROM documents
            GROUP BY 1 ORDER BY shard"""))

  val all: Seq[Q] = Seq(stl, rrf, manifest)
}
