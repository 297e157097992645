package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.{DoubleType, LongType}

import graft.engine.Engine

/** Round-5 batch 9: segmental type-token ratio, nearest-neighbor
  * spatial join, context-length packing-efficiency sweep.
  */
object QueriesR5k {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Engine.table(s, dir, name)

  // ------- text_msttr: mean segmental type-token ratio

  private val msttr = Q(
    "text_msttr",
    "Mean Segmental Type-Token Ratio (MSTTR-50) per source — the " +
      "length-robust lexical-diversity metric (plain TTR collapses as " +
      "docs grow; segmenting at 50 tokens removes the length bias): " +
      "each doc's tokens split into consecutive 50-token segments, " +
      "per-segment distinct share, then the mean over all of a " +
      "source's full segments. The segmentation is a bounded in-row " +
      "transform (segment count = len/50), the distinct count per " +
      "segment is an in-row array op — no token-level shuffle at all; " +
      "the only exchange is the final per-source rollup of per-segment " +
      "integer micro ratios.",
    (s, d) => {
      val segs = t(s, d, "documents")
        .select(col("source"), split(col("text"), " ").as("tk"))
        .filter(size(col("tk")) >= 50)
        .select(col("source"), explode(expr(
          """transform(sequence(0, size(tk) div 50 - 1), i ->
               size(array_distinct(slice(tk, i * 50 + 1, 50))))"""))
          .as("n_types"))
      def dd(c: String) = col(c).cast(DoubleType)
      segs
        .select(col("source"),
          (col("n_types") * 20000L).as("ttr_micro"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_segments"),
          sum("ttr_micro").as("sum_micro"))
        .select(col("source"), col("n_segments"),
          expr("sum_micro div n_segments").as("msttr_micro"))
        .transform(graft.engine.Ops.reportSort("source"))
    },
    Some("""WITH segs AS (
              SELECT source,
                     unnest(list_transform(range(0, len(tk) // 50),
                       i -> len(list_distinct(tk[i * 50 + 1 :
                                                 i * 50 + 50]))))
                       AS n_types
              FROM (SELECT source, string_split(text, ' ') AS tk
                    FROM documents)
              WHERE len(tk) >= 50)
            SELECT source, CAST(count(*) AS BIGINT) AS n_segments,
                   CAST(sum(n_types * 20000) AS BIGINT) // count(*)
                     AS msttr_micro
            FROM segs GROUP BY 1 ORDER BY 1"""))

  // ------- j26_nearest_geo: grid-accelerated nearest-neighbor join

  private val nearestGeo = Q(
    "j26_nearest_geo",
    "Nearest-neighbor spatial join — the argmin complement to " +
      "geo_grid_join's radius semantics: each of the first 200 " +
      "customers finds its nearest SUPPLIER site in degree-space " +
      "using the same synthetic coordinate scheme, candidates meeting " +
      "in a 3×3 neighborhood hash-join on 5° grid cells (the supplier " +
      "side explodes its 9 cells once — candidates are bounded by " +
      "cell occupancy, never |C|×|S|), argmin by struct-ordered MIN " +
      "(d², then supplier key — deterministic ties), with customers " +
      "whose neighborhood is EMPTY kept by a left join and flagged " +
      "unmatched — exactly how a production nearest-join degrades " +
      "when the grid is sparse.",
    (s, d) => {
      def coords(df: DataFrame, key: String, nk: String) = df
        .select(col(key).as("id"),
          ((col(nk) * 7 % 180) - 90 + (col(key) % 100) / 100.0 * 4)
            .as("lat"),
          ((col(nk) * 13 % 360) - 180 + (col(key) % 137) / 137.0 * 4)
            .as("lon"))
      val cust = coords(t(s, d, "customer"), "c_custkey", "c_nationkey")
        .filter(col("id") <= 200)
        .withColumn("cx", floor(col("lat") / 5).cast(LongType))
        .withColumn("cy", floor(col("lon") / 5).cast(LongType))
      val supp = coords(t(s, d, "supplier"), "s_suppkey", "s_nationkey")
        .select(col("id").as("sid"), col("lat").as("slat"),
          col("lon").as("slon"))
        .select(col("sid"), col("slat"), col("slon"),
          explode(expr(
            """flatten(transform(sequence(-1, 1), dx ->
                 transform(sequence(-1, 1), dy -> struct(
                   CAST(floor(slat / 5) + dx AS BIGINT) AS gx,
                   CAST(floor(slon / 5) + dy AS BIGINT) AS gy))))"""))
          .as("g"))
        .select(col("sid"), col("slat"), col("slon"),
          col("g.gx").as("cx"), col("g.gy").as("cy"))
      val scored = cust.join(supp, Seq("cx", "cy"))
        .select(col("id"), col("sid"),
          ((col("lat") - col("slat")) * (col("lat") - col("slat")) +
            (col("lon") - col("slon")) * (col("lon") - col("slon")))
            .as("d2"))
        .groupBy("id")
        .agg(min(struct(col("d2"), col("sid"))).as("m"))
      cust.select("id").join(scored, Seq("id"), "left")
        .select(col("id").as("custkey"),
          col("m.sid").as("nearest_suppkey"),
          when(col("m").isNull, lit(null))
            .otherwise(round(col("m.d2") * 1e6, 0)).cast(LongType)
            .as("d2_micro"),
          col("m").isNull.cast("int").as("unmatched"))
        .transform(graft.engine.Ops.reportSort("custkey"))
    },
    Some("""WITH cust AS (
              SELECT c_custkey AS id,
                     (c_nationkey * 7 % 180) - 90 +
                       (c_custkey % 100) / 100.0 * 4 AS lat,
                     (c_nationkey * 13 % 360) - 180 +
                       (c_custkey % 137) / 137.0 * 4 AS lon
              FROM customer WHERE c_custkey <= 200),
            cg AS (
              SELECT id, lat, lon,
                     CAST(floor(lat / 5) AS BIGINT) AS cx,
                     CAST(floor(lon / 5) AS BIGINT) AS cy
              FROM cust),
            supp AS (
              SELECT s_suppkey AS sid,
                     (s_nationkey * 7 % 180) - 90 +
                       (s_suppkey % 100) / 100.0 * 4 AS slat,
                     (s_nationkey * 13 % 360) - 180 +
                       (s_suppkey % 137) / 137.0 * 4 AS slon
              FROM supplier),
            sg AS (
              SELECT sid, slat, slon,
                     CAST(floor(slat / 5) + dx AS BIGINT) AS cx,
                     CAST(floor(slon / 5) + dy AS BIGINT) AS cy
              FROM supp
              CROSS JOIN (SELECT unnest(range(-1, 2)) AS dx)
              CROSS JOIN (SELECT unnest(range(-1, 2)) AS dy)),
            scored AS (
              SELECT id,
                     min(struct_pack(d2 := (lat - slat) * (lat - slat) +
                                           (lon - slon) * (lon - slon),
                                     sid := sid)) AS m
              FROM cg JOIN sg USING (cx, cy)
              GROUP BY id)
            SELECT cg2.id AS custkey,
                   m.sid AS nearest_suppkey,
                   CAST(round(m.d2 * 1e6, 0) AS BIGINT) AS d2_micro,
                   CAST(m.sid IS NULL AS INT) AS unmatched
            FROM (SELECT DISTINCT id FROM cg) cg2
            LEFT JOIN scored ON cg2.id = scored.id
            ORDER BY custkey"""))

  // ------- curate_pack_efficiency: context-length packing sweep

  private val packEfficiency = Q(
    "curate_pack_efficiency",
    "Sequence-packing efficiency sweep across context lengths {512, " +
      "1024, 2048, 4096} — the measurement that picks a training " +
      "context size for a corpus: docs (token counts, oversize docs " +
      "truncated to the context) pack greedily in doc_id order into " +
      "bins via the cumulative-sum-with-reset approximation (bin id = " +
      "cumtok div ctx — the shardable large-scale packer, same " +
      "contract as curate_pack_sequences), and each context length " +
      "reports bins used, mean fill, and padding waste share in " +
      "integer micro units. One doc-length frame feeds all four " +
      "lengths via a bounded ×4 explode; the cumulative window rides " +
      "doc order per context — the packing decision a 100 TB corpus " +
      "makes per shard, here audited corpus-wide.",
    (s, d) => {
      val lens = t(s, d, "documents")
        .select(col("doc_id"), size(split(col("text"), " ")).as("len"))
      val swept = lens
        .select(col("doc_id"), col("len"),
          explode(array(lit(512), lit(1024), lit(2048), lit(4096)))
            .as("ctx"))
        .select(col("doc_id"), col("ctx"),
          least(col("len"), col("ctx")).cast(LongType).as("toks"))
      val w = Window.partitionBy("ctx").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      def dd(c: String) = col(c).cast(DoubleType)
      swept
        .withColumn("cum", sum("toks").over(w))
        .withColumn("bin", expr("(cum - 1) div ctx"))
        .groupBy("ctx", "bin").agg(sum("toks").as("bin_toks"))
        .groupBy("ctx")
        .agg(count(lit(1)).as("n_bins"), sum("bin_toks").as("total_toks"))
        .select(col("ctx").cast(LongType).as("ctx"), col("n_bins"),
          col("total_toks"),
          round(dd("total_toks") * 1e6 / (dd("n_bins") * dd("ctx")), 0)
            .cast(LongType).as("fill_micro"),
          round((lit(1e6) - dd("total_toks") * 1e6 /
            (dd("n_bins") * dd("ctx"))), 0).cast(LongType)
            .as("waste_micro"))
        .transform(graft.engine.Ops.reportSort("ctx"))
    },
    Some("""WITH lens AS (
              SELECT doc_id, len(string_split(text, ' ')) AS len
              FROM documents),
            swept AS (
              SELECT doc_id, ctx,
                     CAST(least(len, ctx) AS BIGINT) AS toks
              FROM lens
              CROSS JOIN (SELECT unnest([512, 1024, 2048, 4096]) AS ctx)),
            cum AS (
              SELECT ctx, toks,
                     sum(toks) OVER (PARTITION BY ctx ORDER BY doc_id)
                       AS cum
              FROM swept),
            bins AS (
              SELECT ctx, (cum - 1) // ctx AS bin,
                     CAST(sum(toks) AS BIGINT) AS bin_toks
              FROM cum GROUP BY 1, 2),
            rolled AS (
              SELECT ctx, CAST(count(*) AS BIGINT) AS n_bins,
                     CAST(sum(bin_toks) AS BIGINT) AS total_toks
              FROM bins GROUP BY 1)
            SELECT CAST(ctx AS BIGINT) AS ctx, n_bins, total_toks,
                   CAST(round(CAST(total_toks AS DOUBLE) * 1e6 /
                     (CAST(n_bins AS DOUBLE) * ctx), 0) AS BIGINT)
                     AS fill_micro,
                   CAST(round(1e6 - CAST(total_toks AS DOUBLE) * 1e6 /
                     (CAST(n_bins AS DOUBLE) * ctx), 0) AS BIGINT)
                     AS waste_micro
            FROM rolled ORDER BY ctx"""))

  val all: Seq[Q] = Seq(msttr, nearestGeo, packEfficiency)
}
