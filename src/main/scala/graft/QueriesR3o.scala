package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.LongType

import graft.engine.Engine

/** Round-3 batch 15: keyword-in-context concordance (the corpus
  * inspection surface), URL canonicalization + dedup (the crawl-frontier
  * op), and a distributed two-sample Kolmogorov–Smirnov test whose ECDFs
  * build with banded running sums — no global-sort window.
  */
object QueriesR3o {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Engine.table(s, dir, name)

  // ------------- text_kwic: keyword-in-context concordance

  private val kwic = Q(
    "text_kwic",
    "Keyword-in-context (KWIC) concordance for the term 'join': every " +
      "occurrence with 3 tokens of left and right context — the corpus " +
      "inspection surface linguists and data-quality reviewers read. " +
      "posexplode + clamped array slices inside the scan stage: " +
      "map-only at any corpus size, output bounded by term frequency.",
    (s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .select(col("doc_id"), col("toks"),
          posexplode(col("toks")).as(Seq("pos0", "tok")))
        .filter(col("tok") === "join")
        .select(col("doc_id"), (col("pos0") + 1).as("pos"),
          array_join(slice(col("toks"),
            greatest(lit(1), col("pos0") + 1 - 3),
            col("pos0") + 1 - greatest(lit(1), col("pos0") + 1 - 3)), " ")
            .as("left_ctx"),
          array_join(slice(col("toks"), col("pos0") + 2, lit(3)), " ")
            .as("right_ctx"))
        .orderBy("doc_id", "pos"),
    Some("""WITH tk AS (SELECT doc_id, string_split(text, ' ') AS l
                        FROM documents),
            ex AS (SELECT doc_id, l, unnest(range(1, len(l) + 1)) AS i
                   FROM tk)
            SELECT doc_id, CAST(i AS INT) AS pos,
                   coalesce(array_to_string(l[greatest(1, i - 3):i - 1],
                     ' '), '') AS left_ctx,
                   coalesce(array_to_string(l[i + 1:i + 3], ' '), '')
                     AS right_ctx
            FROM ex WHERE l[CAST(i AS INT)] = 'join'
            ORDER BY doc_id, pos"""))

  // ------------- dedup_url_canonical: crawl-frontier URL dedup

  private val urlCanonical = Q(
    "dedup_url_canonical",
    "URL canonicalization + dedup — the crawl-frontier operator: " +
      "synthesized raw URLs (scheme/case/www/query/fragment/trailing-" +
      "slash variants, deterministic per doc) normalize by string ops " +
      "alone (strip fragment then query, lowercase host, drop 'www.', " +
      "trim trailing slash) and group to one row per canonical URL " +
      "with its variant count — how a 100 TB crawl collapses " +
      "re-fetches. Parsing is split/substr in the scan stage; the " +
      "dedup is one hash groupBy on the canonical key.",
    (s, d) => {
      val raw = t(s, d, "documents").select(col("doc_id"),
        concat(
          when(col("doc_id") % 3 === 0, "HTTP://").otherwise("https://"),
          when(col("doc_id") % 2 === 0, "WWW.").otherwise(""),
          col("source"), lit(".example.com/p/"),
          (col("doc_id") % 50).cast("string"),
          when(col("doc_id") % 7 === 0, "/").otherwise(""),
          when(col("doc_id") % 4 === 0, "?utm_source=x&ref=y")
            .otherwise(""),
          when(col("doc_id") % 5 === 0, "#sec").otherwise(""))
          .as("url"))
      val rest = substring_index(col("url"), "://", -1)
      val hostPath = substring_index(substring_index(rest, "#", 1),
        "?", 1)
      val host0 = lower(substring_index(hostPath, "/", 1))
      val host = when(host0.startsWith("www."),
        host0.substr(lit(5), lit(10000))).otherwise(host0)
      val path0 = rtrim(hostPath.substr(
        length(substring_index(hostPath, "/", 1)) + 1, lit(10000)), "/")
      val path = when(path0 === "", "/").otherwise(path0)
      raw.select(col("doc_id"), concat(host, path).as("canonical_url"))
        .groupBy("canonical_url")
        .agg(count(lit(1)).as("n_variants"),
          min("doc_id").as("first_doc"))
        .transform(graft.engine.Ops.reportSort("canonical_url"))
    },
    Some("""WITH raw AS (
              SELECT doc_id,
                     (CASE WHEN doc_id % 3 = 0 THEN 'HTTP://'
                           ELSE 'https://' END) ||
                     (CASE WHEN doc_id % 2 = 0 THEN 'WWW.' ELSE '' END) ||
                     source || '.example.com/p/' ||
                     CAST(doc_id % 50 AS VARCHAR) ||
                     (CASE WHEN doc_id % 7 = 0 THEN '/' ELSE '' END) ||
                     (CASE WHEN doc_id % 4 = 0
                           THEN '?utm_source=x&ref=y' ELSE '' END) ||
                     (CASE WHEN doc_id % 5 = 0 THEN '#sec' ELSE '' END)
                       AS url
              FROM documents),
            parsed AS (
              SELECT doc_id,
                     split_part(split_part(split_part(url, '://', 2),
                       '#', 1), '?', 1) AS host_path
              FROM raw),
            parts AS (
              SELECT doc_id,
                     lower(split_part(host_path, '/', 1)) AS host0,
                     rtrim(substr(host_path,
                       length(split_part(host_path, '/', 1)) + 1), '/')
                       AS path0
              FROM parsed),
            canon AS (
              SELECT doc_id,
                     (CASE WHEN starts_with(host0, 'www.')
                           THEN substr(host0, 5) ELSE host0 END) ||
                     (CASE WHEN path0 = '' THEN '/' ELSE path0 END)
                       AS canonical_url
              FROM parts)
            SELECT canonical_url,
                   CAST(count(*) AS BIGINT) AS n_variants,
                   CAST(min(doc_id) AS BIGINT) AS first_doc
            FROM canon GROUP BY 1 ORDER BY canonical_url"""))

  // ------------- stat_ks_test: distributed two-sample KS

  private val ksTest = Q(
    "stat_ks_test",
    "Two-sample Kolmogorov–Smirnov test (click vs purchase event " +
      "values, exact cents) with DISTRIBUTED ECDFs: per-value counts " +
      "group once, $50 value bands get running offsets over the tiny " +
      "band histogram, and within-band running sums (partitioned " +
      "windows) complete the cumulative counts — the D statistic " +
      "needs NO global-sort window at any scale. The sup gap " +
      "|F1−F2| compares via integer cross-multiplication " +
      "(|c1·n2−c2·n1|), so the argmax is exact; D ships in micros " +
      "with its location.",
    (s, d) => {
      val vals = t(s, d, "events")
        .filter(col("event_type").isin("click", "purchase"))
        .select(round(col("value") * 100, 0).cast(LongType).as("v"),
          (col("event_type") === "click").cast(LongType).as("is1"))
      val perV = vals.groupBy("v").agg(
        sum("is1").as("c1"),
        sum(lit(1L) - col("is1")).as("c2"))
        .withColumn("band", expr("v div 5000"))
      val bandW = Window.orderBy("band")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val bandHist = perV.groupBy("band")
        .agg(sum("c1").as("b1"), sum("c2").as("b2"))
        .select(col("band"),
          (sum("b1").over(bandW) - col("b1")).as("off1"),
          (sum("b2").over(bandW) - col("b2")).as("off2"))
      val inBand = Window.partitionBy("band").orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = perV.join(bandHist, "band")
        .select(col("v"),
          (sum("c1").over(inBand) + col("off1")).as("f1"),
          (sum("c2").over(inBand) + col("off2")).as("f2"))
      val n = vals.agg(sum("is1").as("n1"),
        sum(lit(1L) - col("is1")).as("n2"))
      cum.crossJoin(broadcast(n))
        .select(col("v").as("v_at"), col("n1"), col("n2"),
          abs(col("f1") * col("n2") - col("f2") * col("n1"))
            .as("d_num"))
        .orderBy(desc("d_num"), col("v_at")).limit(1)
        .select(col("v_at"), col("n1"), col("n2"), col("d_num"),
          expr("d_num * 1000000 div (n1 * n2)").as("d_micro"))
    },
    Some("""WITH vals AS (
              SELECT CAST(round(value * 100, 0) AS BIGINT) AS v,
                     CAST(event_type = 'click' AS BIGINT) AS is1
              FROM events WHERE event_type IN ('click', 'purchase')),
            per_v AS (SELECT v, CAST(sum(is1) AS BIGINT) AS c1,
                             CAST(sum(1 - is1) AS BIGINT) AS c2
                      FROM vals GROUP BY 1),
            cum AS (SELECT v,
                           CAST(sum(c1) OVER (ORDER BY v
                             ROWS BETWEEN UNBOUNDED PRECEDING AND
                             CURRENT ROW) AS BIGINT) AS f1,
                           CAST(sum(c2) OVER (ORDER BY v
                             ROWS BETWEEN UNBOUNDED PRECEDING AND
                             CURRENT ROW) AS BIGINT) AS f2
                    FROM per_v),
            n AS (SELECT CAST(sum(is1) AS BIGINT) AS n1,
                         CAST(sum(1 - is1) AS BIGINT) AS n2
                  FROM vals)
            SELECT v AS v_at, n1, n2,
                   abs(f1 * n2 - f2 * n1) AS d_num,
                   (abs(f1 * n2 - f2 * n1) * 1000000) // (n1 * n2)
                     AS d_micro
            FROM cum CROSS JOIN n
            ORDER BY d_num DESC, v_at LIMIT 1"""))

  val all: Seq[Q] = Seq(kwic, urlCanonical, ksTest)
}
