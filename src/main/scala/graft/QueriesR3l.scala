package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

import graft.engine.Engine

/** Round-3 batch 12: l-diversity (the privacy audit k-anonymity alone
  * can't provide), a byte-exact text-encoding/mojibake audit, and the
  * full pairwise correlation matrix from ONE aggregation pass.
  */
object QueriesR3l {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Engine.table(s, dir, name)

  // ------------- dq_l_diversity: sensitive-value diversity per QI group

  private val lDiversity = Q(
    "dq_l_diversity",
    "l-diversity audit (l=3) over the (nation, segment) quasi-identifier " +
      "with account-balance band as the SENSITIVE attribute — the " +
      "attack k-anonymity misses: a group can hold k people who all " +
      "share one sensitive value. Reports distinct-l and ENTROPY " +
      "l-diversity per group; entropy terms -(c/n)·log2(c/n) are " +
      "micro-rounded per sensitive value then summed exactly, the " +
      "repo's accumulation-order-proof float bridge. Two groupBys — " +
      "(QI, value) counts, then QI rollup; only group counts cross the " +
      "second shuffle, so the audit runs unchanged at 100 TB.",
    (s, d) => {
      val l = 3L
      val sv = t(s, d, "customer")
        .groupBy(col("c_nationkey").as("nation"),
          col("c_mktsegment").as("segment"),
          floor(col("c_acctbal") / 1000).cast(LongType).as("bal_band"))
        .agg(count(lit(1)).as("c"))
      val g = sv.groupBy("nation", "segment")
        .agg(sum("c").as("n"), count(lit(1)).as("l_distinct"))
      val ent = sv.join(g.select("nation", "segment", "n"),
          Seq("nation", "segment"))
        .select(col("nation"), col("segment"),
          round(-(col("c").cast(DoubleType) / col("n").cast(DoubleType)) *
            log2(col("c").cast(DoubleType) / col("n").cast(DoubleType)) *
            1e6, 0).cast(LongType).as("term"))
        .groupBy("nation", "segment")
        .agg(sum("term").as("entropy_micro"))
      g.join(ent, Seq("nation", "segment"))
        .select(col("nation"), col("segment"), col("n"),
          col("l_distinct"), col("entropy_micro"),
          (col("l_distinct") >= l).cast("int").as("diverse"))
        .transform(graft.engine.Ops.reportSort("nation", "segment"))
    },
    Some("""WITH sv AS (
              SELECT c_nationkey AS nation, c_mktsegment AS segment,
                     CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_band,
                     count(*) AS c
              FROM customer GROUP BY 1, 2, 3),
            g AS (SELECT nation, segment,
                         CAST(sum(c) AS BIGINT) AS n,
                         CAST(count(*) AS BIGINT) AS l_distinct
                  FROM sv GROUP BY 1, 2),
            ent AS (SELECT nation, segment,
                           CAST(sum(CAST(round(
                             -(CAST(c AS DOUBLE) / CAST(n AS DOUBLE)) *
                             log2(CAST(c AS DOUBLE) / CAST(n AS DOUBLE)) *
                             1e6, 0) AS BIGINT)) AS BIGINT)
                             AS entropy_micro
                    FROM sv JOIN g USING (nation, segment)
                    GROUP BY 1, 2)
            SELECT nation, segment, n, l_distinct, entropy_micro,
                   CAST(l_distinct >= 3 AS INT) AS diverse
            FROM g JOIN ent USING (nation, segment)
            ORDER BY nation, segment"""))

  // ------------- text_encoding_audit: byte-exact charset QA

  private val encodingAudit = Q(
    "text_encoding_audit",
    "Text-encoding audit from EXACT byte/char arithmetic — no regex " +
      "(engine regex dialects diverge; replace/length do not): UTF-8 " +
      "byte length vs codepoint count gives the multibyte overhead, " +
      "U+FFFD replacement characters (the mojibake tell) are counted " +
      "via replace-and-diff, and pure-ASCII docs are exactly those " +
      "where bytes == chars. The per-source rollup is what decides " +
      "which crawl shard needs charset repair before training. " +
      "Map-only scan + one tiny groupBy.",
    (s, d) => {
      val per = t(s, d, "documents").select(
        col("source"),
        length(col("text")).cast(LongType).as("n_chars"),
        octet_length(col("text")).cast(LongType).as("n_bytes"),
        (length(col("text")) -
          length(regexp_replace(col("text"), lit("�"), lit(""))))
          .cast(LongType).as("n_repl"))
      per.groupBy("source").agg(
          count(lit(1)).as("n_docs"),
          sum("n_chars").as("chars"),
          sum("n_bytes").as("bytes"),
          sum(col("n_bytes") - col("n_chars")).as("mb_overhead"),
          sum("n_repl").as("replacement_chars"),
          sum((col("n_bytes") === col("n_chars")).cast(LongType))
            .as("pure_ascii_docs"))
        .transform(graft.engine.Ops.reportSort("source"))
    },
    Some("""WITH per AS (
              SELECT source,
                     CAST(length(text) AS BIGINT) AS n_chars,
                     CAST(strlen(text) AS BIGINT) AS n_bytes,
                     CAST(length(text) -
                          length(replace(text, chr(65533), '')) AS BIGINT)
                       AS n_repl
              FROM documents)
            SELECT source,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(n_chars) AS BIGINT) AS chars,
                   CAST(sum(n_bytes) AS BIGINT) AS bytes,
                   CAST(sum(n_bytes - n_chars) AS BIGINT) AS mb_overhead,
                   CAST(sum(n_repl) AS BIGINT) AS replacement_chars,
                   CAST(sum(CAST(n_bytes = n_chars AS BIGINT)) AS BIGINT)
                     AS pure_ascii_docs
            FROM per GROUP BY source ORDER BY source"""))

  // ------------- stat_corr_matrix: all pairwise Pearson r, one pass

  private val corrMatrix = Q(
    "stat_corr_matrix",
    "Full pairwise Pearson correlation matrix over the four lineitem " +
      "measures (quantity, price, discount, tax) from ONE aggregation " +
      "pass: all 15 sufficient statistics (4 sums, 4 square-sums, 6 " +
      "cross-products, n) accumulate as exact integers (cents / basis " +
      "points; products as DECIMAL(38,0) so no scale overflows), then " +
      "each r = (nΣxy−ΣxΣy)/√((nΣx²−Σx²)(nΣy²−Σy²)) is one " +
      "micro-rounded double tree. The feature-screening pass a " +
      "modeling pipeline runs — 15 numbers cross the shuffle, never " +
      "rows, at any scale.",
    (s, d) => {
      val base = t(s, d, "lineitem").select(
        col("l_quantity").cast(LongType).as("qty"),
        round(col("l_extendedprice") * 100, 0).cast(LongType)
          .as("price"),
        round(col("l_discount") * 10000, 0).cast(LongType).as("disc"),
        round(col("l_tax") * 10000, 0).cast(LongType).as("tax"))
      val ms = Seq("qty", "price", "disc", "tax")
      val pairs = for {
        i <- ms.indices; j <- ms.indices if i < j
      } yield (ms(i), ms(j))
      val aggs =
        Seq(count(lit(1)).as("n")) ++
          ms.map(m => sum(m).as(s"s_$m")) ++
          ms.map(m => sum((col(m) * col(m)).cast(DecimalType(38, 0)))
            .as(s"ss_$m")) ++
          pairs.map { case (a, b) =>
            sum((col(a) * col(b)).cast(DecimalType(38, 0)))
              .as(s"sp_${a}_$b")
          }
      val agg = base.agg(aggs.head, aggs.tail: _*)
      def dd(c: String) = col(c).cast(DoubleType)
      def corr(a: String, b: String): Column =
        round((dd("n") * dd(s"sp_${a}_$b") - dd(s"s_$a") * dd(s"s_$b")) /
          sqrt((dd("n") * dd(s"ss_$a") - dd(s"s_$a") * dd(s"s_$a")) *
               (dd("n") * dd(s"ss_$b") - dd(s"s_$b") * dd(s"s_$b"))) *
          1e6, 0).cast(LongType)
      agg.select(explode(array(pairs.map { case (a, b) =>
          struct(lit(a).as("x"), lit(b).as("y"),
            corr(a, b).as("corr_micro"))
        }: _*)).as("r"))
        .select(col("r.x").as("x"), col("r.y").as("y"),
          col("r.corr_micro").as("corr_micro"))
        .transform(graft.engine.Ops.reportSort("x", "y"))
    },
    Some("""WITH base AS (
              SELECT CAST(l_quantity AS BIGINT) AS qty,
                     CAST(round(l_extendedprice * 100, 0) AS BIGINT)
                       AS price,
                     CAST(round(l_discount * 10000, 0) AS BIGINT) AS disc,
                     CAST(round(l_tax * 10000, 0) AS BIGINT) AS tax
              FROM lineitem),
            agg AS (SELECT
              CAST(count(*) AS BIGINT) AS n,
              CAST(sum(qty) AS BIGINT) AS s_qty,
              CAST(sum(price) AS BIGINT) AS s_price,
              CAST(sum(disc) AS BIGINT) AS s_disc,
              CAST(sum(tax) AS BIGINT) AS s_tax,
              sum(qty * qty) AS ss_qty,
              sum(price * price) AS ss_price,
              sum(disc * disc) AS ss_disc,
              sum(tax * tax) AS ss_tax,
              sum(qty * price) AS sp_qty_price,
              sum(qty * disc) AS sp_qty_disc,
              sum(qty * tax) AS sp_qty_tax,
              sum(price * disc) AS sp_price_disc,
              sum(price * tax) AS sp_price_tax,
              sum(disc * tax) AS sp_disc_tax
              FROM base),
            pairs AS (
              SELECT 'qty' AS x, 'price' AS y,
                     CAST(round((CAST(n AS DOUBLE) * CAST(sp_qty_price AS DOUBLE) - CAST(s_qty AS DOUBLE) * CAST(s_price AS DOUBLE)) /
                       sqrt((CAST(n AS DOUBLE) * CAST(ss_qty AS DOUBLE) - CAST(s_qty AS DOUBLE) * CAST(s_qty AS DOUBLE)) *
                            (CAST(n AS DOUBLE) * CAST(ss_price AS DOUBLE) - CAST(s_price AS DOUBLE) * CAST(s_price AS DOUBLE))) * 1e6, 0) AS BIGINT) AS corr_micro
              FROM agg
              UNION ALL
              SELECT 'qty', 'disc',
                     CAST(round((CAST(n AS DOUBLE) * CAST(sp_qty_disc AS DOUBLE) - CAST(s_qty AS DOUBLE) * CAST(s_disc AS DOUBLE)) /
                       sqrt((CAST(n AS DOUBLE) * CAST(ss_qty AS DOUBLE) - CAST(s_qty AS DOUBLE) * CAST(s_qty AS DOUBLE)) *
                            (CAST(n AS DOUBLE) * CAST(ss_disc AS DOUBLE) - CAST(s_disc AS DOUBLE) * CAST(s_disc AS DOUBLE))) * 1e6, 0) AS BIGINT)
              FROM agg
              UNION ALL
              SELECT 'qty', 'tax',
                     CAST(round((CAST(n AS DOUBLE) * CAST(sp_qty_tax AS DOUBLE) - CAST(s_qty AS DOUBLE) * CAST(s_tax AS DOUBLE)) /
                       sqrt((CAST(n AS DOUBLE) * CAST(ss_qty AS DOUBLE) - CAST(s_qty AS DOUBLE) * CAST(s_qty AS DOUBLE)) *
                            (CAST(n AS DOUBLE) * CAST(ss_tax AS DOUBLE) - CAST(s_tax AS DOUBLE) * CAST(s_tax AS DOUBLE))) * 1e6, 0) AS BIGINT)
              FROM agg
              UNION ALL
              SELECT 'price', 'disc',
                     CAST(round((CAST(n AS DOUBLE) * CAST(sp_price_disc AS DOUBLE) - CAST(s_price AS DOUBLE) * CAST(s_disc AS DOUBLE)) /
                       sqrt((CAST(n AS DOUBLE) * CAST(ss_price AS DOUBLE) - CAST(s_price AS DOUBLE) * CAST(s_price AS DOUBLE)) *
                            (CAST(n AS DOUBLE) * CAST(ss_disc AS DOUBLE) - CAST(s_disc AS DOUBLE) * CAST(s_disc AS DOUBLE))) * 1e6, 0) AS BIGINT)
              FROM agg
              UNION ALL
              SELECT 'price', 'tax',
                     CAST(round((CAST(n AS DOUBLE) * CAST(sp_price_tax AS DOUBLE) - CAST(s_price AS DOUBLE) * CAST(s_tax AS DOUBLE)) /
                       sqrt((CAST(n AS DOUBLE) * CAST(ss_price AS DOUBLE) - CAST(s_price AS DOUBLE) * CAST(s_price AS DOUBLE)) *
                            (CAST(n AS DOUBLE) * CAST(ss_tax AS DOUBLE) - CAST(s_tax AS DOUBLE) * CAST(s_tax AS DOUBLE))) * 1e6, 0) AS BIGINT)
              FROM agg
              UNION ALL
              SELECT 'disc', 'tax',
                     CAST(round((CAST(n AS DOUBLE) * CAST(sp_disc_tax AS DOUBLE) - CAST(s_disc AS DOUBLE) * CAST(s_tax AS DOUBLE)) /
                       sqrt((CAST(n AS DOUBLE) * CAST(ss_disc AS DOUBLE) - CAST(s_disc AS DOUBLE) * CAST(s_disc AS DOUBLE)) *
                            (CAST(n AS DOUBLE) * CAST(ss_tax AS DOUBLE) - CAST(s_tax AS DOUBLE) * CAST(s_tax AS DOUBLE))) * 1e6, 0) AS BIGINT)
              FROM agg)
            SELECT x, y, corr_micro FROM pairs ORDER BY x, y"""))

  val all: Seq[Q] = Seq(lDiversity, encodingAudit, corrMatrix)
}
