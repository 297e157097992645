package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.{DoubleType, LongType}

import graft.engine.Engine

/** Round-4 batch 8: learning-curve evaluation over nested hash subsets,
  * vocabulary coverage curve.
  */
object QueriesR4u {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Engine.table(s, dir, name)

  // ------------- ml_learning_curve: closed-form model vs train size

  private val learningCurve = Q(
    "ml_learning_curve",
    "Learning curve for a closed-form model — does more data still " +
      "help? Simple linear regression of order value on customer " +
      "balance, trained on NESTED 25/50/75/100% subsets (content-" +
      "stable hash thresholds, so each train set contains the smaller " +
      "ones — the property that makes curve points comparable) and " +
      "scored by R² on the FULL population. All four fits come out of " +
      "ONE pass: every sufficient statistic (n, Σx, Σy, Σxx, Σyy, " +
      "Σxy) aggregates under per-fraction masks, and the fit/score " +
      "algebra is scalar math on the 4-row rollup. The flat tail of " +
      "this curve is the 'more data won't fix this model' signal.",
    (s, d) => {
      val base = t(s, d, "orders")
        .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey").as("k"),
          col("c_acctbal").as("x"), col("o_totalprice").as("y"))
        .withColumn("hv", graft.operators.Dedup.tokenId(
          concat(lit("lc:"), col("k").cast("string"))) % 100L)
      val fracs = Seq(25L, 50L, 75L, 100L)
      val masked = base.select(
        explode(typedlit(fracs)).as("pct"),
        col("hv"), col("x"), col("y"))
        .filter(col("hv") < col("pct"))
      val stats = masked.groupBy("pct")
        .agg(count(lit(1)).cast(DoubleType).as("n"),
          sum("x").as("sx"), sum("y").as("sy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("y") * col("y")).as("syy"),
          sum(col("x") * col("y")).as("sxy"))
      val full = stats.filter(col("pct") === 100L)
        .select(col("n").as("fn"), col("sx").as("fsx"),
          col("sy").as("fsy"), col("sxx").as("fsxx"),
          col("syy").as("fsyy"), col("sxy").as("fsxy"))
      stats.crossJoin(broadcast(full))
        .withColumn("slope",
          (col("n") * col("sxy") - col("sx") * col("sy")) /
            (col("n") * col("sxx") - col("sx") * col("sx")))
        .withColumn("icept",
          (col("sy") - col("slope") * col("sx")) / col("n"))
        // residual sum over the FULL population from its sufficient stats:
        // SSE = Σ(y - a - b·x)² expanded in moments
        .withColumn("sse",
          col("fsyy") + col("fn") * col("icept") * col("icept") +
            col("slope") * col("slope") * col("fsxx") -
            lit(2.0) * col("icept") * col("fsy") -
            lit(2.0) * col("slope") * col("fsxy") +
            lit(2.0) * col("slope") * col("icept") * col("fsx"))
        .withColumn("sst",
          col("fsyy") - col("fsy") * col("fsy") / col("fn"))
        .select(col("pct"), col("n").cast(LongType).as("n_train"),
          round(col("slope"), 6).as("slope"),
          round(col("icept"), 4).as("intercept"),
          round(lit(1.0) - col("sse") / col("sst"), 6).as("r2_full"))
        .transform(graft.engine.Ops.reportSort("pct"))
    },
    Some("""WITH base AS (
              SELECT o_orderkey AS k, c_acctbal AS x, o_totalprice AS y,
                     ('0x' || substr(md5('lc:' ||
                        CAST(o_orderkey AS VARCHAR)), 1, 8))::BIGINT % 100
                       AS hv
              FROM orders JOIN customer ON o_custkey = c_custkey),
            masked AS (
              SELECT pct, x, y
              FROM base, (SELECT unnest([25, 50, 75, 100]) AS pct)
              WHERE hv < pct),
            stats AS (
              SELECT pct, CAST(count(*) AS DOUBLE) AS n,
                     sum(x) AS sx, sum(y) AS sy, sum(x * x) AS sxx,
                     sum(y * y) AS syy, sum(x * y) AS sxy
              FROM masked GROUP BY pct),
            fullstats AS (
              SELECT n AS fn, sx AS fsx, sy AS fsy, sxx AS fsxx,
                     syy AS fsyy, sxy AS fsxy
              FROM stats WHERE pct = 100),
            fit AS (
              SELECT pct, n,
                     (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope,
                     (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx)
                       / n AS icept,
                     fn, fsx, fsy, fsxx, fsyy, fsxy
              FROM stats, fullstats)
            SELECT pct, CAST(n AS BIGINT) AS n_train,
                   round(slope, 6) AS slope,
                   round(icept, 4) AS intercept,
                   round(1.0 - (fsyy + fn * icept * icept +
                                slope * slope * fsxx -
                                2.0 * icept * fsy - 2.0 * slope * fsxy +
                                2.0 * slope * icept * fsx) /
                         (fsyy - fsy * fsy / fn), 6) AS r2_full
            FROM fit ORDER BY pct"""))

  // ------------- text_coverage_curve: top-k vocabulary coverage

  private val coverage = Q(
    "text_coverage_curve",
    "Vocabulary coverage curve — what share of all token OCCURRENCES " +
      "the top-k most frequent types cover, at k ∈ {3, 5, 10, 20, 30} " +
      "(the fixture vocabulary is a closed 31-type set; real corpora " +
      "use k in the thousands, same plan): decides tokenizer vocab and " +
      "OOV-handling budgets (Zipf says the head covers most of the " +
      "mass; this measures exactly how much). Token counts are one " +
      "hash groupBy; the global rank and running sum decompose over " +
      "log2-count bands (totally ordered, ≤64-row broadcast rollup + " +
      "parallel within-band windows), so the ranking never serializes " +
      "however large the open vocabulary grows. " +
      "Joint twin of text_zipf_fit/text_heavy_hitters.",
    (s, d) => {
      val cnt = t(s, d, "documents")
        .select(explode(split(col("text"), " ")).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("c"))
        // two-level global rank: log2-count BANDS are totally ordered
        // (every count in band b+1 exceeds every count in band b), so
        // global rank = higher-band row offset + within-band rank, and
        // the global running occurrence sum decomposes the same way —
        // the ≤64-row band rollup broadcasts, within-band windows stay
        // parallel however large the vocabulary grows
        .withColumn("band", floor(log2(col("c"))).cast(LongType))
      val offs = cnt.groupBy("band")
        .agg(count(lit(1)).as("nb"), sum("c").as("sc"))
        .withColumn("off", coalesce(sum("nb").over(
          Window.orderBy(desc("band"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .withColumn("coff", coalesce(sum("sc").over(
          Window.orderBy(desc("band"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .select("band", "off", "coff")
      val tot = cnt.agg(sum("c").as("total"))
      val wIn = Window.partitionBy("band").orderBy(desc("c"), col("tok"))
      val ranked = cnt.join(broadcast(offs), "band")
        .withColumn("rk",
          (col("off") + row_number().over(wIn)).cast(LongType))
        .withColumn("cum", col("coff") + sum("c").over(
          wIn.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val ks = Seq(3L, 5L, 10L, 20L, 30L)
      ranked.filter(col("rk").isin(ks: _*))
        .crossJoin(broadcast(tot))
        .select(col("rk").as("k"), col("cum").cast(LongType).as("cum_occurrences"),
          round(col("cum").cast(DoubleType) / col("total"), 6)
            .as("coverage"))
        .transform(graft.engine.Ops.reportSort("k"))
    },
    Some("""WITH cnt AS (
              SELECT tok, count(*) AS c
              FROM (SELECT unnest(string_split(text, ' ')) AS tok
                    FROM documents)
              GROUP BY tok),
            ranked AS (
              SELECT tok, c,
                     CAST(row_number() OVER (ORDER BY c DESC, tok)
                       AS BIGINT) AS rk,
                     sum(c) OVER (ORDER BY c DESC, tok
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS cum
              FROM cnt)
            SELECT rk AS k, CAST(cum AS BIGINT) AS cum_occurrences,
                   round(CAST(cum AS DOUBLE) /
                         (SELECT sum(c) FROM cnt), 6) AS coverage
            FROM ranked
            WHERE rk IN (3, 5, 10, 20, 30)
            ORDER BY k"""))

  val all: Seq[Q] = Seq(learningCurve, coverage)
}
