package graft

import graft.engine.Ck.Ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.{DoubleType, LongType}

import graft.engine.Engine
import graft.operators.Similarity

/** Round-5 batch 5: corpus saturation curve, capture-recapture corpus
  * estimation, kNN-graph symmetry audit, A/B sample-size planning.
  */
object QueriesR5g {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Engine.table(s, dir, name)

  // ------- text_ngram_saturation: is more data still adding diversity?

  private val ngramSaturation = Q(
    "text_ngram_saturation",
    "Corpus saturation curve: new distinct word-3-grams contributed per " +
      "doc-id decile — the 'is the next batch of data still adding " +
      "diversity' read a curator takes before paying for more crawl. " +
      "Each 3-gram is credited to its FIRST document (min doc_id — one " +
      "keyed agg over the exploded shingles, no ordering pass), first " +
      "docs bucket into deciles, and the cumulative share rides a " +
      "window over the 10-row decile rollup. The explode is map-side " +
      "(shuffle carries distinct shingles after partial agg); decile " +
      "edges are integer arithmetic over the known id span.",
    (s, d) => {
      val docs = t(s, d, "documents")
      val span = docs.agg(min("doc_id").as("lo"), max("doc_id").as("hi"))
      val grams = docs
        .select(col("doc_id"), split(col("text"), " ").as("tk"))
        .select(col("doc_id"), explode(expr(
          "transform(sequence(0, size(tk) - 3), " +
            "i -> concat_ws(' ', tk[i], tk[i+1], tk[i+2]))")).as("g"))
      val firstDoc = grams.groupBy("g").agg(min("doc_id").as("fd"))
      val perDecile = firstDoc.crossJoin(broadcast(span))
        .select(expr("least(9, ((fd - lo) * 10) div (hi - lo + 1))")
          .as("decile"))
        .groupBy("decile").agg(count(lit(1)).as("new_grams"))
      def dd(c: String) = col(c).cast(DoubleType)
      val wAll = Window.partitionBy(lit(1))
      val wCum = Window.partitionBy(lit(1)).orderBy("decile")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      perDecile
        .withColumn("total", sum("new_grams").over(wAll))
        .withColumn("cum_grams", sum("new_grams").over(wCum))
        .select(col("decile"), col("new_grams"), col("cum_grams"),
          round(dd("cum_grams") / dd("total") * 1e6, 0).cast(LongType)
            .as("cum_share_micro"))
        .transform(graft.engine.Ops.reportSort("decile"))
    },
    Some("""WITH span AS (
              SELECT min(doc_id) AS lo, max(doc_id) AS hi FROM documents),
            grams AS (
              SELECT doc_id,
                     unnest(list_transform(range(0, len(tk) - 2),
                       i -> tk[i+1] || ' ' || tk[i+2] || ' ' || tk[i+3]))
                       AS g
              FROM (SELECT doc_id, string_split(text, ' ') AS tk
                    FROM documents)
              WHERE len(tk) >= 3),
            fd AS (SELECT g, min(doc_id) AS fd FROM grams GROUP BY 1),
            dec AS (
              SELECT least(9, ((fd - lo) * 10) // (hi - lo + 1)) AS decile,
                     CAST(count(*) AS BIGINT) AS new_grams
              FROM fd, span GROUP BY 1),
            c AS (
              SELECT decile, new_grams,
                     CAST(sum(new_grams) OVER (ORDER BY decile) AS BIGINT)
                       AS cum_grams,
                     CAST(sum(new_grams) OVER () AS BIGINT) AS total
              FROM dec)
            SELECT decile, new_grams, cum_grams,
                   CAST(round(CAST(cum_grams AS DOUBLE) / total * 1e6, 0)
                     AS BIGINT) AS cum_share_micro
            FROM c ORDER BY decile"""))

  // ------- curate_capture_recapture: how big is the TRUE corpus?

  private val captureRecapture = Q(
    "curate_capture_recapture",
    "Capture-recapture (Lincoln-Petersen) estimate of the underlying " +
      "content universe from per-source fingerprint overlap: treating " +
      "two sources as independent 'captures' of the same population, " +
      "N̂ = n₁·n₂/m (m = shared fingerprints) with the Chapman " +
      "correction — the standard answer to 'how much content exists " +
      "that NONE of our crawls saw'. One fingerprint rollup bounds " +
      "everything by distinct (fp, source); the source-pair grid is " +
      "sources², never docs².",
    (s, d) => {
      // checkpointed: the fingerprint frame feeds the per-source rollup
      // AND both sides of the overlap self-join — without it the md5-
      // over-sorted-vocab scan runs 3×
      val fps = t(s, d, "documents")
        .select(col("source"),
          md5(concat_ws(" ",
            array_sort(array_distinct(split(col("text"), " ")))))
            .as("fp"))
        .distinct()
        .ckpt(true)
      val perSrc = fps.groupBy("source").agg(count(lit(1)).as("n"))
      val shared = fps.as("x").join(fps.as("y"),
          col("x.fp") === col("y.fp") && col("x.source") < col("y.source"))
        .groupBy(col("x.source").as("src_a"), col("y.source").as("src_b"))
        .agg(count(lit(1)).as("m"))
      def dd(c: String) = col(c).cast(DoubleType)
      shared
        .join(perSrc.select(col("source").as("src_a"), col("n").as("n_a")),
          "src_a")
        .join(perSrc.select(col("source").as("src_b"), col("n").as("n_b")),
          "src_b")
        .select(col("src_a"), col("src_b"), col("n_a"), col("n_b"), col("m"),
          // Chapman: N̂ = (n1+1)(n2+1)/(m+1) − 1 — finite even at m=0
          round((dd("n_a") + 1) * (dd("n_b") + 1) / (dd("m") + 1) - 1, 0)
            .cast(LongType).as("n_hat"),
          round(dd("m") * 1e6 / least(dd("n_a"), dd("n_b")), 0)
            .cast(LongType).as("overlap_micro"))
        .transform(graft.engine.Ops.reportSort("src_a", "src_b"))
    },
    Some("""WITH fps AS (
              SELECT DISTINCT source,
                     md5(array_to_string(list_sort(list_distinct(
                       string_split(text, ' '))), ' ')) AS fp
              FROM documents),
            per_src AS (
              SELECT source, CAST(count(*) AS BIGINT) AS n
              FROM fps GROUP BY 1),
            shared AS (
              SELECT x.source AS src_a, y.source AS src_b,
                     CAST(count(*) AS BIGINT) AS m
              FROM fps x JOIN fps y
                ON x.fp = y.fp AND x.source < y.source
              GROUP BY 1, 2)
            SELECT src_a, src_b, a.n AS n_a, b.n AS n_b, m,
                   CAST(round((CAST(a.n AS DOUBLE) + 1) *
                              (CAST(b.n AS DOUBLE) + 1) /
                              (CAST(m AS DOUBLE) + 1) - 1, 0) AS BIGINT)
                     AS n_hat,
                   CAST(round(CAST(m AS DOUBLE) * 1e6 /
                       least(CAST(a.n AS DOUBLE), CAST(b.n AS DOUBLE)), 0)
                     AS BIGINT) AS overlap_micro
            FROM shared
            JOIN per_src a ON shared.src_a = a.source
            JOIN per_src b ON shared.src_b = b.source
            ORDER BY src_a, src_b"""))

  // ------- sim_knn_symmetry: mutual-neighbor rate of the kNN graph

  private val knnSymmetry = Q(
    "sim_knn_symmetry",
    "kNN-graph symmetry audit over a 64-probe panel: the fraction of " +
      "k-nearest-neighbor edges that are MUTUAL (i ∈ kNN(j) when " +
      "j ∈ kNN(i)) — low symmetry flags hubness/anisotropy that " +
      "degrades ANN recall and graph-based methods (HNSW, diffusion " +
      "labels). The panel's kNN lists come from one panel×panel score " +
      "(bounded |panel|², the standard audit-on-a-sample shape at " +
      "scale); mutuality is a self-join on reversed edges; the rate " +
      "rolls up per k ∈ {1,3,5,10} from one ranked frame.",
    (s, d) => {
      def emb() = t(s, d, "embeddings")
        .filter(col("vec_id") % 31 === 0)
        .select(col("vec_id").as("id"),
          Similarity.quantize(Similarity.toDoubleVec(col("embedding")))
            .as("vec"))
      def dotC(x: Column, y: Column) = Similarity.dotComposed(x, y)
      def cosC(x: Column, y: Column) =
        dotC(x, y) / (sqrt(dotC(x, x)) * sqrt(dotC(y, y)))
      val wNn = Window.partitionBy("i").orderBy(desc("cos"), col("j"))
      val ranked = emb().as("x")
        .join(emb().select(col("id").as("jid"), col("vec").as("jv")),
          col("id") =!= col("jid"))
        .select(col("id").as("i"), col("jid").as("j"),
          round(cosC(col("vec"), col("jv")), 6).as("cos"))
        .withColumn("rk", row_number().over(wNn))
        .filter(col("rk") <= 10)
        .ckpt()
      val ks = ranked
        .select(col("i"), col("j"), col("rk"),
          explode(array(lit(1), lit(3), lit(5), lit(10))).as("k"))
        .filter(col("rk") <= col("k"))
      val mutual = ks.as("f").join(
          ks.select(col("k").as("k2"), col("i").as("j"), col("j").as("i")),
          Seq("i", "j"))
        .filter(col("k") === col("k2"))
        .groupBy("k").agg(count(lit(1)).as("n_mutual"))
      def dd(c: String) = col(c).cast(DoubleType)
      ks.groupBy("k").agg(count(lit(1)).as("n_edges"))
        .join(mutual, Seq("k"), "left").na.fill(0L, Seq("n_mutual"))
        .select(col("k").cast(LongType).as("k"), col("n_edges"),
          col("n_mutual"),
          round(dd("n_mutual") / dd("n_edges") * 1e6, 0).cast(LongType)
            .as("symmetry_micro"))
        .transform(graft.engine.Ops.reportSort("k"))
    },
    Some("""WITH e AS (
              SELECT vec_id AS id,
                     list_transform(embedding::DOUBLE[],
                       x -> round(x * 1048576)) AS v
              FROM embeddings WHERE vec_id % 31 = 0),
            ranked AS (
              SELECT i, j, rk FROM (
                SELECT x.id AS i, y.id AS j,
                       row_number() OVER (PARTITION BY x.id ORDER BY
                         round(list_dot_product(x.v, y.v) /
                               (sqrt(list_dot_product(x.v, x.v)) *
                                sqrt(list_dot_product(y.v, y.v))), 6)
                           DESC, y.id) AS rk
                FROM e x JOIN e y ON x.id <> y.id)
              WHERE rk <= 10),
            ks AS (
              SELECT i, j, k
              FROM ranked
              CROSS JOIN (SELECT unnest([1, 3, 5, 10]) AS k)
              WHERE rk <= k),
            mutual AS (
              SELECT f.k, CAST(count(*) AS BIGINT) AS n_mutual
              FROM ks f JOIN ks r
                ON f.i = r.j AND f.j = r.i AND f.k = r.k
              GROUP BY 1),
            edges AS (
              SELECT k, CAST(count(*) AS BIGINT) AS n_edges
              FROM ks GROUP BY 1)
            SELECT CAST(edges.k AS BIGINT) AS k, n_edges,
                   coalesce(n_mutual, 0) AS n_mutual,
                   CAST(round(CAST(coalesce(n_mutual, 0) AS DOUBLE) /
                       n_edges * 1e6, 0) AS BIGINT) AS symmetry_micro
            FROM edges LEFT JOIN mutual ON edges.k = mutual.k
            ORDER BY k"""))

  // ------- stat_sample_size: A/B test power planning from group stats

  private val sampleSize = Q(
    "stat_sample_size",
    "A/B sample-size planning per event type: from each type's observed " +
      "variance, the n-per-arm needed to detect a 1%/2%/5% lift of the " +
      "mean at α=0.05, power 80% — n = 2(z_α/2+z_β)²σ²/δ² with the " +
      "fixed z constants inlined (no erf dependency on either engine). " +
      "Variance comes from exact integer sum/sum-of-squares (cents), so " +
      "the plan numbers are engine-stable; one keyed agg total.",
    (s, d) => {
      val base = t(s, d, "events")
        .select(col("event_type").as("g"),
          round(col("value") * 100, 0).cast(LongType).as("c"))
      val agg = base.groupBy("g").agg(count(lit(1)).as("n"),
        sum("c").as("s1"), sum(col("c") * col("c")).as("s2"))
      def dd(c: String) = col(c).cast(DoubleType)
      val mu = dd("s1") / dd("n")
      val varC = dd("s2") / dd("n") - mu * mu
      // (z_0.025 + z_0.2)² = (1.959964 + 0.841621)² — inlined constant
      val zz = lit((1.959964 + 0.841621) * (1.959964 + 0.841621))
      def nFor(liftPct: Int) = {
        val delta = mu * liftPct / 100.0
        ceil(lit(2.0) * zz * varC / (delta * delta)).cast(LongType)
      }
      agg.select(col("g"), col("n"),
          round(mu, 0).cast(LongType).as("mean_cents"),
          round(sqrt(varC), 0).cast(LongType).as("sd_cents"),
          nFor(1).as("n_for_1pct"), nFor(2).as("n_for_2pct"),
          nFor(5).as("n_for_5pct"))
        .transform(graft.engine.Ops.reportSort("g"))
    },
    Some("""WITH base AS (
              SELECT event_type AS g,
                     CAST(round(value * 100, 0) AS BIGINT) AS c
              FROM events),
            agg AS (
              SELECT g, CAST(count(*) AS BIGINT) AS n,
                     CAST(sum(c) AS BIGINT) AS s1,
                     CAST(sum(c * c) AS BIGINT) AS s2
              FROM base GROUP BY 1),
            m AS (
              SELECT g, n,
                     CAST(s1 AS DOUBLE) / n AS mu,
                     CAST(s2 AS DOUBLE) / n -
                       (CAST(s1 AS DOUBLE) / n) *
                       (CAST(s1 AS DOUBLE) / n) AS v
              FROM agg)
            SELECT g, n,
                   CAST(round(mu, 0) AS BIGINT) AS mean_cents,
                   CAST(round(sqrt(v), 0) AS BIGINT) AS sd_cents,
                   CAST(ceil(2.0 * (1.959964 + 0.841621) *
                        (1.959964 + 0.841621) * v /
                        ((mu * 1 / 100.0) * (mu * 1 / 100.0)))
                     AS BIGINT) AS n_for_1pct,
                   CAST(ceil(2.0 * (1.959964 + 0.841621) *
                        (1.959964 + 0.841621) * v /
                        ((mu * 2 / 100.0) * (mu * 2 / 100.0)))
                     AS BIGINT) AS n_for_2pct,
                   CAST(ceil(2.0 * (1.959964 + 0.841621) *
                        (1.959964 + 0.841621) * v /
                        ((mu * 5 / 100.0) * (mu * 5 / 100.0)))
                     AS BIGINT) AS n_for_5pct
            FROM m ORDER BY g"""))

  val all: Seq[Q] =
    Seq(ngramSaturation, captureRecapture, knnSymmetry, sampleSize)
}
