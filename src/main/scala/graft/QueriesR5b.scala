package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

import graft.engine.Engine

/** Round-5 batch 2: Dunning G² keyness, token burstiness, Jensen-Shannon
  * source drift, per-user sequence entropy rate.
  */
object QueriesR5b {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Engine.table(s, dir, name)

  private def toks(d: DataFrame): DataFrame =
    d.select(col("doc_id"), col("source"),
      explode(split(col("text"), " ")).as("tok"))
      .filter(col("tok") =!= "")

  // ------------- text_keyness_g2: corpus-comparison keyword extraction

  private val keyness = Q(
    "text_keyness_g2",
    "Dunning log-likelihood (G²) keyness — which tokens distinguish " +
      "source src0 from the rest of the corpus (the standard " +
      "corpus-linguistics keyword test; PMI overweights rare tokens, " +
      "G² doesn't): per token, observed counts in focus (ka) and " +
      "reference (kb), expected from pooled rates, " +
      "G² = 2·[ka·ln(ka/Ea) + kb·ln(kb/Eb)] with zero terms dropping " +
      "out. One token rollup (vocab-bounded at any corpus size), " +
      "totals on a broadcast 1-row frame, top 20 by G². Signed: " +
      "overused in focus ⇒ positive ka−Ea.",
    (s, d) => {
      val counts = toks(t(s, d, "documents"))
        .groupBy("tok")
        .agg(sum((col("source") === "src0").cast(LongType)).as("ka"),
          sum((col("source") =!= "src0").cast(LongType)).as("kb"))
      val totals = counts.agg(sum("ka").as("na"), sum("kb").as("nb"))
      def dd(c: String) = col(c).cast(DoubleType)
      val ea = (dd("ka") + dd("kb")) * dd("na") / (dd("na") + dd("nb"))
      val eb = (dd("ka") + dd("kb")) * dd("nb") / (dd("na") + dd("nb"))
      val g2 = lit(2.0) *
        (when(col("ka") > 0, dd("ka") * log(dd("ka") / ea)).otherwise(0.0) +
          when(col("kb") > 0, dd("kb") * log(dd("kb") / eb)).otherwise(0.0))
      counts.crossJoin(broadcast(totals))
        .select(col("tok"), col("ka"), col("kb"),
          round(g2 * 1e6, 0).cast(LongType).as("g2_micro"),
          (dd("ka") > ea).cast(LongType).as("overused"))
        .orderBy(desc("g2_micro"), col("tok"))
        .limit(20)
    },
    Some("""WITH counts AS (
              SELECT tok,
                     CAST(sum(CAST(source = 'src0' AS BIGINT)) AS BIGINT)
                       AS ka,
                     CAST(sum(CAST(source <> 'src0' AS BIGINT)) AS BIGINT)
                       AS kb
              FROM (SELECT source, unnest(string_split(text, ' ')) AS tok
                    FROM documents)
              WHERE tok <> '' GROUP BY tok),
            totals AS (SELECT sum(ka) AS na, sum(kb) AS nb FROM counts),
            g AS (
              SELECT tok, ka, kb,
                     (CAST(ka AS DOUBLE) + kb) * na / (CAST(na AS DOUBLE) + nb)
                       AS ea,
                     (CAST(ka AS DOUBLE) + kb) * nb / (CAST(na AS DOUBLE) + nb)
                       AS eb
              FROM counts, totals)
            SELECT tok, ka, kb,
                   CAST(round(2.0 * (
                     CASE WHEN ka > 0
                       THEN CAST(ka AS DOUBLE) * ln(CAST(ka AS DOUBLE) / ea)
                       ELSE 0.0 END +
                     CASE WHEN kb > 0
                       THEN CAST(kb AS DOUBLE) * ln(CAST(kb AS DOUBLE) / eb)
                       ELSE 0.0 END) * 1e6, 0) AS BIGINT) AS g2_micro,
                   CAST(CAST(ka AS DOUBLE) > ea AS BIGINT) AS overused
            FROM g ORDER BY g2_micro DESC, tok LIMIT 20"""))

  // ------------- text_burstiness: token dispersion audit

  private val burstiness = Q(
    "text_burstiness",
    "Token burstiness (Fano factor of per-document counts over the " +
      "documents that contain the token) — separates topical tokens " +
      "(bursty: absent mostly, dense where on-topic) from function " +
      "words (evenly spread), a signal content-quality filters use " +
      "that raw frequency hides. Per (doc, token) counts, then one " +
      "vocab-bounded rollup: df, total occurrences, Σc² → " +
      "Fano = var/mean over containing docs. df ≥ 20 floor, top 20 " +
      "burstiest.",
    (s, d) => {
      val perDoc = toks(t(s, d, "documents"))
        .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
      def dd(c: String) = col(c).cast(DoubleType)
      val mean = dd("occ") / dd("df")
      val variance = dd("ssq") / dd("df") - mean * mean
      perDoc.groupBy("tok")
        .agg(count(lit(1)).as("df"), sum("c").as("occ"),
          sum(col("c") * col("c")).as("ssq"))
        .filter(col("df") >= 20)
        .select(col("tok"), col("df"), col("occ"),
          round(mean * 1e6, 0).cast(LongType).as("mean_micro"),
          round(variance / mean * 1e6, 0).cast(LongType).as("fano_micro"))
        .orderBy(desc("fano_micro"), col("tok"))
        .limit(20)
    },
    Some("""WITH per_doc AS (
              SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS c
              FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                    FROM documents)
              WHERE tok <> '' GROUP BY 1, 2),
            rolled AS (
              SELECT tok, CAST(count(*) AS BIGINT) AS df,
                     CAST(sum(c) AS BIGINT) AS occ,
                     CAST(sum(c * c) AS BIGINT) AS ssq
              FROM per_doc GROUP BY tok HAVING count(*) >= 20)
            SELECT tok, df, occ,
                   CAST(round(CAST(occ AS DOUBLE) / df * 1e6, 0) AS BIGINT)
                     AS mean_micro,
                   CAST(round((CAST(ssq AS DOUBLE) / df -
                          (CAST(occ AS DOUBLE) / df) *
                          (CAST(occ AS DOUBLE) / df)) /
                          (CAST(occ AS DOUBLE) / df) * 1e6, 0) AS BIGINT)
                     AS fano_micro
            FROM rolled ORDER BY fano_micro DESC, tok LIMIT 20"""))

  // ------------- text_js_source_drift: distribution drift per source

  private val jsDrift = Q(
    "text_js_source_drift",
    "Jensen-Shannon divergence of each source's unigram distribution " +
      "vs the corpus — the symmetric, bounded drift score dashboards " +
      "want (KL explodes on unseen tokens; JS never does): per-source " +
      "token rollup densified against the corpus vocab (missing token " +
      "⇒ p=0, its P-side term is 0 but it still shifts the mixture), " +
      "JS = ½ΣP·ln(2P/(P+Q)) + ½ΣQ·ln(2Q/(P+Q)). Every ln term is " +
      "micro-rounded per (source, token) and summed as BIGINT — a " +
      "double sum over the vocab would be accumulation-order " +
      "dependent and unhashable. Grid is sources × vocab (both " +
      "bounded); two keyed rollups + one broadcast join.",
    (s, d) => {
      val tk = toks(t(s, d, "documents"))
      val bySrc = tk.groupBy("source", "tok").agg(count(lit(1)).as("c"))
      val srcTot = bySrc.groupBy("source").agg(sum("c").as("ns"))
      val byTok = bySrc.groupBy("tok").agg(sum("c").as("ct"))
      val corpTot = byTok.agg(sum("ct").as("n"))
      val grid = srcTot.crossJoin(broadcast(byTok))
        .join(bySrc, Seq("source", "tok"), "left")
        .na.fill(0L, Seq("c"))
        .crossJoin(broadcast(corpTot))
      def dd(c: String) = col(c).cast(DoubleType)
      val p = dd("c") / dd("ns")
      val q = dd("ct") / dd("n")
      val m2 = p + q // 2·mixture
      val term = when(col("c") > 0, p * log(lit(2.0) * p / m2)).otherwise(0.0) +
        q * log(lit(2.0) * q / m2)
      grid
        .select(col("source"),
          round(term * lit(5e5), 0).cast(LongType).as("half_term_micro"))
        .groupBy("source")
        .agg(sum("half_term_micro").as("js_micro"))
        .transform(graft.engine.Ops.reportSort("source"))
    },
    Some("""WITH tk AS (
              SELECT source, unnest(string_split(text, ' ')) AS tok
              FROM documents),
            by_src AS (SELECT source, tok, CAST(count(*) AS BIGINT) AS c
                       FROM tk WHERE tok <> '' GROUP BY 1, 2),
            src_tot AS (SELECT source, sum(c) AS ns FROM by_src GROUP BY 1),
            by_tok AS (SELECT tok, sum(c) AS ct FROM by_src GROUP BY 1),
            corp AS (SELECT sum(ct) AS n FROM by_tok),
            grid AS (
              SELECT st.source, bt.tok, coalesce(bs.c, 0) AS c,
                     st.ns, bt.ct, corp.n
              FROM src_tot st CROSS JOIN by_tok bt
              LEFT JOIN by_src bs
                ON bs.source = st.source AND bs.tok = bt.tok, corp),
            terms AS (
              SELECT source,
                     CAST(round((CASE WHEN c > 0
                       THEN (CAST(c AS DOUBLE) / ns) *
                            ln(2.0 * (CAST(c AS DOUBLE) / ns) /
                               (CAST(c AS DOUBLE) / ns +
                                CAST(ct AS DOUBLE) / n))
                       ELSE 0.0 END +
                       (CAST(ct AS DOUBLE) / n) *
                       ln(2.0 * (CAST(ct AS DOUBLE) / n) /
                          (CAST(c AS DOUBLE) / ns +
                           CAST(ct AS DOUBLE) / n))) * 5e5, 0) AS BIGINT)
                       AS half_term_micro
              FROM grid)
            SELECT source, CAST(sum(half_term_micro) AS BIGINT) AS js_micro
            FROM terms GROUP BY source ORDER BY source"""))

  // ------------- seq_entropy_rate: behavioral predictability score

  private val entropyRate = Q(
    "seq_entropy_rate",
    "Per-user first-order entropy rate of the event-type sequence — " +
      "the predictability score behind bot/anomaly triage (a looping " +
      "bot scores near 0 bits, organic browsing scores high): from " +
      "each user's (prev, next) transition counts, " +
      "H = Σ_prv w(prv)·H(next|prv) in bits; every p·log₂p term is " +
      "micro-rounded per transition cell and summed as BIGINT (the " +
      "determinism discipline for float sums). Work is keyed by user " +
      "throughout — one lag window, two rollups — and each user's " +
      "grid is |types|² bounded. Users with ≥ 10 transitions, top 20 " +
      "most predictable (lowest entropy).",
    (s, d) => {
      val byUser = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("ts", "event_id")
      val pairs = t(s, d, "events")
        .select(col("user_id"), col("event_id"), col("ts"),
          col("event_type").as("nxt"))
        .withColumn("prv", lag("nxt", 1).over(byUser))
        .filter(col("prv").isNotNull)
      val cells = pairs.groupBy("user_id", "prv", "nxt")
        .agg(count(lit(1)).as("c"))
      val rows = cells.groupBy("user_id", "prv").agg(sum("c").as("cr"))
      val tot = cells.groupBy("user_id").agg(sum("c").as("n"))
      def dd(c: String) = col(c).cast(DoubleType)
      // term = (c/n) · log2(cr/c)  [= w(prv)·p(nxt|prv)·(−log2 p)]
      val term = dd("c") / dd("n") * log2(dd("cr") / dd("c"))
      cells.join(rows, Seq("user_id", "prv"))
        .join(tot, "user_id")
        .select(col("user_id"), col("n"),
          round(term * 1e6, 0).cast(LongType).as("term_micro"))
        .groupBy("user_id")
        .agg(first("n").as("n_transitions"),
          sum("term_micro").as("entropy_bits_micro"))
        .filter(col("n_transitions") >= 10)
        .orderBy(col("entropy_bits_micro"), col("user_id"))
        .limit(20)
    },
    Some("""WITH seq AS (
              SELECT user_id, event_type AS nxt,
                     lag(event_type) OVER (PARTITION BY user_id
                       ORDER BY ts, event_id) AS prv
              FROM events),
            pairs AS (SELECT user_id, prv, nxt FROM seq
                      WHERE prv IS NOT NULL),
            cells AS (SELECT user_id, prv, nxt,
                             CAST(count(*) AS BIGINT) AS c
                      FROM pairs GROUP BY 1, 2, 3),
            rows_ AS (SELECT user_id, prv, sum(c) AS cr
                      FROM cells GROUP BY 1, 2),
            tot AS (SELECT user_id, sum(c) AS n FROM cells GROUP BY 1),
            terms AS (
              SELECT cells.user_id, n,
                     CAST(round(CAST(c AS DOUBLE) / n *
                            log2(CAST(cr AS DOUBLE) / c) * 1e6, 0)
                       AS BIGINT) AS term_micro
              FROM cells
              JOIN rows_ ON cells.user_id = rows_.user_id
                        AND cells.prv = rows_.prv
              JOIN tot ON cells.user_id = tot.user_id)
            SELECT user_id, CAST(min(n) AS BIGINT) AS n_transitions,
                   CAST(sum(term_micro) AS BIGINT) AS entropy_bits_micro
            FROM terms GROUP BY user_id HAVING min(n) >= 10
            ORDER BY entropy_bits_micro, user_id LIMIT 20"""))

  val all: Seq[Q] = Seq(keyness, burstiness, jsDrift, entropyRate)
}
