package graft

import graft.engine.Ck.Ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

import graft.engine.Engine

/** Round-5 batch 17: exact Shapley attribution, cross-language
  * vocabulary overlap.
  */
object QueriesR5s {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Engine.table(s, dir, name)

  // ------- seq_shapley_attribution: exact coalition-value credit

  private val shapley = Q(
    "seq_shapley_attribution",
    "EXACT Shapley-value channel attribution — the game-theoretic " +
      "answer to 'which touchpoint deserves the conversion credit' " +
      "that last-touch (w16) provably distorts: users' touched-channel " +
      "sets {view, click, signup} form 8 coalitions, v(S) = purchase " +
      "rate of users exposed to exactly S, and each channel's φ sums " +
      "the weighted marginal contributions v(S∪c)−v(S) with the exact " +
      "3-player weights (1/3, 1/6, 1/6, 1/3). Exact Shapley is " +
      "EXPONENTIAL in channels — tractable precisely because the " +
      "coalition rollup is 2³ rows regardless of corpus size; the user " +
      "bitmask aggregation is the only at-scale pass. Missing " +
      "coalitions contribute v=0 (deterministic convention, surfaced " +
      "in the n_exposed column).",
    (s, d) => {
      val mask = t(s, d, "events")
        .groupBy("user_id")
        .agg((max(when(col("event_type") === "view", 1L))
          .isNotNull.cast(LongType) * 1 +
          max(when(col("event_type") === "click", 1L))
            .isNotNull.cast(LongType) * 2 +
          max(when(col("event_type") === "signup", 1L))
            .isNotNull.cast(LongType) * 4).as("m"),
          max(when(col("event_type") === "purchase", 1L))
            .isNotNull.cast(LongType).as("conv"))
      val v = mask.groupBy("m")
        .agg(count(lit(1)).as("n_users"), sum("conv").as("n_conv"))
        .select(col("m"), col("n_users"),
          (col("n_conv").cast(DoubleType) /
            col("n_users").cast(DoubleType)).as("v"))
        .ckpt(true)
      // all 12 (channel, base-coalition) marginal terms. Weights ship as
      // integer SIXTHS (1/3 = 2/6): each term micro-rounds BEFORE the
      // per-channel sum, so the sum is exact BIGINT arithmetic — a
      // 4-term double sum is accumulation-order-dependent across
      // engines, the rag hazard class (the repo's
      // micro-rounded-terms-then-integer-sum discipline)
      import s.implicits._
      val terms = Seq(
        // channel bit 1 = view
        (1L, 0L, 2L), (1L, 2L, 1L), (1L, 4L, 1L), (1L, 6L, 2L),
        // channel bit 2 = click
        (2L, 0L, 2L), (2L, 1L, 1L), (2L, 4L, 1L), (2L, 5L, 2L),
        // channel bit 4 = signup
        (4L, 0L, 2L), (4L, 1L, 1L), (4L, 2L, 1L), (4L, 3L, 2L))
        .toDF("bit", "base", "w6")
      val scored = terms
        .join(v.select(col("m").as("mw"), col("v").as("v_with")),
          col("base") + col("bit") === col("mw"), "left")
        .join(v.select(col("m").as("mo"), col("v").as("v_without")),
          col("base") === col("mo"), "left")
        .select(col("bit"),
          round(col("w6").cast(DoubleType) *
            (coalesce(col("v_with"), lit(0.0)) -
              coalesce(col("v_without"), lit(0.0))) * 1e6, 0)
            .cast(LongType).as("term6_micro"))
        .groupBy("bit").agg(sum("term6_micro").as("phi6_micro"))
      val exposure = v
        .select(explode(expr(
          "filter(array(1L, 2L, 4L), b -> (m div b) % 2 = 1)"))
          .as("bit"), col("n_users"))
        .groupBy("bit").agg(sum("n_users").as("n_exposed"))
      scored.join(exposure, Seq("bit"), "left")
        .na.fill(0L, Seq("n_exposed"))
        .select(
          when(col("bit") === 1, "view").when(col("bit") === 2, "click")
            .otherwise("signup").as("channel"),
          col("n_exposed"),
          // one division of the exact integer sum by 6.0 — bit-identical
          round(col("phi6_micro").cast(DoubleType) / 6.0, 0)
            .cast(LongType).as("shapley_micro"))
        .transform(graft.engine.Ops.reportSort("channel"))
    },
    Some("""WITH mask AS (
              SELECT user_id,
                     CAST(max(event_type = 'view') AS BIGINT) * 1 +
                     CAST(max(event_type = 'click') AS BIGINT) * 2 +
                     CAST(max(event_type = 'signup') AS BIGINT) * 4
                       AS m,
                     CAST(max(event_type = 'purchase') AS BIGINT)
                       AS conv
              FROM events GROUP BY 1),
            v AS (
              SELECT m, CAST(count(*) AS BIGINT) AS n_users,
                     CAST(sum(conv) AS DOUBLE) / count(*) AS v
              FROM mask GROUP BY 1),
            terms AS (
              SELECT * FROM (VALUES
                (1, 0, 2), (1, 2, 1), (1, 4, 1), (1, 6, 2),
                (2, 0, 2), (2, 1, 1), (2, 4, 1), (2, 5, 2),
                (4, 0, 2), (4, 1, 1), (4, 2, 1), (4, 3, 2))
                AS t(bit, base, w6)),
            scored AS (
              SELECT bit,
                     CAST(sum(CAST(round(CAST(w6 AS DOUBLE) *
                       (coalesce(vw.v, 0.0) - coalesce(vo.v, 0.0)) *
                       1e6, 0) AS BIGINT)) AS BIGINT) AS phi6_micro
              FROM terms
              LEFT JOIN v vw ON terms.base + terms.bit = vw.m
              LEFT JOIN v vo ON terms.base = vo.m
              GROUP BY 1),
            exposure AS (
              SELECT bit, CAST(sum(n_users) AS BIGINT) AS n_exposed
              FROM v
              CROSS JOIN (SELECT unnest([1, 2, 4]) AS bit)
              WHERE (m // bit) % 2 = 1
              GROUP BY 1)
            SELECT CASE WHEN scored.bit = 1 THEN 'view'
                        WHEN scored.bit = 2 THEN 'click'
                        ELSE 'signup' END AS channel,
                   coalesce(n_exposed, 0) AS n_exposed,
                   CAST(round(CAST(phi6_micro AS DOUBLE) / 6.0, 0)
                     AS BIGINT) AS shapley_micro
            FROM scored LEFT JOIN exposure ON scored.bit = exposure.bit
            ORDER BY channel"""))

  // ------- text_lang_vocab_overlap: cross-language vocabulary matrix

  private val langOverlap = Q(
    "text_lang_vocab_overlap",
    "Cross-language vocabulary overlap matrix — how much surface form " +
      "two languages share (loanwords, code-switching leakage, " +
      "mislabeled docs): per language distinct-token sets, pairwise " +
      "Jaccard via an inverted token→language join (token-keyed — " +
      "never a vocab×vocab product; the language-pair fan-out is " +
      "bounded by #langs²), union sizes by inclusion-exclusion from " +
      "the per-language vocab counts. High overlap off the diagonal " +
      "is text_langid's confusion source — this is the corpus-side " +
      "explanation.",
    (s, d) => {
      val vocab = t(s, d, "documents")
        .select(col("lang"), explode(array_distinct(split(col("text"),
          " "))).as("tok"))
        .distinct()
        .ckpt(true)
      val sizes = vocab.groupBy("lang").agg(count(lit(1)).as("vs"))
      val shared = vocab.as("x").join(
          vocab.select(col("lang").as("lang_b"), col("tok")).as("y"),
          Seq("tok"))
        .filter(col("lang") < col("lang_b"))
        .groupBy(col("lang").as("lang_a"), col("lang_b"))
        .agg(count(lit(1)).as("shared"))
      def dd(c: String) = col(c).cast(DoubleType)
      shared
        .join(broadcast(sizes.select(col("lang").as("lang_a"),
          col("vs").as("va"))), "lang_a")
        .join(broadcast(sizes.select(col("lang").as("lang_b"),
          col("vs").as("vb"))), "lang_b")
        .select(col("lang_a"), col("lang_b"), col("va"), col("vb"),
          col("shared"),
          round(dd("shared") * 1e6 /
            (dd("va") + dd("vb") - dd("shared")), 0).cast(LongType)
            .as("jaccard_micro"))
        .transform(graft.engine.Ops.reportSort("lang_a", "lang_b"))
    },
    Some("""WITH vocab AS (
              SELECT DISTINCT lang, tok
              FROM (SELECT lang,
                           unnest(list_distinct(string_split(text, ' ')))
                             AS tok
                    FROM documents)),
            sizes AS (
              SELECT lang, CAST(count(*) AS BIGINT) AS vs
              FROM vocab GROUP BY 1),
            shared AS (
              SELECT x.lang AS lang_a, y.lang AS lang_b,
                     CAST(count(*) AS BIGINT) AS shared
              FROM vocab x JOIN vocab y
                ON x.tok = y.tok AND x.lang < y.lang
              GROUP BY 1, 2)
            SELECT lang_a, lang_b, a.vs AS va, b.vs AS vb, shared,
                   CAST(round(CAST(shared AS DOUBLE) * 1e6 /
                     (CAST(a.vs AS DOUBLE) + b.vs - shared), 0)
                     AS BIGINT) AS jaccard_micro
            FROM shared
            JOIN sizes a ON lang_a = a.lang
            JOIN sizes b ON lang_b = b.lang
            ORDER BY lang_a, lang_b"""))

  val all: Seq[Q] = Seq(shapley, langOverlap)
}
