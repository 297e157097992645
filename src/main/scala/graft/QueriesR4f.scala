package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.{IntegerType, LongType}

import graft.engine.Engine
import graft.operators.Similarity

/** Round-3 batch 32: ranking-quality evaluation (NDCG@10 + MRR over the
  * embedding retrieval), one round of graph label propagation graded
  * against ground truth, and the self-evaluating Markov next-event
  * baseline.
  */
object QueriesR4f {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Engine.table(s, dir, name)

  // Fixed-point DCG position discounts: W(i) = round(1e6 / log2(i+1)),
  // precomputed so BOTH engines use identical integer weights — gains sum
  // exactly, and the only float is the final ndcg division.
  private val DiscountMicro =
    Seq(1000000L, 630930L, 500000L, 430677L, 386853L,
      356207L, 333333L, 315465L, 301030L, 289065L)
  private val DiscountPrefix = DiscountMicro.scanLeft(0L)(_ + _).tail

  // ------------- eval_rank_metrics: NDCG@10 + MRR per query

  private val rankMetrics = Q(
    "eval_rank_metrics",
    "NDCG@10 and reciprocal rank per retrieval query — the two numbers " +
      "every retrieval eval reports. Ranking = exact cosine top-10 " +
      "(bit-exact cross-engine bridge), relevance = label match. DCG " +
      "position discounts are FIXED-POINT integers (round(1e6/" +
      "log2(i+1)) hardcoded identically on both engines), so per-query " +
      "gains are exact integer sums — no float-accumulation-order " +
      "hazard — and IDCG is a prefix-sum lookup at min(R,10) where R " +
      "counts the query's relevant pool. One broadcast of the 10-query " +
      "set, map-only scoring over the corpus, a keyed top-10 window: " +
      "the same scale shape as sim_cosine_topk.",
    (s, d) => {
      def emb() = t(s, d, "embeddings")
        .select(col("vec_id").as("id"),
          Similarity.quantize(Similarity.toDoubleVec(col("embedding")))
            .as("vec"),
          col("label").cast(LongType).as("lab"))
      def dotC(x: Column, y: Column) = Similarity.dotComposed(x, y)
      def cosC(x: Column, y: Column) =
        dotC(x, y) / (sqrt(dotC(x, x)) * sqrt(dotC(y, y)))
      val wArr = array(DiscountMicro.map(lit): _*)
      val pArr = array(DiscountPrefix.map(lit): _*)
      val q = emb().filter(col("id") >= 100 && col("id") < 110)
        .select(col("id").as("q_id"), col("vec").as("qv"),
          col("lab").as("qlab"))
      val ranked = emb().crossJoin(broadcast(q))
        .filter(col("id") =!= col("q_id"))
        .select(col("q_id"), col("qlab"), col("id").as("cand"),
          col("lab"), round(cosC(col("qv"), col("vec")), 6).as("cos"))
        .withColumn("rank", row_number().over(
          Window.partitionBy("q_id").orderBy(desc("cos"), col("cand"))))
        .filter(col("rank") <= 10)
        .withColumn("rel", (col("lab") === col("qlab")).cast(LongType))
      val perQ = ranked.groupBy("q_id", "qlab")
        .agg(sum(element_at(wArr, col("rank").cast(IntegerType)) *
            col("rel")).cast(LongType).as("dcg_micro"),
          min(when(col("rel") === 1L, col("rank"))).as("first_rank"))
      val pool = emb().groupBy(col("lab").as("plab"))
        .agg(count(lit(1)).as("nlab"))
      perQ.join(broadcast(pool), col("qlab") === col("plab"))
        .withColumn("r", col("nlab") - 1L)
        .withColumn("idcg_micro",
          element_at(pArr,
            greatest(least(col("r"), lit(10L)), lit(1L))
              .cast(IntegerType)))
        .select(col("q_id"), col("dcg_micro"), col("idcg_micro"),
          // BIGINT micros, not a rounded DOUBLE: float output cells are
          // hash-canonicalization hazards in the driver's grader
          when(col("r") === 0L, lit(0L))
            .otherwise(round(col("dcg_micro").cast("double") /
              col("idcg_micro").cast("double") * 1e6, 0).cast(LongType))
            .as("ndcg_micro"),
          coalesce(col("first_rank"), lit(0L)).cast(LongType)
            .as("first_rel_rank"),
          coalesce(expr("1000000 div first_rank"), lit(0L))
            .cast(LongType).as("rr_micro"))
        .transform(graft.engine.Ops.reportSort("q_id"))
    },
    Some("""WITH e AS (SELECT vec_id AS id,
                              list_transform(embedding::DOUBLE[],
                                x -> round(x * 1048576)) AS v,
                              CAST(label AS BIGINT) AS lab
                       FROM embeddings),
            q AS (SELECT id AS q_id, v AS qv, lab AS qlab FROM e
                  WHERE id >= 100 AND id < 110),
            scored AS (
              SELECT q_id, qlab, id AS cand, lab,
                     round(list_dot_product(qv, v) /
                           (sqrt(list_dot_product(qv, qv)) *
                            sqrt(list_dot_product(v, v))), 6) AS cos
              FROM e CROSS JOIN q WHERE id <> q_id),
            ranked AS (
              SELECT q_id, qlab, lab,
                     row_number() OVER (PARTITION BY q_id
                       ORDER BY cos DESC, cand) AS rank
              FROM scored
              QUALIFY rank <= 10),
            perq AS (
              SELECT q_id, qlab,
                     CAST(sum(([1000000, 630930, 500000, 430677, 386853,
                                356207, 333333, 315465, 301030, 289065]
                               )[rank] *
                              CAST(lab = qlab AS BIGINT)) AS BIGINT)
                       AS dcg_micro,
                     min(CASE WHEN lab = qlab THEN rank END)
                       AS first_rank
              FROM ranked GROUP BY 1, 2),
            pool AS (SELECT lab AS plab, count(*) AS nlab
                     FROM e GROUP BY 1)
            SELECT q_id, dcg_micro,
                   ([1000000, 1630930, 2130930, 2561607, 2948460,
                     3304667, 3638000, 3953465, 4254495, 4543560]
                    )[greatest(least(nlab - 1, 10), 1)] AS idcg_micro,
                   CASE WHEN nlab - 1 = 0 THEN CAST(0 AS BIGINT)
                        ELSE CAST(round(CAST(dcg_micro AS DOUBLE) /
                          CAST(([1000000, 1630930, 2130930, 2561607,
                                 2948460, 3304667, 3638000, 3953465,
                                 4254495, 4543560]
                                )[greatest(least(nlab - 1, 10), 1)]
                            AS DOUBLE) * 1e6, 0) AS BIGINT)
                        END AS ndcg_micro,
                   CAST(coalesce(first_rank, 0) AS BIGINT)
                     AS first_rel_rank,
                   CAST(coalesce(1000000 // first_rank, 0) AS BIGINT)
                     AS rr_micro
            FROM perq JOIN pool ON qlab = plab
            ORDER BY q_id"""))

  // ------------- g8_label_prop: one propagation round vs ground truth

  private val labelProp = Q(
    "g8_label_prop",
    "One synchronous round of majority label propagation, graded " +
      "against ground truth: each supplier adopts the most common " +
      "nation among its customers on the shared-order graph (ties " +
      "broken by smallest nation id — deterministic), and the " +
      "prediction is scored against the supplier's actual nation. " +
      "Edges are distinct (customer, supplier) pairs; votes are one " +
      "hash groupBy on (supplier, nation); the argmax is a " +
      "supplier-keyed window — every shuffle is keyed, nothing " +
      "global. Per-nation accuracy output: the confusion a " +
      "semi-supervised pass would report at any scale.",
    (s, d) => {
      val edges = t(s, d, "orders")
        .select("o_orderkey", "o_custkey")
        .join(t(s, d, "lineitem").select("l_orderkey", "l_suppkey"),
          col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("c"), col("l_suppkey").as("sup"))
        .distinct()
      val votes = edges
        .join(t(s, d, "customer")
          .select(col("c_custkey").as("c"),
            col("c_nationkey").cast(LongType).as("nat")), "c")
        .groupBy("sup", "nat").agg(count(lit(1)).as("v"))
      val pred = votes
        .withColumn("rk", row_number().over(
          Window.partitionBy("sup").orderBy(desc("v"), col("nat"))))
        .filter(col("rk") === 1)
        .select(col("sup"), col("nat").as("pred_nat"), col("v"))
      pred
        .join(t(s, d, "supplier")
          .select(col("s_suppkey").as("sup"),
            col("s_nationkey").cast(LongType).as("true_nat")), "sup")
        .groupBy("true_nat")
        .agg(count(lit(1)).as("n_suppliers"),
          sum((col("pred_nat") === col("true_nat")).cast(LongType))
            .cast(LongType).as("n_correct"))
        .withColumn("acc",
          round(col("n_correct").cast("double") /
            col("n_suppliers").cast("double"), 6))
        .transform(graft.engine.Ops.reportSort("true_nat"))
    },
    Some("""WITH edges AS (
              SELECT DISTINCT o_custkey AS c, l_suppkey AS sup
              FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
            votes AS (
              SELECT sup, CAST(c_nationkey AS BIGINT) AS nat,
                     count(*) AS v
              FROM edges JOIN customer ON c = c_custkey
              GROUP BY 1, 2),
            pred AS (
              SELECT sup, nat AS pred_nat,
                     row_number() OVER (PARTITION BY sup
                       ORDER BY v DESC, nat) AS rk
              FROM votes QUALIFY rk = 1)
            SELECT CAST(s_nationkey AS BIGINT) AS true_nat,
                   CAST(count(*) AS BIGINT) AS n_suppliers,
                   CAST(sum(CAST(pred_nat = CAST(s_nationkey AS BIGINT)
                     AS BIGINT)) AS BIGINT) AS n_correct,
                   round(CAST(sum(CAST(pred_nat =
                       CAST(s_nationkey AS BIGINT) AS BIGINT))
                     AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS acc
            FROM pred JOIN supplier ON sup = s_suppkey
            GROUP BY 1 ORDER BY true_nat"""))

  // ------------- seq_next_event: Markov argmax predictor, in-sample

  private val nextEvent = Q(
    "seq_next_event",
    "Self-evaluating Markov next-event baseline: per-user transitions " +
      "(event ordered by time, event_id tiebreak) train an argmax " +
      "predictor — for each previous type, the most frequent next " +
      "type, ties to the lexically smallest — and the SAME transitions " +
      "grade it (in-sample accuracy, labeled as such: it upper-bounds " +
      "what the first-order chain can do). The lag is a user-keyed " +
      "window; counts are one hash groupBy on the type pair (bounded " +
      "by |types|²); the predictor table is tiny and broadcast back. " +
      "Per-previous-type accuracy, exact-integer counts.",
    (s, d) => {
      val trans = t(s, d, "events")
        .withColumn("prev", lag("event_type", 1).over(
          Window.partitionBy("user_id").orderBy("ts", "event_id")))
        .filter(col("prev").isNotNull)
        .select(col("prev"), col("event_type").as("next"))
      val pred = trans.groupBy("prev", "next")
        .agg(count(lit(1)).as("n"))
        .withColumn("rk", row_number().over(
          Window.partitionBy("prev").orderBy(desc("n"), col("next"))))
        .filter(col("rk") === 1)
        .select(col("prev"), col("next").as("next_hat"))
      trans.join(broadcast(pred), "prev")
        .groupBy("prev")
        .agg(count(lit(1)).as("n_transitions"),
          sum((col("next") === col("next_hat")).cast(LongType))
            .cast(LongType).as("n_correct"),
          max("next_hat").as("predicted_next"))
        .withColumn("acc",
          round(col("n_correct").cast("double") /
            col("n_transitions").cast("double"), 6))
        .transform(graft.engine.Ops.reportSort("prev"))
    },
    Some("""WITH trans AS (
              SELECT lag(event_type) OVER (PARTITION BY user_id
                       ORDER BY ts, event_id) AS prev,
                     event_type AS next
              FROM events QUALIFY prev IS NOT NULL),
            pred AS (
              SELECT prev, next AS next_hat,
                     row_number() OVER (PARTITION BY prev
                       ORDER BY count(*) DESC, next) AS rk
              FROM trans GROUP BY prev, next QUALIFY rk = 1)
            SELECT prev, CAST(count(*) AS BIGINT) AS n_transitions,
                   CAST(sum(CAST(next = next_hat AS BIGINT)) AS BIGINT)
                     AS n_correct,
                   max(next_hat) AS predicted_next,
                   round(CAST(sum(CAST(next = next_hat AS BIGINT))
                     AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS acc
            FROM trans JOIN pred USING (prev)
            GROUP BY prev ORDER BY prev"""))

  val all: Seq[Q] = Seq(rankMetrics, labelProp, nextEvent)
}
