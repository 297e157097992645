package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.LongType

import graft.engine.Engine
import graft.operators.Similarity

/** Round-3 batch 6: the two ANN pieces that close the PQ/IVF story —
  * the asymmetric-distance (ADC) scan that actually SEARCHES a
  * PQ-compressed corpus, and a recall@k evaluation harness that grades
  * the approximate path against exact brute force (the metric every ANN
  * deployment is tuned by).
  */
object QueriesR3f {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Engine.table(s, dir, name)

  /** (id, j, sv): each 64-dim vector exploded into 8 subvectors of 8
    * dims. Fresh lineage per call (Spark 4.1 attribute-dedup dodge). */
  private def subvectors(s: SparkSession, d: String): DataFrame =
    t(s, d, "embeddings")
      .select(col("vec_id").as("id"),
        Similarity.toDoubleVec(col("embedding")).as("v"))
      .select(col("id"), explode(array((0 until 8).map(j =>
        struct(lit(j).as("j"), slice(col("v"), 8 * j + 1, 8).as("sv"))): _*))
        .as("x"))
      .select(col("id"), col("x.j").as("j"), col("x.sv").as("sv"))

  /** (j, cid, code): the 16-entry-per-subspace codebook — first 16
    * vectors' subvectors, as in sim_pq_codes (production trains these
    * with per-subspace k-means; the scan shape is identical). */
  private def codebook(s: SparkSession, d: String): DataFrame =
    t(s, d, "embeddings")
      .filter(col("vec_id") < 16)
      .select(col("vec_id").as("cid"),
        Similarity.toDoubleVec(col("embedding")).as("cv"))
      .select(col("cid"), explode(array((0 until 8).map(j =>
        struct(lit(j).as("j"), slice(col("cv"), 8 * j + 1, 8).as("code"))): _*))
        .as("x"))
      .select(col("x.j").as("j"), col("cid"), col("x.code").as("code"))

  /** Compositional L2²: |a|² − 2·a·b + |b|² via the native sequential
    * dot fold — bit-identical to DuckDB's list_dot_product composition,
    * so argmins and rounded micros agree exactly across engines. */
  private def d2(a: Column, b: Column): Column =
    Similarity.dot(a, a) - lit(2) * Similarity.dot(a, b) + Similarity.dot(b, b)

  // ------------------- sim_pq_adc: asymmetric-distance PQ scan

  private val pqAdc = Q(
    "sim_pq_adc",
    "PQ asymmetric-distance scan (Jegou et al. 2011 §IV): queries stay " +
      "uncompressed, the corpus is its PQ code table — per query, " +
      "distance to EVERY corpus vector is 8 integer lookups + a sum, " +
      "never a float dot against the original embedding. Per (query, " +
      "subspace, code) the exact subvector L2² is rounded ONCE to " +
      "BIGINT micro in a 10×8×16-row lookup table (broadcast); the " +
      "corpus side touches only its (id, j, cid) assignments, so the " +
      "scan is a map-side broadcast join + one integer-sum groupBy — at " +
      "100 TB the original vectors are read once at index-build time " +
      "and the search stage streams 4-byte codes. adc_micro sums are " +
      "exact BIGINTs (accumulation-order-proof); rank ties break on " +
      "candidate id.",
    (s, d) => {
      val codes = codebook(s, d)
      // index build: nearest code per (corpus vector, subspace)
      val best = subvectors(s, d).join(broadcast(codes), Seq("j"))
        .select(col("id"), col("j"),
          struct(d2(col("sv"), col("code")).as("d2"), col("cid")).as("dc"))
        .groupBy("id", "j").agg(min("dc").as("m"))
        .select(col("id"), col("j"), col("m.cid").as("cid"))
      // query-time distance table: exact query subvector vs each code
      val lut = subvectors(s, d)
        .filter(col("id") >= 100 && col("id") < 110)
        .withColumnRenamed("id", "q_id")
        .join(broadcast(codebook(s, d)), Seq("j"))
        .select(col("q_id"), col("j"), col("cid"),
          round(d2(col("sv"), col("code")) * 1e6, 0).cast(LongType)
            .as("d2_micro"))
      val adc = best.join(broadcast(lut), Seq("j", "cid"))
        .filter(col("id") =!= col("q_id"))
        .groupBy("q_id", "id").agg(sum("d2_micro").as("adc_micro"))
      adc.withColumn("rank", row_number().over(
          Window.partitionBy("q_id").orderBy(col("adc_micro"), col("id"))))
        .filter(col("rank") <= 5)
        .select(col("q_id"), col("rank"), col("id").as("cand"),
          col("adc_micro"))
        .orderBy("q_id", "rank")
    },
    Some("""WITH v AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v
                       FROM embeddings),
            sub AS (SELECT id, j, list_slice(v, 8*j+1, 8*j+8) AS sv
                    FROM v CROSS JOIN (SELECT unnest(range(0, 8)) AS j)),
            codes AS (SELECT j, c.vec_id AS cid,
                             list_slice(c.embedding::DOUBLE[], 8*j+1, 8*j+8)
                               AS code
                      FROM embeddings c
                      CROSS JOIN (SELECT unnest(range(0, 8)) AS j)
                      WHERE c.vec_id < 16),
            best AS (SELECT id, j, min(struct_pack(
                       d2 := list_dot_product(sv, sv)
                             - 2 * list_dot_product(sv, code)
                             + list_dot_product(code, code),
                       cid := cid)) AS m
                     FROM sub JOIN codes USING (j) GROUP BY id, j),
            bestc AS (SELECT id, j, m.cid AS cid FROM best),
            lut AS (SELECT id AS q_id, codes.j, cid,
                           CAST(round((list_dot_product(sv, sv)
                                 - 2 * list_dot_product(sv, code)
                                 + list_dot_product(code, code)) * 1000000,
                               0) AS BIGINT) AS d2_micro
                    FROM sub JOIN codes USING (j)
                    WHERE id >= 100 AND id < 110),
            adc AS (SELECT q_id, id,
                           CAST(sum(d2_micro) AS BIGINT) AS adc_micro
                    FROM bestc JOIN lut USING (j, cid)
                    WHERE id <> q_id GROUP BY q_id, id),
            r AS (SELECT *, row_number() OVER
                    (PARTITION BY q_id ORDER BY adc_micro, id) AS rank
                  FROM adc)
            SELECT q_id, rank, id AS cand, adc_micro
            FROM r WHERE rank <= 5 ORDER BY q_id, rank"""))

  // ------------------- sim_ann_recall: recall@5 of IVF vs brute force

  private val annRecall = Q(
    "sim_ann_recall",
    "ANN quality evaluation: recall@5 of the IVF nprobe=1 path " +
      "(sim_ivf_topk's construction, verbatim) against exact brute-force " +
      "cosine top-5 — the metric every ANN index is tuned by, computed " +
      "INSIDE the engine so index-parameter sweeps are one query away. " +
      "Both top-5 sets use the bit-exact cross-engine cosine/argmin " +
      "bridges, so the intersection count (and the graded recall " +
      "percentage) is deterministic. Exact side is a broadcast " +
      "query-set map-only scan; IVF side touches one cell per query; " +
      "the final intersect joins two 50-row frames.",
    (s, d) => {
      def emb() = t(s, d, "embeddings")
        .select(col("vec_id").as("id"),
          Similarity.toDoubleVec(col("embedding")).as("vec"))
      def dotC(x: Column, y: Column) = Similarity.dotComposed(x, y)
      def cosC(x: Column, y: Column) =
        dotC(x, y) / (sqrt(dotC(x, x)) * sqrt(dotC(y, y)))
      val q = emb().filter(col("id") >= 100 && col("id") < 110)
        .select(col("id").as("q_id"), col("vec").as("qv"))
      val exact = emb().crossJoin(broadcast(q))
        .filter(col("id") =!= col("q_id"))
        .select(col("q_id"), col("id").as("cand"),
          round(cosC(col("qv"), col("vec")), 6).as("cos"))
        .withColumn("rank", row_number().over(
          Window.partitionBy("q_id").orderBy(desc("cos"), col("cand"))))
        .filter(col("rank") <= 5).select("q_id", "cand")
      // IVF candidates: the sim_ivf_topk construction
      def cents() = t(s, d, "embeddings").filter(col("vec_id") < 8)
        .select(col("vec_id").as("cid"),
          Similarity.toDoubleVec(col("embedding")).as("cv"))
      def cells() = emb().crossJoin(broadcast(cents()))
        .select(col("id"), struct(
          (dotC(col("vec"), col("vec")) -
            lit(2) * dotC(col("vec"), col("cv")) +
            dotC(col("cv"), col("cv"))).as("d2"), col("cid")).as("dc"))
        .groupBy("id").agg(min(col("dc")).as("m"))
        .select(col("id"), col("m.cid").as("cell"))
      val cand = emb().join(cells(), "id")
        .select(col("id").as("cand"), col("vec").as("cv2"), col("cell"))
      val qc = emb().join(cells(), "id")
        .filter(col("id") >= 100 && col("id") < 110)
        .select(col("id").as("q_id"), col("vec").as("qv"), col("cell"))
      val ivf = cand.join(broadcast(qc), "cell")
        .filter(col("cand") =!= col("q_id"))
        .select(col("q_id"), col("cand"),
          round(cosC(col("qv"), col("cv2")), 6).as("cos"))
        .withColumn("rank", row_number().over(
          Window.partitionBy("q_id").orderBy(desc("cos"), col("cand"))))
        .filter(col("rank") <= 5).select("q_id", "cand")
      val hits = exact.join(ivf, Seq("q_id", "cand"))
        .groupBy("q_id").agg(count(lit(1)).as("h"))
      q.select("q_id").join(hits, Seq("q_id"), "left")
        .select(col("q_id"),
          coalesce(col("h"), lit(0L)).as("hits"),
          (coalesce(col("h"), lit(0L)) * 20).as("recall_pct"))
        .orderBy("q_id")
    },
    Some("""WITH e AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v
                       FROM embeddings),
            q AS (SELECT id AS q_id, v AS qv FROM e
                  WHERE id >= 100 AND id < 110),
            xs AS (SELECT q_id, id AS cand,
                          round(list_dot_product(qv, v) /
                                (sqrt(list_dot_product(qv, qv)) *
                                 sqrt(list_dot_product(v, v))), 6) AS cos
                   FROM e CROSS JOIN q WHERE id <> q_id),
            xr AS (SELECT q_id, cand, row_number() OVER
                     (PARTITION BY q_id ORDER BY cos DESC, cand) AS rank
                   FROM xs),
            exact AS (SELECT q_id, cand FROM xr WHERE rank <= 5),
            c AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS cv
                  FROM embeddings WHERE vec_id < 8),
            cells AS (
              SELECT id, m.cid AS cell FROM (
                SELECT e.id,
                       min(struct_pack(
                         d2 := list_dot_product(e.v, e.v)
                               - 2 * list_dot_product(e.v, c.cv)
                               + list_dot_product(c.cv, c.cv),
                         cid := c.cid)) AS m
                FROM e CROSS JOIN c GROUP BY e.id)),
            cand AS (SELECT e.id AS cand, e.v AS cv2, cells.cell
                     FROM e JOIN cells ON e.id = cells.id),
            qc AS (SELECT e.id AS q_id, e.v AS qv, cells.cell
                   FROM e JOIN cells ON e.id = cells.id
                   WHERE e.id >= 100 AND e.id < 110),
            ivs AS (SELECT q_id, cand,
                           round(list_dot_product(qv, cv2) /
                                 (sqrt(list_dot_product(qv, qv)) *
                                  sqrt(list_dot_product(cv2, cv2))), 6) AS cos
                    FROM cand JOIN qc USING (cell) WHERE cand <> q_id),
            ivr AS (SELECT q_id, cand, row_number() OVER
                      (PARTITION BY q_id ORDER BY cos DESC, cand) AS rank
                    FROM ivs),
            ivf AS (SELECT q_id, cand FROM ivr WHERE rank <= 5),
            hits AS (SELECT exact.q_id, count(*) AS h
                     FROM exact JOIN ivf USING (q_id, cand) GROUP BY 1)
            SELECT q.q_id AS q_id, coalesce(h, 0) AS hits,
                   coalesce(h, 0) * 20 AS recall_pct
            FROM q LEFT JOIN hits ON q.q_id = hits.q_id
            ORDER BY q.q_id"""))

  val all: Seq[Q] = Seq(pqAdc, annRecall)
}
