package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.LongType

import graft.engine.Engine
import graft.operators.Similarity

/** Round-3 batch 6 — evaluation & quality harnesses: the
  * asymmetric-distance (ADC) scan that actually SEARCHES a PQ-compressed
  * corpus, a recall@k evaluation grading the approximate ANN path
  * against exact brute force, a MinHash estimator-error measurement
  * against exact Jaccard, and a declarative data-quality rules report.
  * The common thread: the engine measures its own approximations and
  * contracts in-line, so parameter sweeps and gate checks are ordinary
  * queries.
  */
object QueriesR3f {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Engine.table(s, dir, name)

  /** (id, j, sv): each 64-dim vector exploded into 8 subvectors of 8
    * dims. Fresh lineage per call (Spark 4.1 attribute-dedup dodge). */
  private def subvectors(s: SparkSession, d: String): DataFrame =
    t(s, d, "embeddings")
      .select(col("vec_id").as("id"),
        Similarity.quantize(Similarity.toDoubleVec(col("embedding"))).as("v"))
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
        Similarity.quantize(Similarity.toDoubleVec(col("embedding"))).as("cv"))
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
          round(d2(col("sv"), col("code")) / lit(1099511627776.0) * 1e6, 0)
            .cast(LongType).as("d2_micro"))
      val adc = best.join(broadcast(lut), Seq("j", "cid"))
        .filter(col("id") =!= col("q_id"))
        .groupBy("q_id", "id").agg(sum("d2_micro").as("adc_micro"))
      adc.withColumn("rank", row_number().over(
          Window.partitionBy("q_id").orderBy(col("adc_micro"), col("id"))))
        .filter(col("rank") <= 5)
        .select(col("q_id"), col("rank"), col("id").as("cand"),
          col("adc_micro"))
        .transform(graft.engine.Ops.reportSort("q_id", "rank"))
    },
    Some("""WITH v AS (SELECT vec_id AS id,
                       list_transform(embedding::DOUBLE[],
                         x -> round(x * 1048576)) AS v
                       FROM embeddings),
            sub AS (SELECT id, j, list_slice(v, 8*j+1, 8*j+8) AS sv
                    FROM v CROSS JOIN (SELECT unnest(range(0, 8)) AS j)),
            codes AS (SELECT j, c.vec_id AS cid,
                             list_slice(c.embq, 8*j+1, 8*j+8)
                               AS code
                      FROM (SELECT vec_id,
                              list_transform(embedding::DOUBLE[],
                                x -> round(x * 1048576)) AS embq
                            FROM embeddings) c
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
                                 + list_dot_product(code, code))
                               / 1099511627776.0 * 1000000,
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
          Similarity.quantize(Similarity.toDoubleVec(col("embedding")))
            .as("vec"))
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
          Similarity.quantize(Similarity.toDoubleVec(col("embedding")))
            .as("cv"))
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
        .transform(graft.engine.Ops.reportSort("q_id"))
    },
    Some("""WITH e AS (SELECT vec_id AS id,
                       list_transform(embedding::DOUBLE[],
                         x -> round(x * 1048576)) AS v
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
            c AS (SELECT id AS cid, v AS cv FROM e WHERE id < 8),
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

  // ------------- eval_minhash_err: signature-estimate error vs exact

  private val minhashErr = Q(
    "eval_minhash_err",
    "MinHash estimation-quality harness: per candidate pair, the " +
      "16-permutation signature match rate (matches/16, the Broder " +
      "estimator) against the EXACT token-set Jaccard, with the absolute " +
      "error — the measurement that picks signature length for a target " +
      "dedup precision. All-integer micros (div, not /): exact cross-" +
      "engine hashes. Graded on an 80-doc slice so the oracle's exact " +
      "side is bounded; at 100 TB exact Jaccard is computed only for " +
      "LSH-emitted candidates (dedup_minhash_lsh) and the token-level " +
      "intersect join stays linear in candidate count — the estimator " +
      "itself needs just the 16-value signatures.",
    (s, d) => {
      import graft.operators.Dedup
      def toks() = Dedup.tokenPairs(
        t(s, d, "documents").filter(col("doc_id") < 80), "doc_id", "text",
        distinctTokens = true)
      def sizes(as: String, nt: String) = toks()
        .groupBy("doc_id").agg(count(lit(1)).as(nt))
        .withColumnRenamed("doc_id", as)
      val inter = toks().as("a").join(toks().as("b"),
          col("a.tok") === col("b.tok") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .agg(count(lit(1)).as("inter"))
      val exact = inter
        .join(sizes("doc_a", "na"), "doc_a")
        .join(sizes("doc_b", "nb"), "doc_b")
        .select(col("doc_a"), col("doc_b"),
          expr("(inter * 1000000) div (na + nb - inter)").as("jacc_micro"))
      def sig() = Dedup.minhashSignatures(
        toks().select(col("doc_id"), Dedup.tokenId(col("tok")).as("tid")),
        "doc_id", numHashes = 16)
      val est = sig().as("x").join(sig().as("y"),
          col("x.j") === col("y.j") && col("x.doc_id") < col("y.doc_id"))
        .groupBy(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
        .agg(sum(when(col("x.h") === col("y.h"), lit(1L)).otherwise(lit(0L)))
          .as("matches"))
      exact.join(est, Seq("doc_a", "doc_b"))
        .select(col("doc_a"), col("doc_b"), col("jacc_micro"),
          (col("matches") * 62500).as("est_micro"),
          abs(col("matches") * 62500 - col("jacc_micro")).as("err_micro"))
        .orderBy("doc_a", "doc_b")
    },
    Some("""WITH docs AS (SELECT doc_id,
                     list_distinct(string_split(text, ' ')) AS toks
                   FROM documents WHERE doc_id < 80),
            toks AS (SELECT doc_id, unnest(toks) AS tok FROM docs),
            sizes AS (SELECT doc_id, count(*) AS nt FROM toks GROUP BY 1),
            inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                             count(*) AS inter
                      FROM toks a JOIN toks b
                        ON a.tok = b.tok AND a.doc_id < b.doc_id
                      GROUP BY 1, 2),
            exact AS (SELECT doc_a, doc_b,
                             (inter * 1000000) // (na.nt + nb.nt - inter)
                               AS jacc_micro
                      FROM inter
                      JOIN sizes na ON na.doc_id = doc_a
                      JOIN sizes nb ON nb.doc_id = doc_b),
            tid AS (SELECT doc_id,
                           ('0x' || substr(md5(tok), 1, 8))::BIGINT AS tid
                    FROM toks),
            sig AS (SELECT doc_id, j,
                           min(((2*j+1)*tid + (7*j+3)) % 8191) AS h
                    FROM tid CROSS JOIN (SELECT unnest(range(0, 16)) AS j)
                    GROUP BY 1, 2),
            est AS (SELECT x.doc_id AS doc_a, y.doc_id AS doc_b,
                           CAST(sum(CASE WHEN x.h = y.h THEN 1 ELSE 0 END)
                                AS BIGINT) AS matches
                    FROM sig x JOIN sig y
                      ON x.j = y.j AND x.doc_id < y.doc_id
                    GROUP BY 1, 2)
            SELECT e.doc_a AS doc_a, e.doc_b AS doc_b, jacc_micro,
                   matches * 62500 AS est_micro,
                   abs(matches * 62500 - jacc_micro) AS err_micro
            FROM exact e JOIN est USING (doc_a, doc_b)
            ORDER BY doc_a, doc_b"""))

  // ------------- dq_rules_report: declarative data-quality contract

  private val dqRules = Q(
    "dq_rules_report",
    "Rules-based data-quality report (the expectations-suite pattern): " +
      "8 declarative rules over lineitem — null rate, domain membership, " +
      "numeric range bounds, primary-key uniqueness, and referential " +
      "integrity to orders — each emitting (rule, violations, pass). " +
      "Seven rules fold into ONE aggregate pass over the fact table " +
      "(violation counters are conditional sums, uniqueness is " +
      "count−countDistinct — all map-side partial); the FK rule is a " +
      "left-anti probe of the orders key set. One full scan + one " +
      "anti-join at any scale; the report itself is 8 rows. The fixture " +
      "has a REAL defect — duplicate (l_orderkey, l_linenumber) pairs — " +
      "so pk_unique fails while the other seven pass: the report " +
      "demonstrably detects, not just describes.",
    (s, d) => {
      val li = t(s, d, "lineitem")
      def viol(c: Column) = sum(when(c, lit(1L)).otherwise(lit(0L)))
      val base = li.agg(
        viol(col("l_quantity").isNull).as("null_quantity"),
        viol(col("l_quantity") < 1 || col("l_quantity") > 50)
          .as("quantity_range"),
        viol(col("l_discount") < 0 || col("l_discount") > 0.1)
          .as("discount_range"),
        viol(col("l_tax") < 0 || col("l_tax") > 0.08).as("tax_range"),
        viol(!col("l_returnflag").isin("A", "N", "R"))
          .as("returnflag_domain"),
        (count(lit(1)) -
          countDistinct(col("l_orderkey"), col("l_linenumber")))
          .as("pk_unique"),
        viol(col("l_extendedprice") <= 0).as("price_positive"))
      val fk = li.join(
          t(s, d, "orders").select(col("o_orderkey")),
          col("l_orderkey") === col("o_orderkey"), "left_anti")
        .agg(count(lit(1)).as("fk_orders"))
      base.crossJoin(fk)
        .select(explode(array(
          struct(lit("null_quantity").as("rule"),
            col("null_quantity").as("violations")),
          struct(lit("quantity_range").as("rule"),
            col("quantity_range").as("violations")),
          struct(lit("discount_range").as("rule"),
            col("discount_range").as("violations")),
          struct(lit("tax_range").as("rule"),
            col("tax_range").as("violations")),
          struct(lit("returnflag_domain").as("rule"),
            col("returnflag_domain").as("violations")),
          struct(lit("pk_unique").as("rule"),
            col("pk_unique").as("violations")),
          struct(lit("price_positive").as("rule"),
            col("price_positive").as("violations")),
          struct(lit("fk_orders_orphans").as("rule"),
            col("fk_orders").as("violations")))).as("r"))
        .select(col("r.rule").as("rule"),
          col("r.violations").as("violations"),
          (col("r.violations") === 0).as("pass"))
        .transform(graft.engine.Ops.reportSort("rule"))
    },
    Some("""WITH base AS (SELECT
              CAST(sum(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END)
                   AS BIGINT) AS null_quantity,
              CAST(sum(CASE WHEN l_quantity < 1 OR l_quantity > 50
                   THEN 1 ELSE 0 END) AS BIGINT) AS quantity_range,
              CAST(sum(CASE WHEN l_discount < 0 OR l_discount > 0.1
                   THEN 1 ELSE 0 END) AS BIGINT) AS discount_range,
              CAST(sum(CASE WHEN l_tax < 0 OR l_tax > 0.08
                   THEN 1 ELSE 0 END) AS BIGINT) AS tax_range,
              CAST(sum(CASE WHEN l_returnflag NOT IN ('A', 'N', 'R')
                   THEN 1 ELSE 0 END) AS BIGINT) AS returnflag_domain,
              CAST(count(*) -
                   count(DISTINCT (l_orderkey, l_linenumber))
                   AS BIGINT) AS pk_unique,
              CAST(sum(CASE WHEN l_extendedprice <= 0 THEN 1 ELSE 0 END)
                   AS BIGINT) AS price_positive
            FROM lineitem),
            fk AS (SELECT CAST(count(*) AS BIGINT) AS fk_orders
                   FROM lineitem l ANTI JOIN orders o
                     ON l.l_orderkey = o.o_orderkey),
            rows_ AS (
              SELECT 'null_quantity' AS rule, null_quantity AS violations
                FROM base
              UNION ALL SELECT 'quantity_range', quantity_range FROM base
              UNION ALL SELECT 'discount_range', discount_range FROM base
              UNION ALL SELECT 'tax_range', tax_range FROM base
              UNION ALL SELECT 'returnflag_domain', returnflag_domain
                FROM base
              UNION ALL SELECT 'pk_unique', pk_unique FROM base
              UNION ALL SELECT 'price_positive', price_positive FROM base
              UNION ALL SELECT 'fk_orders_orphans', fk_orders FROM fk)
            SELECT rule, violations, violations = 0 AS pass
            FROM rows_ ORDER BY rule"""))

  val all: Seq[Q] = Seq(pqAdc, annRecall, minhashErr, dqRules)
}
