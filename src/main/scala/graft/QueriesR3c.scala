package graft

import graft.engine.Ck.Ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.LongType

import graft.engine.Engine
import graft.operators.Similarity

/** Round-3 batch 3: mergeable-sketch partial aggregation, windowed
  * distinct counts, native session windows, correlated LATERAL joins,
  * SemDeDup-style embedding cluster dedup, and the character-entropy
  * quality signal.
  *
  * Same determinism discipline as the rest of the inventory: unique
  * ordering keys, exact-integer arithmetic wherever accumulation order
  * could matter, libm-derived values rounded identically on both engines.
  */
object QueriesR3c {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Engine.table(s, dir, name)

  // -------------------- a23: mergeable HLL sketches (partial → union)

  private val a23 = Q(
    "a23_hll_partial_merge",
    "THE 100 TB pre-aggregation pattern: per-(type, day) DataSketches " +
      "HLL sketches (hll_sketch_agg) built in one pass, then rolled up " +
      "per type with hll_union_agg — distinct users per type WITHOUT " +
      "re-touching row data, the way a warehouse maintains daily " +
      "distinct-count cubes (a12's approx tier made compositional: " +
      "sketches are partial-aggregatable AND re-mergeable across any " +
      "grouping rollup, which a plain approx_count_distinct result is " +
      "not). Sketch binaries differ across engines, so the graded " +
      "output is the a12-style determinism bridge: the exact per-type " +
      "distinct count plus a boolean asserting the merged estimate " +
      "lands within ±10% — constant-true on any engine pair at HLL's " +
      "~2% error.",
    (s, d) => {
      val ev = t(s, d, "events")
      val daily = ev
        .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
        .agg(hll_sketch_agg(col("user_id")).as("sk"))
      val merged = daily.groupBy("event_type")
        .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("approx"))
      val exact = ev.groupBy("event_type")
        .agg(count_distinct(col("user_id")).as("exact_users"))
      exact.join(merged, "event_type")
        .select(col("event_type"), col("exact_users"),
          (abs(col("approx") - col("exact_users")) <=
            lit(0.1) * col("exact_users")).as("within_10pct"))
        .transform(graft.engine.Ops.reportSort("event_type"))
    },
    Some("""SELECT event_type, count(DISTINCT user_id) AS exact_users,
                   true AS within_10pct
            FROM events GROUP BY event_type ORDER BY event_type"""))

  // ---------------- w14: running DISTINCT count over an ordered window

  private val w14 = Q(
    "w14_distinct_rolling",
    "Per-user RUNNING distinct event-type count — the windowed COUNT " +
      "(DISTINCT) neither engine's window frames support directly, " +
      "rewritten as first-occurrence flag (row_number = 1 per (user, " +
      "type)) + running sum: exactly the decomposition that scales, " +
      "because window state is one counter instead of a per-row set " +
      "(the collect_set-over-window form carries the whole distinct set " +
      "in every frame). An explicit repartition(user_id) up front " +
      "leaves ONE exchange in the plan: hash(user_id) satisfies both " +
      "windows' clustering (user_id, event_type) ⊇ (user_id), so the " +
      "second window reuses the first's partitioning and only re-sorts.",
    (s, d) => {
      val first = row_number().over(
        Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id"))
      val running = Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, d, "events")
        .repartition(col("user_id"))
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("ep"), col("ts"), col("event_type"))
        .withColumn("fst", when(first === 1, 1L).otherwise(0L))
        .withColumn("n_distinct", sum("fst").over(running))
        .select("user_id", "event_id", "ep", "n_distinct")
        .orderBy("user_id", "ep", "event_id")
    },
    Some("""WITH f AS (SELECT user_id, event_id, ts, epoch_us(ts) AS ep,
                   CASE WHEN row_number() OVER (
                     PARTITION BY user_id, event_type
                     ORDER BY ts, event_id) = 1
                   THEN 1 ELSE 0 END AS fst
            FROM events)
            SELECT user_id, event_id, ep,
                   CAST(sum(fst) OVER (PARTITION BY user_id
                     ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_distinct
            FROM f ORDER BY user_id, ep, event_id"""))

  // ----------------------- w15: native session_window (batch groupBy)

  private val w15 = Q(
    "w15_session_window",
    "Spark's NATIVE session-window operator in batch: groupBy(user_id, " +
      "session_window(ts, 30 min)) — the same merging-interval " +
      "aggregation Structured Streaming runs stateful, here planned as " +
      "one user-keyed shuffle + sort with sessions merged inside the " +
      "aggregate (no lag/running-sum window cascade — compare " +
      "w1_session_batch, the manual islands form). Semantics pinned by " +
      "the oracle and R3cOpsSpec: an event at EXACTLY the 30-min " +
      "threshold still merges (Spark extends while next.ts <= " +
      "session.end, so the islands boundary is strictly >), and " +
      "session end = last event + gap. Cents-exact sums.",
    (s, d) =>
      t(s, d, "events")
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
        .agg(count(lit(1)).as("n_events"),
          sum(round(col("value") * 100, 0).cast(LongType)).as("cents"))
        .select(col("user_id"),
          col("session_window.start").as("started"),
          col("session_window.end").as("ended"),
          col("n_events"), col("cents"))
        .orderBy("user_id", "started"),
    Some("""WITH marked AS (
              SELECT user_id, ts, value,
                     CASE WHEN lag(ts) OVER w IS NULL
                          OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
                          THEN 1 ELSE 0 END AS boundary
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
            sess AS (
              SELECT *, sum(boundary) OVER
                (PARTITION BY user_id ORDER BY ts
                 ROWS UNBOUNDED PRECEDING) AS sid
              FROM marked)
            SELECT user_id, min(ts) AS started,
                   max(ts) + INTERVAL 30 MINUTE AS ended,
                   count(*) AS n_events,
                   CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
                     AS cents
            FROM sess GROUP BY user_id, sid
            ORDER BY user_id, started"""))

  // --------------------- j19: correlated LATERAL top-k (one SQL text)

  /** One ANSI LATERAL join both engines parse verbatim (the a22
    * discipline at the JOIN level): top-2 customers by balance per
    * nation via a correlated ordered-LIMIT subquery. Catalyst
    * decorrelates the LIMIT into a per-nation rank window — the
    * DataFrame row_number form — so the declarative correlated shape
    * costs the same one shuffle as the hand-rewritten one.
    */
  private val LateralText =
    """SELECT n_name, c_custkey, c_acctbal
      |FROM nation, LATERAL (
      |  SELECT c_custkey, c_acctbal FROM customer
      |  WHERE c_nationkey = n_nationkey
      |  ORDER BY c_acctbal DESC, c_custkey LIMIT 2)
      |ORDER BY n_name, c_acctbal DESC, c_custkey""".stripMargin

  private val j19 = Q(
    "j19_lateral_topk",
    "Correlated LATERAL join, one SQL text on both engines: per-nation " +
      "top-2 customers by account balance from an ordered-LIMIT " +
      "subquery correlated on the outer nation key. Spark decorrelates " +
      "the per-row LIMIT into a rank-over-partition rewrite (one " +
      "customer shuffle), not a per-nation re-scan — the plan you'd " +
      "write by hand from the declarative form users actually write.",
    (s, d) => {
      t(s, d, "nation").createOrReplaceTempView("nation")
      t(s, d, "customer").createOrReplaceTempView("customer")
      s.sql(LateralText)
    },
    Some(LateralText))

  // ------------------- dedup_semdedup: cluster-then-prune (SemDeDup)

  private val semdedup = Q(
    "dedup_semdedup",
    "SemDeDup (Abbas et al. 2023): semantic dedup that only compares " +
      "embeddings WITHIN coarse k-means cells — assign every vector to " +
      "its nearest of 32 centroids (broadcast argmin, the IVF/k-means " +
      "compositional d2 so assignment agrees bit-exactly across " +
      "engines), enumerate same-cell pairs only (pair space n²/k vs " +
      "the global n² — at corpus scale k grows with n to keep cells " +
      "bounded, and cells shard across executors by construction: the " +
      "cell key is also the join parallelism, one reason k=32 beats " +
      "k=8 even locally — measured 3.7 s → 2.2 s at sf0.1), and prune " +
      "vector whose cell holds an earlier near-identical one " +
      "(cos ≥ 0.95). The assignment pass feeds THREE plan references " +
      "(both pair sides + the verdict frame), so it is materialized " +
      "once (localCheckpoint — prefix_filter's discipline); the " +
      "corpus is near-dup-free, so ~10 jittered copies are planted " +
      "in-query (dedup_embedding_cosine's deterministic plant, " +
      "mirrored in the oracle); a plant whose jitter crosses a cell " +
      "boundary survives — the method's real, deterministic recall " +
      "miss, same as LSH's. Output: every vector with its cell and " +
      "kept/pruned verdict.",
    (s, d) => {
      val base = t(s, d, "embeddings")
        .select(col("vec_id").as("id"),
          Similarity.quantize(Similarity.toDoubleVec(col("embedding")))
            .as("v"))
      val planted = t(s, d, "embeddings")
        .filter(col("vec_id") % 50 === 0)
        .select((col("vec_id") + 1000000000000L).as("id"),
          Similarity.quantize(
            transform(Similarity.toDoubleVec(col("embedding")),
              (x, i) => x +
                (((col("vec_id") + 1000000000000L) * 31 + i * 17) % 7 - 3)
                  .cast("double") * lit(0.01))).as("v"))
      val cents = t(s, d, "embeddings")
        .filter(col("vec_id") < 32)
        .select(col("vec_id").as("cid"),
          Similarity.quantize(Similarity.toDoubleVec(col("embedding")))
            .as("cv"))
      val assigned = base.unionByName(planted)
        .crossJoin(broadcast(cents))
        .select(col("id"), col("v"), struct(
          (Similarity.dot(col("v"), col("v")) -
            lit(2) * Similarity.dot(col("v"), col("cv")) +
            Similarity.dot(col("cv"), col("cv"))).as("d2"),
          col("cid")).as("dc"))
        .groupBy("id").agg(min(col("dc")).as("m"), first(col("v")).as("v"))
        .select(col("id"), col("m.cid").as("cell"), col("v"),
          sqrt(Similarity.dot(col("v"), col("v"))).as("nrm"))
        .ckpt(true)
      val a = assigned.select(col("id").as("id_a"), col("cell"),
        col("v").as("va"), col("nrm").as("na"))
      val b = assigned.select(col("id").as("id_b"), col("cell"),
        col("v").as("vb"), col("nrm").as("nb"))
      val pruned = a.join(b, Seq("cell")).filter(col("id_a") < col("id_b"))
        .filter(round(Similarity.dot(col("va"), col("vb")) /
          (col("na") * col("nb")), 6) >= 0.95)
        .select(col("id_b").as("id")).distinct()
      assigned
        .join(pruned.withColumn("hit", lit(1)), Seq("id"), "left")
        .select(col("id"), col("cell"), col("hit").isNull.as("kept"))
        .transform(graft.engine.Ops.reportSort("id"))
    },
    Some("""WITH base AS (SELECT vec_id AS id,
                       list_transform(embedding::DOUBLE[],
                         x -> round(x * 1048576)) AS v
                       FROM embeddings),
            planted AS (
              SELECT vec_id + 1000000000000 AS id,
                     list_transform(range(0,64), i ->
                       round((embedding[i+1]::DOUBLE +
                         CAST(((vec_id + 1000000000000)*31 + i*17) % 7 - 3
                           AS DOUBLE) * 0.01) * 1048576)) AS v
              FROM embeddings WHERE vec_id % 50 = 0),
            corpus AS (SELECT * FROM base UNION ALL SELECT * FROM planted),
            c AS (SELECT vec_id AS cid,
                         list_transform(embedding::DOUBLE[],
                           x -> round(x * 1048576)) AS cv
                  FROM embeddings WHERE vec_id < 32),
            cells AS (
              SELECT id, m.cid AS cell, v,
                     sqrt(list_dot_product(v, v)) AS nrm FROM (
                SELECT corpus.id, corpus.v,
                       min(struct_pack(
                         d2 := list_dot_product(corpus.v, corpus.v)
                               - 2 * list_dot_product(corpus.v, c.cv)
                               + list_dot_product(c.cv, c.cv),
                         cid := c.cid)) AS m
                FROM corpus CROSS JOIN c GROUP BY corpus.id, corpus.v)),
            pruned AS (
              SELECT DISTINCT b.id AS id
              FROM cells a JOIN cells b
              ON a.cell = b.cell AND a.id < b.id
              WHERE round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 6)
                    >= 0.95)
            SELECT cells.id, cells.cell,
                   (pruned.id IS NULL) AS kept
            FROM cells LEFT JOIN pruned ON cells.id = pruned.id
            ORDER BY cells.id"""))

  // ----------------- text_char_entropy: character-entropy quality gate

  private val entropy = Q(
    "text_char_entropy",
    "Character-level Shannon entropy per document — the cheap gibberish " +
      "/ boilerplate detector every web-corpus quality stack runs " +
      "(random byte soup scores high, repeated padding scores low). " +
      "Accumulation-order-proof across engines: each (char, count) " +
      "contributes round(cnt·log2(cnt)·1e6) as an exact BIGINT " +
      "micro-term, so the per-doc sum is integer arithmetic — " +
      "order-independent — and H = log2(n) − S/(n·1e6) is derived from " +
      "the two exact integers (one libm log2 per doc, bridged with " +
      "round-3 like every trig-derived value in the inventory). " +
      "Map-side partial agg on (doc, char) collapses the explode " +
      "before any shuffle; the shuffled key space is docs × alphabet — " +
      "tiny at any corpus size. (A shuffle-free sorted-runs HOF form " +
      "was tried and rejected: nested array HOFs referencing a shared " +
      "subtree re-evaluate it PER ELEMENT — no CSE inside lambdas, the " +
      "dedup tier's documented lesson — turning one array_sort per doc " +
      "into thousands.)",
    (s, d) => {
      // split("") emits the char array in ONE pass over the string; the
      // former transform(sequence(1, n), i => substr(i, 1)) paid an
      // O(i) byte-offset walk per element — O(n²) per doc. Wash at
      // sf0.1 (fixture docs are a few hundred chars, the groupBy
      // dominates — ~2.5 s either way); the quadratic term is what
      // matters on real long-document corpora. (split works on UTF-16
      // code units vs the oracle's code points: identical through the
      // BMP — CJK included — and the fixtures contain no supplementary
      // chars.)
      val cc = t(s, d, "documents")
        .select(col("doc_id"),
          explode(split(col("text"), "")).as("c"))
        .groupBy("doc_id", "c").agg(count(lit(1)).as("cnt"))
      cc.groupBy("doc_id")
        .agg(sum("cnt").as("n"),
          sum(round(col("cnt") * log2(col("cnt")) * 1e6, 0).cast(LongType))
            .as("s_micro"))
        .select(col("doc_id"), col("n"), col("s_micro"),
          round(log2(col("n")) - col("s_micro") / (col("n") * lit(1e6)), 3)
            .as("entropy"))
        .transform(graft.engine.Ops.reportSort("doc_id"))
    },
    Some("""WITH ch AS (SELECT doc_id, substr(text, CAST(i AS INT), 1) AS c
                        FROM (SELECT doc_id, text,
                                     unnest(range(1, len(text) + 1)) AS i
                              FROM documents)),
                 cc AS (SELECT doc_id, c, count(*) AS cnt
                        FROM ch GROUP BY doc_id, c),
                 agg AS (SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n,
                                CAST(sum(CAST(round(cnt * log2(cnt) * 1000000, 0)
                                              AS BIGINT)) AS BIGINT) AS s_micro
                         FROM cc GROUP BY doc_id)
            SELECT doc_id, n, s_micro,
                   round(log2(n) - s_micro / (n * 1000000.0), 3) AS entropy
            FROM agg ORDER BY doc_id"""))

  val all: Seq[Q] = Seq(a23, w14, w15, j19, semdedup, entropy)
}
