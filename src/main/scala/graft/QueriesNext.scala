package graft

import graft.engine.Ck.Ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.{IntegerType, LongType}

import graft.engine.Engine
import graft.operators.{Graph, Similarity, TopKAggregator, TextAnalysis => TA}

/** Round-2 late-extension tier: event-sequence windows, grouping sets,
  * the typed top-k UDAF as a graded query, and large-scale curation ops
  * (benchmark decontamination, interval-overlap join).
  *
  * Scale posture is the same as everywhere else in the inventory: one
  * shuffle on the natural partition key per operator, broadcast only
  * provably-bounded sides, no driver-side loops.
  */
object QueriesNext {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Engine.table(s, dir, name)

  /** Cents-exact double sum (IEEE-exact regardless of partition order):
    * round to integral cents, sum as long, divide once.
    */
  private def centsSum(c: Column): Column =
    sum(round(c * 100, 0).cast(LongType)) / 100.0

  // ------------------------------------------------------------- w7: lag/lead

  private val w7 = Q(
    "w7_lag_lead",
    "Per-user event sequencing: inter-arrival gap (exact µs via " +
      "unix_micros, no float epoch) and next-event lookahead — one " +
      "shuffle on user_id, state bounded per partition",
    (s, d) => {
      val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
      t(s, d, "events")
        .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
        .withColumn("gap_us",
          unix_micros(col("ts")) - unix_micros(lag("ts", 1).over(byUser)))
        .withColumn("next_type", lead("event_type", 1).over(byUser))
        .select("user_id", "event_id", "gap_us", "next_type")
        .orderBy("user_id", "event_id")
    },
    Some("""SELECT user_id, event_id,
                   epoch_us(ts) - epoch_us(lag(ts) OVER w) AS gap_us,
                   lead(event_type) OVER w AS next_type
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ORDER BY user_id, event_id"""))

  // --------------------------------------------- w8: integer z-score anomaly

  private val w8 = Q(
    "w8_anomaly_zscore",
    "Per-user anomaly flagging: |x − mean| > 2σ against the user's own " +
      "history, computed ENTIRELY in integers — the test is algebraically " +
      "rearranged to (n·x − S)² > 4·(n·Sq − S²) over cents sums, so no " +
      "float mean/variance ever materializes (a float σ is shuffle-order " +
      "nondeterministic in the low bits and can flip the comparison on " +
      "boundary rows, breaking any hash-graded compare). One shuffle: " +
      "n/S/Sq ride a single user_id window, no join-back. Magnitudes: " +
      "cents ≤ 10^5 and n ≤ 10^3 per user put the largest term (dev² ≤ " +
      "(2·10^8)² = 4·10^16) ~230× under Long.MaxValue; bigger users or " +
      "values need DECIMAL(38,0) — scale the bound from dev², not S.",
    (s, d) => {
      val byUser = Window.partitionBy("user_id")
      t(s, d, "events")
        .select(col("event_id"), col("user_id"),
          round(col("value") * 100, 0).cast(LongType).as("cents"))
        .withColumn("n", count(lit(1)).over(byUser))
        .withColumn("sc", sum("cents").over(byUser))
        .withColumn("sq", sum(col("cents") * col("cents")).over(byUser))
        .withColumn("dev", col("n") * col("cents") - col("sc"))
        .select(col("event_id"), col("user_id"), col("cents"),
          // all-LONG products (pow() would round-trip through double)
          (col("dev") * col("dev") >
            lit(4L) * (col("n") * col("sq") - col("sc") * col("sc")))
            .as("is_anomaly"))
        .orderBy("event_id")
    },
    Some("""SELECT event_id, user_id, cents,
                   (n * cents - sc) * (n * cents - sc)
                     > 4 * (n * sq - sc * sc) AS is_anomaly
            FROM (SELECT event_id, user_id, cents,
                         CAST(count(*) OVER w AS BIGINT) AS n,
                         CAST(sum(cents) OVER w AS BIGINT) AS sc,
                         CAST(sum(cents * cents) OVER w AS BIGINT) AS sq
                  FROM (SELECT event_id, user_id,
                               CAST(round(value * 100, 0) AS BIGINT) AS cents
                        FROM events)
                  WINDOW w AS (PARTITION BY user_id))
            ORDER BY event_id"""))

  // ------------------------------------------------------ a15: grouping sets

  private val a15 = Q(
    "a15_grouping_sets",
    "Explicit GROUPING SETS — (status, priority), (status), () — in one " +
      "aggregation pass with a portable grouping-flag id (partial-agg " +
      "applies to every set simultaneously; one shuffle total, vs three " +
      "separate groupBys = three shuffles + a union)",
    (s, d) =>
      t(s, d, "orders")
        .groupingSets(
          Seq(Seq(col("o_orderstatus"), col("o_orderpriority")),
            Seq(col("o_orderstatus")), Seq()),
          col("o_orderstatus"), col("o_orderpriority"))
        .agg(
          (grouping(col("o_orderstatus")).cast(IntegerType) * 2 +
            grouping(col("o_orderpriority")).cast(IntegerType)).as("gid"),
          count(lit(1)).as("n"),
          centsSum(col("o_totalprice")).as("total"))
        .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          col("gid"), col("n"), col("total"))
        .orderBy("gid", "status", "priority"),
    Some("""SELECT coalesce(o_orderstatus, 'ALL') AS status,
                   coalesce(o_orderpriority, 'ALL') AS priority,
                   CAST(grouping(o_orderstatus) * 2
                        + grouping(o_orderpriority) AS INT) AS gid,
                   count(*) AS n,
                   sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) / 100.0 AS total
            FROM orders
            GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                                    (o_orderstatus), ())
            ORDER BY gid, status, priority"""))

  // --------------------------------------------------------- a16: top-k UDAF

  private val a16 = Q(
    "a16_topk_agg",
    "Typed top-k Aggregator (SURVEY §2.7) as a graded query: top-5 line " +
      "items by price per return flag with O(k) state per group and " +
      "map-side partial aggregation — the window-function equivalent " +
      "(row_number over the full partition) buffers and sorts every row; " +
      "the UDAF's shuffle carries ≤k rows per map-side group",
    (s, d) => {
      import s.implicits._
      val rows = t(s, d, "lineitem")
        .select(col("l_returnflag"),
          (col("l_orderkey") * 10 + col("l_linenumber")).cast(LongType).as("id"),
          col("l_extendedprice").as("score"))
        .as[(String, Long, Double)]
      rows.groupByKey(_._1)
        .mapValues(r => (r._2, r._3))
        .agg(TopKAggregator.topK(5).toColumn.name("top"))
        .flatMap { case (flag, top) =>
          top.iterator.zipWithIndex.map { case ((id, sc), i) => (flag, i + 1, id, sc) }
        }
        .toDF("l_returnflag", "rank", "id", "score")
        .transform(graft.engine.Ops.reportSort("l_returnflag", "rank"))
    },
    Some("""SELECT l_returnflag, CAST(rank AS INT) AS rank, id, score FROM (
              SELECT l_returnflag,
                     row_number() OVER (PARTITION BY l_returnflag
                                        ORDER BY l_extendedprice DESC, id ASC) AS rank,
                     id, l_extendedprice AS score
              FROM (SELECT l_returnflag,
                           l_orderkey * 10 + l_linenumber AS id,
                           l_extendedprice
                    FROM lineitem))
            WHERE rank <= 5
            ORDER BY l_returnflag, rank"""))

  // ----------------------------------------- dedup: embedding-cosine pairs

  private val dedupCos = Q(
    "dedup_embedding_cosine",
    "Embedding-cosine near-dup (threshold form): hyperplane-LSH buckets " +
      "→ within-bucket exact cosine → keep pairs ≥ 0.95. The corpus has " +
      "no true near-dups, so ~10 jittered copies are PLANTED in-query " +
      "(deterministic per-coordinate noise, mirrored in the oracle) — " +
      "the threshold pass must recover exactly the planted pairs the LSH " +
      "bucketing preserves (one plant lands in a different bucket: a " +
      "real, deterministic LSH miss). Never enumerates cross-bucket " +
      "pairs; at scale composes with the capped bucket key of " +
      "sim_neardup_rerank for hot buckets.",
    (s, d) => {
      // ONE materialized corpus pass (localCheckpoint), self-joined: the
      // checkpoint both halves the sig/norm computation (it used to run
      // per join side — independent lineages were the dodge for Spark
      // 4.1's attribute dedup tripping on typedlit-bearing lambdas) and
      // cuts lineage so the NATIVE array_dot node is safe in the pair
      // cosine (above a derived self-join key, constraint inference
      // would otherwise mis-push a filter across sides — the documented
      // rerank bug). Norm once per ROW, not per pair: within a bucket of
      // n vectors the join evaluates O(n²) cosines — precomputing
      // sqrt(v·v) cuts each pair from three 64-element folds to one
      // fused-loop dot. Measured 2.5 s → 0.9 s at sf0.1.
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
      val corpus = base.unionByName(planted)
        .withColumn("sig", Similarity.hyperplaneSig(col("v"), nPlanes = 8, dim = 64))
        .withColumn("nrm", sqrt(Similarity.dotComposed(col("v"), col("v"))))
        .ckpt(true)
      val a = corpus.select(col("id").as("id_a"), col("sig"),
        col("v").as("va"), col("nrm").as("na"))
      val b = corpus.select(col("id").as("id_b"), col("sig"),
        col("v").as("vb"), col("nrm").as("nb"))
      a.join(b, Seq("sig")).filter(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"),
          round(Similarity.dot(col("va"), col("vb")) /
            (col("na") * col("nb")), 6).as("cos"))
        .filter(col("cos") >= 0.95)
        // BIGINT micros on the output surface (threshold keeps the 6-dp
        // double): float cells are hash-canonicalization hazards
        .select(col("id_a"), col("id_b"),
          round(col("cos") * 1e6, 0).cast(LongType).as("cos_micro"))
        .transform(graft.engine.Ops.reportSort("id_a", "id_b"))
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
            sig AS (
              SELECT id, v,
                     (SELECT sum(CASE WHEN (
                        SELECT sum(v[i+1] * CAST((p*131 + i*31 + 7) % 13 - 6 AS DOUBLE))
                        FROM (SELECT unnest(range(0, 64)) AS i)) > 0
                        THEN 1::BIGINT << p ELSE 0 END)
                      FROM (SELECT unnest(range(0, 8)) AS p)) AS sig
              FROM corpus),
            pairs AS (
              SELECT a.id AS id_a, b.id AS id_b,
                     round(list_dot_product(a.v, b.v) /
                           (sqrt(list_dot_product(a.v, a.v)) *
                            sqrt(list_dot_product(b.v, b.v))), 6) AS cos
              FROM sig a JOIN sig b ON a.sig = b.sig AND a.id < b.id)
            SELECT id_a, id_b,
                   CAST(round(cos * 1e6, 0) AS BIGINT) AS cos_micro
            FROM pairs WHERE cos >= 0.95
            ORDER BY id_a, id_b"""))

  // ------------------------------------------- curation: decontamination

  private val contam = Q(
    "curate_contamination",
    "Benchmark decontamination: 4-gram shingle overlap between the " +
      "training corpus and a held-out eval set (docs with doc_id % 97 " +
      "== 0 stand in for the benchmark). The eval shingle set is " +
      "BROADCAST (benchmark suites are MBs even when the corpus is " +
      "100 TB), so the overlap probe is a map-side hash join over the " +
      "corpus — no corpus shuffle; per-doc hit counts + contamination " +
      "ratio come from one groupBy on doc_id.",
    (s, d) => {
      val docs = t(s, d, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
      val gs = docs.select(col("doc_id"),
        TA.ngramShinglesFromToks(col("toks"), 4).as("gs"))
      // grams travel as xxhash64 longs, not 4-word strings: the explode
      // stream and the broadcast set carry 8 bytes per gram (collision
      // odds at corpus scale ~n²/2⁶⁴ — vanishing), and ONE left join
      // feeds both counts, so the gram stream is built and scanned once
      // (the separate hits/totals/held passes re-evaluated the shingle
      // transform 3× — measured 8.3 s at sf0.1, ~4× this shape)
      val ex = gs.select(col("doc_id"),
        explode(transform(col("gs"), g => xxhash64(g))).as("g"))
      val held = ex.filter(col("doc_id") % 97 === 0)
        .select("g").distinct().withColumn("hit", lit(1))
      ex.filter(col("doc_id") % 97 =!= 0)
        .join(broadcast(held), Seq("g"), "left")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_shingles"), count(col("hit")).as("n_hits"))
        .filter(col("n_hits") > 0)
        .select(col("doc_id"), col("n_shingles"), col("n_hits"),
          round(col("n_hits").cast("double") / col("n_shingles"), 6).as("ratio"))
        .transform(graft.engine.Ops.reportSort("doc_id"))
    },
    Some("""WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
            sh AS (SELECT doc_id,
                          list_distinct([array_to_string(toks[i+1:i+4], ' ')
                                         FOR i IN range(0, len(toks)-3)]) AS gs
                   FROM d WHERE len(toks) >= 4),
            ex AS (SELECT doc_id, unnest(gs) AS g FROM sh),
            held AS (SELECT DISTINCT g FROM ex WHERE doc_id % 97 = 0),
            corp AS (SELECT doc_id, g FROM ex WHERE doc_id % 97 <> 0),
            hits AS (SELECT doc_id, count(*) AS n_hits
                     FROM corp JOIN held USING (g) GROUP BY doc_id),
            totals AS (SELECT doc_id, count(*) AS n_shingles
                       FROM corp GROUP BY doc_id)
            SELECT doc_id, n_shingles, n_hits,
                   round(CAST(n_hits AS DOUBLE) / n_shingles, 6) AS ratio
            FROM hits JOIN totals USING (doc_id)
            ORDER BY doc_id"""))

  // ------------------------------------------- j16: banded interval overlap

  private val j16 = Q(
    "j16_interval_overlap",
    "Large-large interval-overlap join, banded: both interval sets " +
      "(order activity spans × campaign windows derived from part) " +
      "explode into fixed 32-day bands, equi-join on the band key, then " +
      "exact overlap predicate + pair dedup. Band width ≥ max interval " +
      "length ⇒ ≤2 bands per interval, so the shuffle is a plain hash " +
      "equi-join at any scale — no broadcast requirement on either side " +
      "and never the O(n·m) nested loop a raw range predicate plans " +
      "(contrast j11_range_join, where one side is genuinely tiny and " +
      "broadcast-NL is the right call).",
    (s, d) => {
      val base = to_date(lit("1995-01-01"))
      val o = t(s, d, "orders").select(
        col("o_orderkey"), col("o_totalprice"),
        datediff(col("o_orderdate"), base).as("sa"))
        .withColumn("ea", col("sa") + 1 + col("o_orderkey") % 14)
      val c = t(s, d, "part").select(
        col("p_partkey").as("campaign_id"),
        ((col("p_partkey") * 13) % 2400).as("sb"))
        .withColumn("eb", col("sb") + 10 + col("campaign_id") % 20)
      def banded(df: DataFrame, lo: String, hi: String) =
        df.withColumn("band",
          explode(sequence((col(lo) / 32).cast(IntegerType),
            (col(hi) / 32).cast(IntegerType))))
      // pre-aggregate the fact side on its interval key first: (sa, ea)
      // has ≤ span·durations distinct values (~33k here) at ANY row
      // count, so the pair stream the join enumerates stops growing
      // with the table (measured 5× fewer pairs at sf0.1; at 100 TB
      // this is the difference between joining 33k interval groups and
      // joining every row)
      val og = o.groupBy("sa", "ea").agg(count(lit(1)).as("n_ord"),
        sum(round(col("o_totalprice") * 100, 0).cast(LongType)).as("cents"))
      // one-band-per-pair dedup: a pair can share 2 bands, but its
      // overlap START max(sa,sb) lies in exactly one — keep the match
      // only there. No distinct: the pair stream goes straight into
      // map-side partial aggregation instead of materializing a wide
      // dedup hash (measured: the distinct version GC-stalled an 8 GB
      // driver for 6 min at sf0.1; this shape streams).
      // pin the join's parallelism: the band shuffle is tiny (33k + 20k
      // rows) so AQE coalesces it to 2-3 tasks, but the JOIN OUTPUT is
      // the ~13M-pair stream — the classic input-sized-vs-output-sized
      // misestimate. An explicit fixed-width repartition on the key
      // blocks the coalesce and spreads the pair enumeration.
      // CPU-dense pair enumeration: 2x-floor parallelism (round 14)
      val parts = graft.engine.Engine.computeParts(s, d)
      val pairs = banded(og, "sa", "ea").repartition(parts, col("band"))
        .join(banded(c, "sb", "eb"), Seq("band"))
        .filter(col("sa") <= col("eb") && col("sb") <= col("ea") &&
          col("band") === (greatest(col("sa"), col("sb")) / 32).cast(IntegerType))
      pairs.groupBy("campaign_id", "sb", "eb")
        .agg(sum("n_ord").as("n_orders"), (sum("cents") / 100.0).as("total"))
        .transform(graft.engine.Ops.reportSort("campaign_id"))
    },
    Some("""WITH o AS (SELECT o_orderkey, o_totalprice,
                              date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS sa,
                              date_diff('day', TIMESTAMP '1995-01-01', o_orderdate)
                                + 1 + o_orderkey % 14 AS ea
                       FROM orders),
                 c AS (SELECT p_partkey AS campaign_id,
                              (p_partkey * 13) % 2400 AS sb,
                              (p_partkey * 13) % 2400 + 10 + p_partkey % 20 AS eb
                       FROM part)
            SELECT campaign_id, sb, eb, count(*) AS n_orders,
                   sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) / 100.0 AS total
            FROM c JOIN o ON sa <= eb AND sb <= ea
            GROUP BY campaign_id, sb, eb
            ORDER BY campaign_id"""))

  // ---------------------------------------------- mm: video frame sampling

  private val mmFrames = Q(
    "mm_frame_sample",
    "Video frame-sampling plumbing: synthesize a container per doc " +
      "(4-byte magic, 4-byte big-endian frame count, fixed 4-byte " +
      "frames), then the sampling pass reads ONLY the payload bytes — " +
      "parses the frame count back out of the header, explodes every " +
      "3rd frame index, and slices each sampled frame by computed byte " +
      "offset (Column.substr with a per-row position). Pure codegen'd " +
      "column expressions, map-side only — at scale this is the shape " +
      "that feeds frame batches to a decode kernel without ever " +
      "shuffling payload bytes. The oracle computes the expected " +
      "samples independently, so the graded check is that build→parse " +
      "round-trips the container layout exactly.",
    (s, d) => {
      val nf = (lit(4) + col("doc_id") % 8).cast(IntegerType)
      val framesHex = array_join(transform(sequence(lit(0), nf - 1),
        f => lpad(hex((col("doc_id") * 1000003 + f * 97) % lit(4294967296L)), 8, "0")), "")
      val payload = unhex(concat(
        lit("47564944"), lpad(hex(nf.cast(LongType)), 8, "0"), framesHex))
      val media = t(s, d, "documents").select(col("doc_id"), payload.as("payload"))
      val nfParsed = conv(hex(substring(col("payload"), 5, 4)), 16, 10).cast(IntegerType)
      media
        .withColumn("frame_idx", explode(sequence(lit(0), nfParsed - 1, lit(3))))
        .select(col("doc_id"),
          col("frame_idx").cast(LongType).as("frame_idx"),
          (lit(9) + col("frame_idx") * 4).cast(IntegerType).as("byte_offset"),
          conv(hex(col("payload").substr(lit(9) + col("frame_idx") * 4, lit(4))), 16, 10)
            .cast(LongType).as("frame_val"))
        .transform(graft.engine.Ops.reportSort("doc_id", "frame_idx"))
    },
    Some("""WITH f AS (SELECT doc_id, unnest(range(0, 4 + doc_id % 8, 3)) AS f
                       FROM documents)
            SELECT doc_id, f AS frame_idx,
                   CAST(9 + f * 4 AS INT) AS byte_offset,
                   (doc_id * 1000003 + f * 97) % 4294967296 AS frame_val
            FROM f ORDER BY doc_id, frame_idx"""))

  // ------------------------------------------------- p10: SCD2 history build

  private val p10 = Q(
    "p10_scd2_history",
    "Slowly-changing-dimension (type 2) history build via gaps-and-" +
      "islands: per-customer status runs become validity intervals — " +
      "change marker (lag) → running island id → per-island min/count → " +
      "valid_to = next island's valid_from (lead), open interval = " +
      "current row. Every window is keyed on the customer, so the whole " +
      "build is one hash shuffle; no self-join against the history.",
    (s, d) => {
      val byCust = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      val marked = t(s, d, "orders")
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"), col("o_orderstatus"))
        .withColumn("chg",
          when(lag("o_orderstatus", 1).over(byCust).isNull ||
            lag("o_orderstatus", 1).over(byCust) =!= col("o_orderstatus"), 1)
            .otherwise(0))
        .withColumn("island", sum("chg").over(
          byCust.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val islands = marked.groupBy("o_custkey", "island", "o_orderstatus")
        .agg(min("o_orderdate").as("valid_from"), count(lit(1)).as("n_orders"))
      val byIsland = Window.partitionBy("o_custkey").orderBy("island")
      islands
        .withColumn("valid_to", lead("valid_from", 1).over(byIsland))
        .withColumn("is_current", col("valid_to").isNull)
        .select("o_custkey", "island", "o_orderstatus", "valid_from",
          "valid_to", "is_current", "n_orders")
        .orderBy("o_custkey", "island")
    },
    Some("""WITH marked AS (
              SELECT o_custkey, o_orderkey, o_orderdate, o_orderstatus,
                     CASE WHEN lag(o_orderstatus) OVER w IS NULL
                            OR lag(o_orderstatus) OVER w <> o_orderstatus
                          THEN 1 ELSE 0 END AS chg
              FROM orders
              WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)),
            isl AS (
              SELECT *, CAST(sum(chg) OVER
                (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS island
              FROM marked),
            g AS (
              SELECT o_custkey, island, o_orderstatus,
                     min(o_orderdate) AS valid_from, count(*) AS n_orders
              FROM isl GROUP BY o_custkey, island, o_orderstatus)
            SELECT o_custkey, island, o_orderstatus, valid_from,
                   lead(valid_from) OVER w2 AS valid_to,
                   lead(valid_from) OVER w2 IS NULL AS is_current,
                   n_orders
            FROM g WINDOW w2 AS (PARTITION BY o_custkey ORDER BY island)
            ORDER BY o_custkey, island"""))

  // ------------------------------------------------- p11: MERGE / upsert

  private val p11 = Q(
    "p11_upsert_merge",
    "MERGE INTO semantics (CDC upsert batch): deterministic updates " +
      "(U: reassign segment + adjust balance, D: delete, I: new keys) " +
      "applied to the customer base via ONE full outer join on the key " +
      "+ J5 coalesce precedence — matched-U takes update values, " +
      "matched-D drops, unmatched-I inserts, untouched base rows pass " +
      "through. Full outer can't broadcast, and shouldn't: at scale " +
      "this is one hash-partitioned merge join on the key — the same " +
      "plan a lakehouse MERGE executes.",
    (s, d) => {
      val base = t(s, d, "customer")
      def k = col("c_custkey")
      val dels = base.filter(k % 11 === 0)
        .select(k.as("k"), lit("D").as("op"),
          lit(null).cast("string").as("u_seg"), lit(null).cast("double").as("u_bal"))
      val upds = base.filter(k % 11 =!= 0 && k % 7 === 0)
        .select(k.as("k"), lit("U").as("op"),
          lit("REASSIGNED").as("u_seg"), (col("c_acctbal") + 100).as("u_bal"))
      val ins = base.filter(k % 13 === 0)
        .select((k + 1000000000000L).as("k"), lit("I").as("op"),
          lit("INSERTED").as("u_seg"), (k % 1000).cast("double").as("u_bal"))
      val updates = dels.unionByName(upds).unionByName(ins)
      base.join(updates, k === col("k"), "full_outer")
        .filter(coalesce(col("op"), lit("")) =!= "D")
        .select(
          coalesce(col("c_custkey"), col("k")).as("c_custkey"),
          coalesce(col("u_seg"), col("c_mktsegment")).as("c_mktsegment"),
          coalesce(col("u_bal"), col("c_acctbal")).as("c_acctbal"),
          when(col("op").isNull, "kept")
            .when(col("op") === "U", "updated")
            .otherwise("inserted").as("src"))
        .transform(graft.engine.Ops.reportSort("c_custkey"))
    },
    Some("""WITH upd AS (
              SELECT c_custkey AS k, 'D' AS op,
                     CAST(NULL AS VARCHAR) AS u_seg, CAST(NULL AS DOUBLE) AS u_bal
              FROM customer WHERE c_custkey % 11 = 0
              UNION ALL
              SELECT c_custkey, 'U', 'REASSIGNED', c_acctbal + 100
              FROM customer WHERE c_custkey % 11 <> 0 AND c_custkey % 7 = 0
              UNION ALL
              SELECT c_custkey + 1000000000000, 'I', 'INSERTED',
                     CAST(c_custkey % 1000 AS DOUBLE)
              FROM customer WHERE c_custkey % 13 = 0)
            SELECT coalesce(c.c_custkey, u.k) AS c_custkey,
                   coalesce(u.u_seg, c.c_mktsegment) AS c_mktsegment,
                   coalesce(u.u_bal, c.c_acctbal) AS c_acctbal,
                   CASE WHEN u.op IS NULL THEN 'kept'
                        WHEN u.op = 'U' THEN 'updated'
                        ELSE 'inserted' END AS src
            FROM customer c FULL OUTER JOIN upd u ON c.c_custkey = u.k
            WHERE coalesce(u.op, '') <> 'D'
            ORDER BY c_custkey"""))

  // ------------------------------------------------- a17: fixed-width histogram

  private val a17 = Q(
    "a17_histogram",
    "Fixed-width histogram (20 × 25k buckets over order totals, top " +
      "bucket open): bucket id is a pure map-side expression, so the " +
      "whole histogram is one partial-agg'd groupBy on ≤20 keys — the " +
      "shuffle carries 20 rows per map task regardless of input size",
    (s, d) => {
      val bucket = least(floor(col("o_totalprice") / 25000.0), lit(19.0)).cast(LongType)
      t(s, d, "orders")
        .select(bucket.as("bucket"), col("o_totalprice"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"), centsSum(col("o_totalprice")).as("total"))
        .withColumn("lo", (col("bucket") * 25000).cast("double"))
        .select("bucket", "lo", "n", "total")
        .transform(graft.engine.Ops.reportSort("bucket"))
    },
    Some("""SELECT CAST(least(floor(o_totalprice / 25000.0), 19) AS BIGINT) AS bucket,
                   CAST(least(floor(o_totalprice / 25000.0), 19) * 25000 AS DOUBLE) AS lo,
                   count(*) AS n,
                   sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) / 100.0 AS total
            FROM orders GROUP BY 1, 2 ORDER BY bucket"""))

  // --------------------------------------------- a18: physical top-k per key

  private val a18 = Q(
    "a18_topk_physical",
    "Per-key top-k via the custom physical operator " +
      "(plans.TopKPerKey: LogicalPlan + Strategy + two-phase SparkPlan " +
      "with bounded per-partition heaps): top-3 orders by price per " +
      "priority class. Identical answer to the window row_number form " +
      "— the oracle IS that SQL — but the shuffle carries ≤k rows per " +
      "key per map partition instead of sorting every group in full.",
    (s, d) => {
      val topk = graft.plans.TopKPerKey(
        t(s, d, "orders").select("o_orderpriority", "o_orderkey", "o_totalprice"),
        Seq("o_orderpriority"),
        Seq(col("o_totalprice").desc, col("o_orderkey").asc), 3)
      // rank the ≤ 5·3 survivors (the window below never sees more rows)
      topk.withColumn("rank", row_number().over(
          Window.partitionBy("o_orderpriority")
            .orderBy(desc("o_totalprice"), col("o_orderkey"))))
        .select(col("o_orderpriority"), col("rank"),
          col("o_orderkey"), col("o_totalprice"))
        .transform(graft.engine.Ops.reportSort("o_orderpriority", "rank"))
    },
    Some("""SELECT o_orderpriority, CAST(rank AS INT) AS rank, o_orderkey, o_totalprice
            FROM (SELECT o_orderpriority, o_orderkey, o_totalprice,
                         row_number() OVER (PARTITION BY o_orderpriority
                                            ORDER BY o_totalprice DESC, o_orderkey)
                           AS rank
                  FROM orders)
            WHERE rank <= 3
            ORDER BY o_orderpriority, rank"""))

  // ---------------------------------------------- w9: time-decayed aggregate

  private val w9 = Q(
    "w9_time_decay",
    "Per-user time-decayed value sum (half-life 7 days, capped at 20 " +
      "half-lives): weight = 2^-floor(age/7d) is a dyadic rational, so " +
      "the whole sum runs as an INTEGER sum of cents·2^(20-k) — exact at " +
      "any cardinality and order-independent under map-side partial agg " +
      "(a float-decay EWMA could never hash-match across engines; even " +
      "per-term-exact doubles lose exactness once a user's total passes " +
      "2^53·2^-20 cents). One double division at the end; long overflow " +
      "needs ~10^7 max-value events per user — document, don't fear. " +
      "Reference age comes from a broadcast 1-row max, not a driver " +
      "scalar.",
    (s, d) => {
      val ev = t(s, d, "events").select(col("user_id"), col("ts"),
        round(col("value") * 100, 0).cast(LongType).as("cents"))
      val mx = ev.agg(max("ts").as("max_ts"))
      ev.crossJoin(broadcast(mx))
        .withColumn("k", least(
          expr("((unix_micros(max_ts) - unix_micros(ts)) div 86400000000) div 7"),
          lit(20L)))
        .withColumn("scaled",
          expr("cents * shiftleft(CAST(1 AS BIGINT), CAST(20 - k AS INT))"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_events"),
          (sum("scaled") / lit(104857600.0)).as("decayed_value")) // 2^20 · 100
        .transform(graft.engine.Ops.reportSort("user_id"))
    },
    Some("""WITH mx AS (SELECT max(ts) AS max_ts FROM events),
            k AS (SELECT user_id,
                         CAST(round(value * 100, 0) AS BIGINT) AS cents,
                         least(((epoch_us(max_ts) - epoch_us(ts)) // 86400000000) // 7,
                               20) AS k
                  FROM events, mx)
            SELECT user_id, count(*) AS n_events,
                   CAST(sum(cents * (CAST(1 AS BIGINT) << CAST(20 - k AS INT)))
                        AS BIGINT) / CAST(104857600 AS DOUBLE) AS decayed_value
            FROM k GROUP BY user_id ORDER BY user_id"""))

  // ----------------------------------------------- g1: integer PageRank

  private val g2 = Q(
    "g2_graph_projection",
    "Bipartite projection with per-node caps: suppliers co-purchased by " +
      "the same customer become weighted supplier-supplier edges. The " +
      "cap is the scale story — a hot customer touching S suppliers " +
      "would emit S² pairs, so each customer's supplier list is sorted " +
      "and truncated to 20 BEFORE pair enumeration (≤190 pairs per " +
      "customer at any corpus size; the same bounded-blowup discipline " +
      "as the LSH bucket caps). Pairs are generated by a nested " +
      "sequence/transform HOF inside the aggregation's projection — " +
      "no self-join. Shuffle budget: the orders⋈lineitem edge build " +
      "shuffles on orderkey once facts outgrow broadcast, then one " +
      "customer-key shuffle and the pair groupBy; top-50 via " +
      "TakeOrdered.",
    (s, d) =>
      // top-50 of the memoized top-2000 backbone — identical to top-50 of
      // the full pair set (same total order cuts both)
      Graph.backbone(s, d)
        .orderBy(col("n_shared").desc, col("a"), col("b"))
        .limit(50),
    Some("""WITH ed AS (SELECT DISTINCT o_custkey AS c, l_suppkey AS s
                        FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
            cap AS (SELECT c, list_sort(list(DISTINCT s))[1:20] AS ss
                    FROM ed GROUP BY c),
            pr AS (SELECT unnest(flatten(list_transform(range(1, len(ss)),
                     i -> list_transform(range(i + 1, len(ss) + 1),
                       j -> {'a': ss[i], 'b': ss[j]})))) AS p
                   FROM cap WHERE len(ss) >= 2)
            SELECT p.a AS a, p.b AS b, count(*) AS n_shared
            FROM pr GROUP BY p.a, p.b
            ORDER BY n_shared DESC, a, b LIMIT 50"""))

  private val g1 = Q(
    "g1_pagerank",
    "PageRank (5 rounds, integer arithmetic) over the customer↔supplier " +
      "trade graph: operators.Graph.pageRankInt — contribution sums are " +
      "integers, so every round is order-independent and bit-exact " +
      "across engines (float PageRank can't be hash-graded). Two " +
      "shuffles per round, ranks checkpointed round-over-round, blocks " +
      "freed eagerly; the oracle replays all 5 rounds in SQL.",
    (s, d) => {
      // memoized distinct (c, s) trade edges (Graph.tradeEdges) — the
      // dedup inside pageRankInt rides the already-distinct frame.
      // parts=8: the ~700k-edge frame is a few MB, and a 32-way cached
      // partitioning makes all 10 per-round stages pay 32 near-empty
      // tasks (measured 5.6 s → 3.2 s at 8; 4/8/16 within noise)
      // encoding guard (ADVICE r8): the +1M supplier offset needs every
      // customer key BELOW 1,000,000 — around sf≈7 customer keys cross
      // it, which would silently collide the two key spaces (breaking
      // both the disjoint-space distinctness argument behind
      // assumeDistinct and the node encoding itself). A row-level
      // raise_error makes that fail LOUDLY instead: codegen'd compare,
      // no extra job, no value change below the threshold.
      val fwd = Graph.tradeEdges(s, d).select(
        when(col("c") < 1000000L, col("c"))
          .otherwise(raise_error(concat(
            lit("g1_pagerank: c_custkey "), col("c"),
            lit(" >= 1e6 breaks the supplier-offset node encoding"))))
          .as("src"),
        (col("s") + 1000000).as("dst"))
      val edges = fwd.unionByName(fwd.select(col("dst").as("src"), col("src").as("dst")))
      // assumeDistinct: tradeEdges is DISTINCT and the +1M offset puts
      // the two orientations in disjoint key spaces, so the union is
      // globally duplicate-free — the loop's dedup pass is pure cost.
      // parts=4 (round 10, was 8): ~33k nodes / 1.2M edges — 4
      // partitions keep each round's agg a few hundred-k rows per task
      // while halving the per-stage task floor (112 → 68 tasks); at
      // corpus scale pass a real parallelism
      // symmetricEdges: edges = fwd UNION reversed(fwd) by construction
      Graph.pageRankInt(edges, 5, parts = 4, assumeDistinct = true,
        symmetricEdges = true)
        // ~33k-row output: one-partition sort skips the range-sampling
        // job (corpus scale: range orderBy)
        .coalesce(1).sortWithinPartitions("node")
    },
    Some("""WITH fwd AS (SELECT DISTINCT o_custkey AS src, l_suppkey + 1000000 AS dst
                         FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
            edges AS (SELECT src, dst FROM fwd UNION SELECT dst, src FROM fwd),
            nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
            outdeg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
            r0 AS (SELECT node, 1000000 AS rank FROM nodes),
            r1 AS (SELECT n.node,
                          150000 + (850 * coalesce(sum(r.rank // o.deg), 0)) // 1000 AS rank
                   FROM nodes n
                   LEFT JOIN edges e ON e.dst = n.node
                   LEFT JOIN r0 r ON r.node = e.src
                   LEFT JOIN outdeg o ON o.src = e.src
                   GROUP BY n.node),
            r2 AS (SELECT n.node,
                          150000 + (850 * coalesce(sum(r.rank // o.deg), 0)) // 1000 AS rank
                   FROM nodes n
                   LEFT JOIN edges e ON e.dst = n.node
                   LEFT JOIN r1 r ON r.node = e.src
                   LEFT JOIN outdeg o ON o.src = e.src
                   GROUP BY n.node),
            r3 AS (SELECT n.node,
                          150000 + (850 * coalesce(sum(r.rank // o.deg), 0)) // 1000 AS rank
                   FROM nodes n
                   LEFT JOIN edges e ON e.dst = n.node
                   LEFT JOIN r2 r ON r.node = e.src
                   LEFT JOIN outdeg o ON o.src = e.src
                   GROUP BY n.node),
            r4 AS (SELECT n.node,
                          150000 + (850 * coalesce(sum(r.rank // o.deg), 0)) // 1000 AS rank
                   FROM nodes n
                   LEFT JOIN edges e ON e.dst = n.node
                   LEFT JOIN r3 r ON r.node = e.src
                   LEFT JOIN outdeg o ON o.src = e.src
                   GROUP BY n.node),
            r5 AS (SELECT n.node,
                          150000 + (850 * coalesce(sum(r.rank // o.deg), 0)) // 1000 AS rank
                   FROM nodes n
                   LEFT JOIN edges e ON e.dst = n.node
                   LEFT JOIN r4 r ON r.node = e.src
                   LEFT JOIN outdeg o ON o.src = e.src
                   GROUP BY n.node)
            SELECT node, CAST(rank AS BIGINT) AS rank FROM r5 ORDER BY node"""))

  // ---------------------------------------- curation: end-to-end pipeline

  private val curPipe = Q(
    "curate_pipeline_e2e",
    "The full curation DAG in one lineage — quality gate (score + " +
      "language) → exact dedup (min doc per content hash, window not " +
      "join) → benchmark decontamination (broadcast eval 4-gram set, " +
      "anti-join) → stable-hash shard assignment with per-shard " +
      "doc/token accounting. Three shuffles total (dedup hash, " +
      "contamination doc-distinct, shard agg); the corpus text streams " +
      "map-side through every gate. This is the operator composition a " +
      "training-data run executes end to end.",
    (s, d) => {
      val docs = t(s, d, "documents")
        .select(col("doc_id"), col("text"), split(col("text"), " ").as("toks"))
      def gramsOf(c: Column): Column = TA.ngramShinglesFromToks(c, 4)
      // quality gates evaluate over the MATERIALIZED token array — the
      // text-based forms would re-tokenize the full corpus per metric
      val kept = docs.filter(col("doc_id") % 97 =!= 0)
        .filter(TA.qualityScoreFromToks(col("toks")) >= 0.3 &&
          TA.langIdEnFromToks(col("toks")) === "en")
      val byContent = Window.partitionBy(md5(col("text")))
      val deduped = kept
        .withColumn("keep_id", min("doc_id").over(byContent))
        .filter(col("doc_id") === col("keep_id"))
        .select("doc_id", "text", "toks")
      val heldGrams = docs.filter(col("doc_id") % 97 === 0)
        .select(explode(gramsOf(col("toks"))).as("g")).distinct()
      val contaminated = deduped
        .select(col("doc_id"), explode(gramsOf(col("toks"))).as("g"))
        .join(broadcast(heldGrams), "g")
        .select("doc_id").distinct()
      val clean = deduped.join(contaminated, Seq("doc_id"), "left_anti")
      clean
        .select((conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
          .cast(LongType) % 8).as("shard"),
          size(col("toks")).as("n_toks"))
        .groupBy("shard")
        .agg(count(lit(1)).as("n_docs"), sum("n_toks").as("n_tokens"))
        .transform(graft.engine.Ops.reportSort("shard"))
    },
    Some("""WITH d AS (SELECT doc_id, text, string_split(text, ' ') AS toks
                       FROM documents),
            scored AS (
              SELECT doc_id, text, toks,
                     round(least(CAST(1.0 AS DOUBLE), len(toks) / 100.0) *
                           (1.0 - len(list_filter(toks,
                              x -> x IN ('the','a','of','and','to'))) / len(toks)), 6)
                       AS q,
                     CASE WHEN len(list_filter(toks,
                            x -> x IN ('the','a','of','and','to'))) /
                          len(toks) > 0.05
                          THEN 'en' ELSE 'other' END AS lang
              FROM d),
            kept AS (SELECT doc_id, text, toks FROM scored
                     WHERE doc_id % 97 <> 0 AND q >= 0.3 AND lang = 'en'),
            dedup AS (SELECT doc_id, text, toks FROM kept
                      QUALIFY doc_id = min(doc_id) OVER (PARTITION BY md5(text))),
            heldsh AS (SELECT list_distinct([array_to_string(toks[i+1:i+4], ' ')
                                             FOR i IN range(0, len(toks)-3)]) AS gs
                       FROM d WHERE doc_id % 97 = 0 AND len(toks) >= 4),
            heldg AS (SELECT DISTINCT unnest(gs) AS g FROM heldsh),
            dsh AS (SELECT doc_id, list_distinct([array_to_string(toks[i+1:i+4], ' ')
                                                  FOR i IN range(0, len(toks)-3)]) AS gs
                    FROM dedup WHERE len(toks) >= 4),
            contaminated AS (
              SELECT DISTINCT doc_id
              FROM (SELECT doc_id, unnest(gs) AS g FROM dsh) x
              JOIN heldg USING (g)),
            clean AS (SELECT * FROM dedup
                      WHERE doc_id NOT IN (SELECT doc_id FROM contaminated))
            SELECT ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 8
                     AS shard,
                   count(*) AS n_docs,
                   CAST(sum(len(toks)) AS BIGINT) AS n_tokens
            FROM clean GROUP BY shard ORDER BY shard"""))

  // ------------------------------------------------------------------- all

  val all: Seq[Q] = Seq(w7, w8, a15, a16, dedupCos, contam, j16, mmFrames,
    p10, p11, a17, a18, w9, g1, g2, curPipe)
}
