package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.{IntegerType, LongType}

import graft.engine.Engine
import graft.operators.{Similarity, TopKAggregator}

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
        .orderBy("l_returnflag", "rank")
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
      // independent lineage per join side: typedlit-bearing lambdas in a
      // self-join trip Spark 4.1 attribute dedup (same dodge as rerank)
      def corpus(idN: String, vN: String) = {
        val base = t(s, d, "embeddings")
          .select(col("vec_id").as(idN),
            Similarity.toDoubleVec(col("embedding")).as(vN))
        val planted = t(s, d, "embeddings")
          .filter(col("vec_id") % 50 === 0)
          .select((col("vec_id") + 100000).as(idN),
            transform(Similarity.toDoubleVec(col("embedding")),
              (x, i) => x +
                (((col("vec_id") + 100000) * 31 + i * 17) % 7 - 3)
                  .cast("double") * lit(0.01)).as(vN))
        base.unionByName(planted)
          .withColumn("sig", Similarity.hyperplaneSig(col(vN), nPlanes = 8, dim = 64))
      }
      val a = corpus("id_a", "va")
      val b = corpus("id_b", "vb")
      def cosC(x: Column, y: Column) =
        Similarity.dotComposed(x, y) /
          (sqrt(Similarity.dotComposed(x, x)) * sqrt(Similarity.dotComposed(y, y)))
      a.join(b, Seq("sig")).filter(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"),
          round(cosC(col("va"), col("vb")), 6).as("cos"))
        .filter(col("cos") >= 0.95)
        .orderBy("id_a", "id_b")
    },
    Some("""WITH base AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings),
            planted AS (
              SELECT vec_id + 100000 AS id,
                     list_transform(range(0,64), i -> embedding[i+1]::DOUBLE +
                       CAST(((vec_id + 100000)*31 + i*17) % 7 - 3 AS DOUBLE) * 0.01) AS v
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
            SELECT id_a, id_b, cos FROM pairs WHERE cos >= 0.95
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
      // 4-gram shingles over a MATERIALIZED token array (lambda bodies get
      // no CSE — same lesson as Dedup.bigramShinglesFromToks); short docs
      // yield an empty set (sequence would count DOWN below 4 tokens)
      val gs = docs.select(col("doc_id"),
        when(size(col("toks")) >= 4,
          array_distinct(transform(sequence(lit(1), size(col("toks")) - 3),
            i => concat_ws(" ",
              element_at(col("toks"), i), element_at(col("toks"), i + 1),
              element_at(col("toks"), i + 2), element_at(col("toks"), i + 3)))))
          .otherwise(array().cast("array<string>")).as("gs"))
      val ex = gs.select(col("doc_id"), explode(col("gs")).as("g"))
      val held = ex.filter(col("doc_id") % 97 === 0).select("g").distinct()
      val corp = ex.filter(col("doc_id") % 97 =!= 0)
      val hits = corp.join(broadcast(held), "g")
        .groupBy("doc_id").agg(count(lit(1)).as("n_hits"))
      val totals = corp.groupBy("doc_id").agg(count(lit(1)).as("n_shingles"))
      hits.join(totals, "doc_id")
        .select(col("doc_id"), col("n_shingles"), col("n_hits"),
          round(col("n_hits").cast("double") / col("n_shingles"), 6).as("ratio"))
        .orderBy("doc_id")
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
      val pairs = banded(o, "sa", "ea").join(banded(c, "sb", "eb"), Seq("band"))
        .filter(col("sa") <= col("eb") && col("sb") <= col("ea"))
        .select("campaign_id", "sb", "eb", "o_orderkey", "o_totalprice")
        .distinct() // a pair can share 2 bands
      pairs.groupBy("campaign_id", "sb", "eb")
        .agg(count(lit(1)).as("n_orders"), centsSum(col("o_totalprice")).as("total"))
        .orderBy("campaign_id")
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
        .orderBy("doc_id", "frame_idx")
    },
    Some("""WITH f AS (SELECT doc_id, unnest(range(0, 4 + doc_id % 8, 3)) AS f
                       FROM documents)
            SELECT doc_id, f AS frame_idx,
                   CAST(9 + f * 4 AS INT) AS byte_offset,
                   (doc_id * 1000003 + f * 97) % 4294967296 AS frame_val
            FROM f ORDER BY doc_id, frame_idx"""))

  // ------------------------------------------------------------------- all

  val all: Seq[Q] = Seq(w7, a15, a16, dedupCos, contam, j16, mmFrames)
}
