package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.{DoubleType, LongType}

import graft.engine.Engine
import graft.operators.Graph

/** Round-3 tier: tokenizer-training and layout/pruning operators a
  * large-scale training-data pipeline needs beyond the round-2 inventory —
  * a BPE merge-counting step, an explicit bloom-filter semi-join
  * reduction, a Z-order clustering key for data-skipping layouts, an
  * event-transition (Markov) matrix, and triangle counting on the capped
  * co-purchase projection.
  *
  * Same determinism and scale discipline as the rest of the inventory:
  * unique ordering keys, integer or exactly-rounded arithmetic on both
  * engines, bounded blowups, no driver-side loops.
  */
object QueriesR3 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Engine.table(s, dir, name)

  // -------------------------------------------- text_bpe_merge: BPE step

  private val bpe = Q(
    "text_bpe_merge",
    "One BPE tokenizer-training step: corpus-wide frequency of adjacent " +
      "symbol pairs (here the char-level first iteration — each word " +
      "contributes its adjacent character bigrams), top-20 merge " +
      "candidates. The real trainer repeats this: count pairs, merge the " +
      "argmax, re-count. Shape: explode to pairs inside the scan stage " +
      "(map-only — pairs per word = len−1, bounded by the doc length " +
      "already paid for by the scan), then ONE groupBy on the pair; the " +
      "distinct-pair space is tiny (≈alphabet²) so partial aggregation " +
      "collapses almost everything map-side and the shuffle is a few KB " +
      "per partition regardless of corpus size. At 100 TB this is the " +
      "same plan — the reduce side never sees more than |pairs| rows.",
    (s, d) =>
      t(s, d, "documents")
        .select(explode(split(col("text"), " ")).as("w"))
        .filter(length(col("w")) >= 2) // sequence(1, 0) would count DOWN
        .select(explode(transform(
          sequence(lit(1), length(col("w")) - 1),
          i => col("w").substr(i, lit(2)))).as("pair"))
        .groupBy("pair").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("pair"))
        .limit(20),
    Some("""WITH words AS (SELECT unnest(string_split(text, ' ')) AS w
                           FROM documents),
                 idx AS (SELECT w, unnest(range(1, len(w))) AS i
                         FROM words WHERE len(w) >= 2),
                 pairs AS (SELECT substr(w, CAST(i AS INT), 2) AS pair FROM idx)
            SELECT pair, count(*) AS cnt FROM pairs
            GROUP BY pair ORDER BY cnt DESC, pair LIMIT 20"""))

  // ------------------------------------- j18: bloom-filter join pruning

  private val j18 = Q(
    "j18_bloom_prune",
    "Explicit bloom-filter semi-join reduction: the filtered dim side's " +
      "join keys are folded into a 1024-bit bloom (16 longs, 3 hashes — " +
      "k positions via xxhash64(key, seed), one bit_or aggregation, " +
      "map-side partials collapse it to ONE row), broadcast to the fact " +
      "scan, and applied as a pure map-side prune BEFORE the exact semi " +
      "join. False positives are removed by the exact join, so the " +
      "result is exact regardless of bloom parameters — which is why no " +
      "oracle needs to model the bloom at all. This is the pattern " +
      "behind Spark's own runtime row-level filtering " +
      "(spark.sql.optimizer.runtime.bloomFilter.enabled), made explicit " +
      "and portable; at 100 TB you size m ≈ 10·n_keys bits and the " +
      "shuffle into the semi join shrinks by the prune's selectivity " +
      "(~20× here) while the broadcast stays 128 bytes + key count / 8.",
    (s, d) => {
      val nHash = 3
      val words = 16 // 1024 bits
      val dim = t(s, d, "orders")
        .filter(col("o_orderkey") % 997 === 0)
        .select(col("o_orderkey").as("k"))
      val pos = dim.select(
        (0 until nHash).map(h => expr(s"pmod(xxhash64(k, $h), 1024)").as(s"p$h")): _*)
      def contrib(p: String, w: Int) =
        s"(CASE WHEN $p div 64 = $w THEN shiftleft(CAST(1 AS BIGINT), CAST($p % 64 AS INT)) " +
          s"ELSE CAST(0 AS BIGINT) END)"
      def word(w: Int) =
        expr(s"bit_or(${(0 until nHash).map(h => contrib(s"p$h", w)).mkString(" | ")})")
          .as(s"w$w")
      val bf = pos.agg(word(0), (1 until words).map(word): _*)
        .select(array((0 until words).map(w => col(s"w$w")): _*).as("bf"))
      val might = (0 until nHash).map { h =>
        s"(element_at(bf, CAST(shiftright(pmod(xxhash64(l_orderkey, $h), 1024), 6) AS INT) + 1)" +
          s" & shiftleft(CAST(1 AS BIGINT), CAST(pmod(xxhash64(l_orderkey, $h), 64) AS INT))) != 0"
      }.mkString(" AND ")
      val cand = t(s, d, "lineitem")
        .select("l_orderkey", "l_extendedprice", "l_returnflag")
        .crossJoin(broadcast(bf))
        .filter(expr(might))
      cand.join(dim, cand("l_orderkey") === dim("k"), "left_semi")
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          (sum(round(col("l_extendedprice") * 100, 0).cast(LongType)) / lit(100.0))
            .as("revenue"))
        .transform(graft.engine.Ops.reportSort("l_returnflag"))
    },
    Some("""SELECT l_returnflag, count(*) AS n,
                   CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT)
                     / CAST(100 AS DOUBLE) AS revenue
            FROM lineitem
            WHERE l_orderkey IN (SELECT o_orderkey FROM orders
                                 WHERE o_orderkey % 997 = 0)
            GROUP BY l_returnflag ORDER BY l_returnflag"""))

  // ------------------------------------------ curate_zorder: Z-order key

  private val zorder = Q(
    "curate_zorder",
    "Z-order (Morton) clustering key for data-skipping layouts: " +
      "bit-interleave two join/filter dimensions (partkey, suppkey; 16 " +
      "bits each) into one 32-bit curve position, then the per-bucket " +
      "occupancy histogram a layout optimizer would use. Writing the " +
      "table repartitionByRange(z).sortWithinPartitions(z) gives every " +
      "parquet file a tight min/max envelope on BOTH dimensions, so " +
      "point/range predicates on either column skip most files — the " +
      "multi-column generalization of sort-based skipping (what Delta's " +
      "OPTIMIZE ZORDER does). The key is a flat 32-term OR unrolled at " +
      "plan-build time (the shift amounts are literals, so the whole " +
      "interleave stays inside whole-stage codegen — an aggregate() HOF " +
      "fold measured ~2× slower because lambda evaluation is " +
      "interpreted per element); the histogram shuffles one row per " +
      "occupied 64Ki-cell curve bucket (≤65536 at any scale).",
    (s, d) => {
      val pk = pmod(col("l_partkey"), lit(65536L))
      val sk = pmod(col("l_suppkey"), lit(65536L))
      val z = (0 until 16).foldLeft(lit(0L)) { (acc, i) =>
        acc
          .bitwiseOR(shiftleft(shiftright(pk, i).bitwiseAND(lit(1L)), 2 * i))
          .bitwiseOR(shiftleft(shiftright(sk, i).bitwiseAND(lit(1L)), 2 * i + 1))
      }
      t(s, d, "lineitem")
        .select(z.as("z"))
        .groupBy(shiftright(col("z"), 16).as("bucket"))
        .agg(count(lit(1)).as("n"), min("z").as("min_z"), max("z").as("max_z"))
        .transform(graft.engine.Ops.reportSort("bucket"))
    },
    Some("""WITH zt AS (SELECT CAST(list_sum(list_transform(range(0, 16), i ->
                   (((l_partkey % 65536) >> i) & 1) * (CAST(1 AS BIGINT) << CAST(2 * i AS INT))
                 + (((l_suppkey % 65536) >> i) & 1) * (CAST(1 AS BIGINT) << CAST(2 * i + 1 AS INT))))
                 AS BIGINT) AS z
                        FROM lineitem)
            SELECT z >> 16 AS bucket, count(*) AS n, min(z) AS min_z, max(z) AS max_z
            FROM zt GROUP BY bucket ORDER BY bucket"""))

  // --------------------------------- w10: Markov transition matrix

  private val w10 = Q(
    "w10_markov_transitions",
    "Event-type transition matrix (first-order Markov estimate): per-user " +
      "ordered lag pairs → global (prev, next) counts → row-normalized " +
      "probabilities. Two shuffles total: the user_id window (state " +
      "bounded per user) and the (prev, next) groupBy whose distinct " +
      "space is |event_types|² — tiny at any corpus size, so the " +
      "normalizing window runs on a few dozen rows. Probabilities are " +
      "exact-integer ratios divided once in IEEE double — deterministic " +
      "across engines (no float accumulation).",
    (s, d) => {
      val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
      t(s, d, "events")
        .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
        .withColumn("prev_type", lag("event_type", 1).over(byUser))
        .filter(col("prev_type").isNotNull)
        .groupBy(col("prev_type"), col("event_type").as("next_type"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("prob",
          col("cnt").cast(DoubleType) /
            sum("cnt").over(Window.partitionBy("prev_type")).cast(DoubleType))
        .transform(graft.engine.Ops.reportSort("prev_type", "next_type"))
    },
    Some("""WITH seq AS (SELECT user_id, event_type,
                                lag(event_type) OVER (PARTITION BY user_id
                                                      ORDER BY ts, event_id) AS prev_type
                         FROM events),
                 tr AS (SELECT prev_type, event_type AS next_type, count(*) AS cnt
                        FROM seq WHERE prev_type IS NOT NULL GROUP BY 1, 2)
            SELECT prev_type, next_type, cnt,
                   CAST(cnt AS DOUBLE)
                     / CAST(sum(cnt) OVER (PARTITION BY prev_type) AS DOUBLE) AS prob
            FROM tr ORDER BY prev_type, next_type"""))

  // ------------------------------------------- g3: triangle counting

  private val g3 = Q(
    "g3_triangle_count",
    "Triangle counting on the capped co-purchase projection, thinned to " +
      "the top-2000 edges by weight (deterministic tie-break): wedges " +
      "from ONE self-join on the shared endpoint, closed by a semi join " +
      "back to the edge list — each triangle {x<y<z} counted exactly " +
      "once through its middle vertex. The thinning is the scale " +
      "guarantee: the raw co-purchase graph is near-complete (wedge " +
      "space Θ(n³) — ~1.6e8 at sf0.1 already), so enumeration is only " +
      "sane on a bounded-weight backbone; 2000 a<b edges bound wedges " +
      "at ~44k regardless of corpus size (web-scale systems do the same " +
      "with degree-ordering + per-node neighbor caps). Ordering edges " +
      "(a < b) cuts the wedge space 4× vs undirected enumeration. The " +
      "backbone is localCheckpoint'ed once — three plan references, one " +
      "materialization; top-2000 itself is a TakeOrdered, no global sort.",
    (s, d) => {
      val e = Graph.backbone(s, d).select("a", "b")
      val w = e.as("e1").join(e.as("e2"), col("e1.b") === col("e2.a"))
        .select(col("e1.a").as("x"), col("e1.b").as("y"), col("e2.b").as("z"))
      val tri = w.join(e.as("e3"),
        col("x") === col("e3.a") && col("z") === col("e3.b"), "left_semi")
      e.agg(count(lit(1)).as("n_edges"))
        .crossJoin(w.agg(count(lit(1)).as("n_wedges")))
        .crossJoin(tri.agg(count(lit(1)).as("n_triangles")))
    },
    Some("""WITH ed AS (SELECT DISTINCT o_custkey AS c, l_suppkey AS s
                        FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
                 cap AS (SELECT c, list_sort(list(DISTINCT s))[1:20] AS ss
                         FROM ed GROUP BY c),
                 pr AS (SELECT unnest(flatten(list_transform(range(1, len(ss)),
                          i -> list_transform(range(i + 1, len(ss) + 1),
                            j -> {'a': ss[i], 'b': ss[j]})))) AS p
                        FROM cap WHERE len(ss) >= 2),
                 e AS (SELECT a, b FROM (SELECT p.a AS a, p.b AS b, count(*) AS n
                                         FROM pr GROUP BY p.a, p.b
                                         ORDER BY n DESC, a, b LIMIT 2000)),
                 w AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
                       FROM e e1 JOIN e e2 ON e1.b = e2.a),
                 tri AS (SELECT 1 FROM w
                         WHERE EXISTS (SELECT 1 FROM e e3
                                       WHERE e3.a = w.x AND e3.b = w.z))
            SELECT (SELECT count(*) FROM e) AS n_edges,
                   (SELECT count(*) FROM w) AS n_wedges,
                   (SELECT count(*) FROM tri) AS n_triangles"""))

  val all: Seq[Q] = Seq(bpe, j18, zorder, w10, g3)
}
