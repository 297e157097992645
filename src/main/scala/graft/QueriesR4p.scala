package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.{DoubleType, LongType}

import graft.engine.Engine
import graft.operators.Similarity

/** Round-4 batch 3: RAKE keyphrase extraction, blocking-scheme
  * evaluation, cluster-balanced embedding sampling.
  */
object QueriesR4p {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Engine.table(s, dir, name)

  // ------------- text_keyphrase_rake: stopword-delimited keyphrases

  private val rake = Q(
    "text_keyphrase_rake",
    "RAKE keyphrase extraction (Rose et al. 2010) — the non-graph " +
      "complement to text_textrank: documents split into candidate " +
      "phrases at stopword boundaries (phrase segment id = running " +
      "stopword count per doc, one window), each word scores " +
      "degree/frequency over the phrase corpus, and a phrase scores " +
      "the SUM of its word scores. Word scores are micro-rounded to " +
      "integers BEFORE the phrase sum, so the sum is order-independent " +
      "and hash-gradable — a float sum of ratios would differ by " +
      "accumulation order across engines. Two explodes + three keyed " +
      "aggregations; nothing touches more than (doc × tokens) rows.",
    (s, d) => {
      val stops = Seq("the", "a", "of", "and", "to", "in", "is", "on",
        "for", "with")
      val toks = t(s, d, "documents")
        .select(col("doc_id"),
          // native tokenization (plans.AlnumTokens, round 13):
          // byte-identical tokens, one compiled scan (TokenizeSpec)
          posexplode(graft.plans.AlnumTokens(col("text")))
            .as(Seq("pos", "tok")))
        .withColumn("is_stop", col("tok").isInCollection(stops))
      val wSeg = Window.partitionBy("doc_id").orderBy("pos")
      val phraseTok = toks
        .withColumn("seg", sum(col("is_stop").cast(LongType)).over(wSeg))
        .filter(!col("is_stop"))
      // phrases feeds three branches (word stats, phrase-word join,
      // occurrence counts): cache so the tokenize+segment+assemble
      // pipeline runs once
      val phrases = phraseTok
        .groupBy("doc_id", "seg")
        .agg(transform(
          array_sort(collect_list(struct(col("pos"), col("tok")))),
          p => p.getField("tok")).as("wds"),
          count(lit(1)).as("plen"))
        // the sorted token ARRAY rides alongside the phrase string, so
        // neither downstream explode re-splits the string it was built
        // from
        .select(concat_ws(" ", col("wds")).as("phrase"), col("wds"),
          col("plen"))
        .cache()
      val wordStats = phrases
        .select(col("plen"), explode(col("wds")).as("tok"))
        .groupBy("tok")
        .agg(count(lit(1)).as("freq"), sum("plen").as("deg"))
        .select(col("tok"),
          round(col("deg").cast(DoubleType) * 1e6 / col("freq"), 0)
            .cast(LongType).as("score_micro"))
      // n_occur folds into the SAME aggregation (round 9; was a second
      // groupBy(phrase) + join): each occurrence contributes exactly
      // plen word rows to the group, so n_occur = rows div plen — one
      // exchange and no co-located join stage
      phrases
        .select(col("phrase"), col("plen"), explode(col("wds")).as("tok"))
        .join(wordStats, "tok")
        .groupBy("phrase")
        .agg(sum("score_micro").as("phrase_score_micro"),
          expr("count(1) div first(plen)").as("n_occur"))
        .orderBy(desc("phrase_score_micro"), col("phrase"))
        .limit(20)
        .select("phrase", "phrase_score_micro", "n_occur")
    },
    Some("""WITH toks AS (
              SELECT doc_id, u.pos, u.tok,
                     u.tok IN ('the','a','of','and','to','in','is','on',
                               'for','with') AS is_stop
              FROM (SELECT doc_id,
                           list_filter(regexp_split_to_array(
                             regexp_replace(lower(text), '[^a-z0-9 ]',
                               ' ', 'g'), ' +'), x -> x <> '') AS l
                    FROM documents),
                   LATERAL (SELECT unnest(range(1, len(l) + 1)) AS pos,
                                   unnest(l) AS tok) u),
            seg AS (
              SELECT doc_id, pos, tok, is_stop,
                     sum(CASE WHEN is_stop THEN 1 ELSE 0 END) OVER
                       (PARTITION BY doc_id ORDER BY pos) AS seg
              FROM toks),
            phrases AS (
              SELECT doc_id, seg,
                     array_to_string(list_transform(list_sort(
                       list(struct_pack(pos := pos, tok := tok))),
                       p -> p.tok), ' ') AS phrase,
                     CAST(count(*) AS BIGINT) AS plen
              FROM seg WHERE NOT is_stop
              GROUP BY doc_id, seg),
            ws AS (
              SELECT tok,
                     CAST(round(CAST(sum(plen) AS DOUBLE) * 1e6 /
                       count(*), 0) AS BIGINT) AS score_micro
              FROM (SELECT plen, unnest(string_split(phrase, ' ')) AS tok
                    FROM phrases)
              GROUP BY tok),
            pw AS (SELECT phrase, plen,
                          unnest(string_split(phrase, ' ')) AS tok
                   FROM phrases),
            scored AS (
              SELECT phrase,
                     CAST(sum(score_micro) AS BIGINT)
                       AS phrase_score_micro,
                     CAST(count(*) // any_value(plen) AS BIGINT)
                       AS n_occur
              FROM pw JOIN ws USING (tok) GROUP BY phrase)
            SELECT phrase, phrase_score_micro, n_occur
            FROM scored
            ORDER BY phrase_score_micro DESC, phrase LIMIT 20"""))

  // ------------- er_blocking_eval: pairs completeness / reduction

  private val blockingEval = Q(
    "er_blocking_eval",
    "Blocking-scheme evaluation for entity resolution — BEFORE running " +
      "the expensive pairwise scorer, measure the candidate generator: " +
      "er_name_cluster's corpus (clean parts + tail-chopped dirty " +
      "twins, truth pair = (id, id+1M) by construction) blocked on the " +
      "first name token. Reports candidate count, pairs completeness " +
      "(truth pairs surviving blocking / all truth pairs) and " +
      "reduction ratio (1 − candidates / all possible pairs) — the " +
      "two numbers every blocking key trades off. Block sizes " +
      "aggregate to candidate counts without enumerating pairs; only " +
      "truth-pair membership does a (cheap, keyed) join.",
    (s, d) => {
      val base = t(s, d, "part").filter(col("p_partkey") < 500)
        .select(col("p_partkey"), lower(col("p_name")).as("nm"))
      val ents = base.select(col("p_partkey").as("id"), col("nm").as("name"))
        .unionByName(base.select((col("p_partkey") + 1000000).as("id"),
          expr("substring(nm, 1, length(nm) - 2)").as("name")))
        .withColumn("blk", split(col("name"), " ").getItem(0))
      val blocks = ents.groupBy("blk").agg(count(lit(1)).as("bn"))
      val nCand = blocks
        .agg(sum(expr("bn * (bn - 1) div 2")).cast(LongType)
          .as("n_candidates"))
      val nEnts = ents.agg(count(lit(1)).as("n"))
        .select(col("n"), expr("n * (n - 1) div 2").as("n_possible"))
      // truth pair survives blocking iff both sides share the block key
      val truth = ents.filter(col("id") < 1000000).as("c")
        .join(ents.filter(col("id") >= 1000000).as("t"),
          col("c.id") + 1000000 === col("t.id"))
        .select(col("c.id").as("id"),
          (col("c.blk") === col("t.blk")).cast(LongType).as("found"))
      val truthAgg = truth.agg(count(lit(1)).as("n_truth"),
        sum("found").cast(LongType).as("n_truth_found"))
      nCand.crossJoin(broadcast(nEnts)).crossJoin(broadcast(truthAgg))
        .select(col("n").as("n_entities"), col("n_possible"),
          col("n_candidates"), col("n_truth"), col("n_truth_found"),
          round(col("n_truth_found").cast(DoubleType) / col("n_truth"), 6)
            .as("pairs_completeness"),
          round(lit(1.0) - col("n_candidates").cast(DoubleType) /
            col("n_possible"), 6).as("reduction_ratio"))
    },
    Some("""WITH base AS (
              SELECT p_partkey AS id, lower(p_name) AS nm
              FROM part WHERE p_partkey < 500),
            ents AS (
              SELECT id, nm AS name FROM base
              UNION ALL
              SELECT id + 1000000, substr(nm, 1, length(nm) - 2)
              FROM base),
            blk AS (SELECT id, name, string_split(name, ' ')[1] AS blk
                    FROM ents),
            bsz AS (SELECT blk, count(*) AS bn FROM blk GROUP BY blk),
            cand AS (SELECT CAST(sum(bn * (bn - 1) // 2) AS BIGINT)
                       AS n_candidates FROM bsz),
            n AS (SELECT CAST(count(*) AS BIGINT) AS n,
                         CAST(count(*) * (count(*) - 1) // 2 AS BIGINT)
                           AS n_possible
                  FROM ents),
            truth AS (
              SELECT c.id,
                     CAST(c.blk = t.blk AS BIGINT) AS found
              FROM blk c JOIN blk t ON c.id + 1000000 = t.id
              WHERE c.id < 1000000),
            ta AS (SELECT CAST(count(*) AS BIGINT) AS n_truth,
                          CAST(sum(found) AS BIGINT) AS n_truth_found
                   FROM truth)
            SELECT n AS n_entities, n_possible, n_candidates, n_truth,
                   n_truth_found,
                   round(CAST(n_truth_found AS DOUBLE) / n_truth, 6)
                     AS pairs_completeness,
                   round(1.0 - CAST(n_candidates AS DOUBLE) / n_possible, 6)
                     AS reduction_ratio
            FROM cand, n, ta"""))

  // ------------- curate_cluster_sample: cluster-balanced selection

  private val clusterSample = Q(
    "curate_cluster_sample",
    "Cluster-balanced diversity sampling over embeddings — the " +
      "SemDeDup-adjacent curation move that stops one dense mode from " +
      "dominating a sample: vectors assign to 8 broadcast centroids " +
      "(ids 0-7, the deterministic seed set; production swaps trained " +
      "centroids, identical plan) by exact cosine argmin, then each " +
      "cluster contributes at most 15 members, chosen by a " +
      "content-stable hash rank — reruns and engines agree on every " +
      "pick. Broadcast argmin assignment is map-only; the per-cluster " +
      "rank is a window over cluster-sized frames.",
    (s, d) => {
      // integer-exact assignment (Similarity.quantize discipline): the
      // argmin over centroids ranks by an exact integer key, and the
      // emitted cos is bit-identical cross-engine
      val emb = t(s, d, "embeddings")
        .select(col("vec_id").as("id"),
          Similarity.quantize(Similarity.toDoubleVec(col("embedding")))
            .as("vec"))
        .withColumn("nv",
          Similarity.dot(col("vec"), col("vec")).cast(LongType))
      val cents = emb.filter(col("id") < 8)
        .select(col("id").as("cid"), col("vec").as("cv"),
          col("nv").as("nc"))
      val assigned = emb.crossJoin(broadcast(cents))
        .select(col("id"), col("cid"),
          Similarity.dot(col("vec"), col("cv")).cast(LongType).as("dot_l"),
          col("nv"), col("nc"))
        .withColumn("rk_key",
          Similarity.cosRankKey(col("dot_l"), col("nv"), col("nc")))
        .withColumn("cos",
          Similarity.cosFromInts(col("dot_l"), col("nv"), col("nc")))
        .withColumn("rk", row_number().over(
          Window.partitionBy("id").orderBy(desc("rk_key"), col("cid"))))
        .filter(col("rk") === 1)
        .select(col("id"), col("cid"), col("cos"))
      val hashed = assigned.withColumn("hv",
        graft.operators.Dedup.tokenId(concat(lit("cs:"),
          col("id").cast("string"))))
      hashed
        .withColumn("pick", row_number().over(
          Window.partitionBy("cid").orderBy(col("hv"), col("id"))))
        .filter(col("pick") <= 15)
        // BIGINT micros on the output surface (argmax keeps the 6-dp
        // double): float cells are hash-canonicalization hazards
        .select(col("cid"), col("pick").cast(LongType).as("pick"),
          col("id"),
          round(col("cos") * 1e6, 0).cast(LongType).as("cos_micro"))
        .transform(graft.engine.Ops.reportSort("cid", "pick"))
    },
    Some("""WITH e AS (SELECT vec_id AS id,
                              list_transform(embedding::DOUBLE[],
                                x -> round(x * 1048576)) AS v
                       FROM embeddings),
            c AS (SELECT id AS cid, v AS cv FROM e WHERE id < 8),
            sc AS (SELECT id, cid,
                          CAST(list_dot_product(v, cv) AS BIGINT) AS dot_l,
                          CAST(list_dot_product(v, v) AS BIGINT) AS nv,
                          CAST(list_dot_product(cv, cv) AS BIGINT) AS nc
                   FROM e CROSS JOIN c),
            sk AS (SELECT id, cid,
                          (dot_l::HUGEINT * abs(dot_l)::HUGEINT *
                           10000000000::HUGEINT) //
                            (nv::HUGEINT * nc::HUGEINT) AS rk_key,
                          CAST(dot_l AS DOUBLE) /
                            sqrt(CAST(nv AS DOUBLE) * CAST(nc AS DOUBLE))
                            AS cos
                   FROM sc),
            best AS (
              SELECT id, cid, cos FROM (
                SELECT *, row_number() OVER
                  (PARTITION BY id ORDER BY rk_key DESC, cid) AS rk
                FROM sk) WHERE rk = 1),
            hashed AS (
              SELECT id, cid, cos,
                     ('0x' || substr(md5('cs:' || CAST(id AS VARCHAR)),
                       1, 8))::BIGINT AS hv
              FROM best)
            SELECT cid, CAST(pick AS BIGINT) AS pick, id,
                   CAST(round(cos * 1e6, 0) AS BIGINT) AS cos_micro
            FROM (SELECT *, row_number() OVER
                    (PARTITION BY cid ORDER BY hv, id) AS pick
                  FROM hashed)
            WHERE pick <= 15
            ORDER BY cid, pick"""))

  val all: Seq[Q] = Seq(rake, blockingEval, clusterSample)
}
