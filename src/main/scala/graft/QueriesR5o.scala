package graft

import graft.engine.Ck.Ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

import graft.engine.Engine

/** Round-5 batch 13: CUPED variance reduction, dedup-cluster
  * canonicalization.
  */
object QueriesR5o {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Engine.table(s, dir, name)

  // ------- ml_cuped_uplift: variance-reduced experiment readout

  private val cuped = Q(
    "ml_cuped_uplift",
    "CUPED variance reduction (Deng et al. 2013) — the pre-period " +
      "covariate adjustment that lets A/B tests detect small lifts " +
      "with the users they already have: per user, pre/post spend " +
      "(events split at the corpus-midpoint day), arms from the " +
      "deterministic integer mixer (stat_srm_check's), θ = " +
      "cov(pre,post)/var(pre) from exact whole-dollar moment sums, " +
      "adjusted metric y−θ(x−x̄), and the readout = raw vs adjusted " +
      "arm difference plus the variance-reduction share (= the " +
      "squared pre/post correlation). Two keyed rollups and a 2-row " +
      "fold — every moment an exact BIGINT, every float derived " +
      "identically on both engines.",
    (s, d) => {
      val ev = t(s, d, "events")
        .select(col("user_id"), col("ts"),
          round(col("value"), 0).cast(LongType).as("v"))
      val mid = ev.agg(((max(unix_timestamp(col("ts"))) +
        min(unix_timestamp(col("ts")))) / 2).cast(LongType))
        .head().getLong(0)
      val user = ev
        .groupBy("user_id")
        .agg(sum(when(unix_timestamp(col("ts")) < mid, col("v"))
          .otherwise(0L)).as("x"),
          sum(when(unix_timestamp(col("ts")) >= mid, col("v"))
            .otherwise(0L)).as("y"))
        .withColumn("a1", expr("(user_id * 2654435761L) % 2147483648L"))
        .withColumn("a2", expr(
          "(((a1 div 1024 + a1) % 2147483648L) * 2246822519L) % 2147483648L"))
        .withColumn("arm", expr("(a2 div 64 + a2) % 2"))
      val m = user.agg(count(lit(1)).as("n"),
        sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("y") * col("y")).as("syy"),
        sum(when(col("arm") === 1, col("y")).otherwise(0L)).as("sy1"),
        sum(when(col("arm") === 1, col("x")).otherwise(0L)).as("sx1"),
        sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n1"))
        .ckpt(true)
      // float-sum audit: every aggregate above is an exact BIGINT sum
      // (order-proof); the doubles below derive from those identical
      // integers via op-for-op mirrored IEEE arithmetic — bit-equal on
      // both engines, so the micro rounds cannot straddle a boundary
      def dd(c: String) = col(c).cast(DoubleType)
      val theta = (dd("sxy") - dd("sx") * dd("sy") / dd("n")) /
        (dd("sxx") - dd("sx") * dd("sx") / dd("n"))
      val xbar = dd("sx") / dd("n")
      val rawDiff = dd("sy1") / dd("n1") -
        (dd("sy") - dd("sy1")) / (dd("n") - dd("n1"))
      // adjusted per-arm mean = mean(y) − θ(mean(x) − x̄) per arm
      val adjDiff = rawDiff - theta *
        (dd("sx1") / dd("n1") - (dd("sx") - dd("sx1")) /
          (dd("n") - dd("n1")))
      val r2 = (dd("sxy") - dd("sx") * dd("sy") / dd("n")) *
        (dd("sxy") - dd("sx") * dd("sy") / dd("n")) /
        ((dd("sxx") - dd("sx") * dd("sx") / dd("n")) *
          (dd("syy") - dd("sy") * dd("sy") / dd("n")))
      m.select(col("n").as("n_users"), col("n1").as("n_arm1"),
        round(theta * 1e6, 0).cast(LongType).as("theta_micro"),
        round(rawDiff * 1e6, 0).cast(LongType).as("raw_diff_micro"),
        round(adjDiff * 1e6, 0).cast(LongType).as("cuped_diff_micro"),
        round(r2 * 1e6, 0).cast(LongType).as("var_reduction_micro"))
    },
    Some("""WITH ev AS (
              SELECT user_id, epoch(ts) AS sec,
                     CAST(round(value, 0) AS BIGINT) AS v
              FROM events),
            mid AS (
              SELECT CAST((max(sec) + min(sec)) / 2 AS BIGINT) AS mid
              FROM ev),
            usr AS (
              SELECT user_id,
                     CAST(sum(CASE WHEN sec < mid THEN v ELSE 0 END)
                       AS BIGINT) AS x,
                     CAST(sum(CASE WHEN sec >= mid THEN v ELSE 0 END)
                       AS BIGINT) AS y
              FROM ev CROSS JOIN mid GROUP BY 1),
            mixed AS (
              SELECT x, y,
                     (user_id * 2654435761) % 2147483648 AS a1
              FROM usr),
            arms AS (
              SELECT x, y,
                     ((((a1 // 1024 + a1) % 2147483648) * 2246822519)
                        % 2147483648 // 64 +
                      (((a1 // 1024 + a1) % 2147483648) * 2246822519)
                        % 2147483648) % 2 AS arm
              FROM mixed),
            m AS (
              SELECT CAST(count(*) AS BIGINT) AS n,
                     CAST(sum(x) AS BIGINT) AS sx,
                     CAST(sum(y) AS BIGINT) AS sy,
                     CAST(sum(x * x) AS BIGINT) AS sxx,
                     CAST(sum(x * y) AS BIGINT) AS sxy,
                     CAST(sum(y * y) AS BIGINT) AS syy,
                     CAST(sum(CASE WHEN arm = 1 THEN y ELSE 0 END)
                       AS BIGINT) AS sy1,
                     CAST(sum(CASE WHEN arm = 1 THEN x ELSE 0 END)
                       AS BIGINT) AS sx1,
                     CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END)
                       AS BIGINT) AS n1
              FROM arms)
            SELECT n AS n_users, n1 AS n_arm1,
                   CAST(round((CAST(sxy AS DOUBLE) -
                       CAST(sx AS DOUBLE) * sy / n) /
                     (CAST(sxx AS DOUBLE) -
                       CAST(sx AS DOUBLE) * sx / n) * 1e6, 0) AS BIGINT)
                     AS theta_micro,
                   CAST(round((CAST(sy1 AS DOUBLE) / n1 -
                     (CAST(sy AS DOUBLE) - sy1) / (n - n1)) * 1e6, 0)
                     AS BIGINT) AS raw_diff_micro,
                   CAST(round(((CAST(sy1 AS DOUBLE) / n1 -
                     (CAST(sy AS DOUBLE) - sy1) / (n - n1)) -
                     (CAST(sxy AS DOUBLE) -
                       CAST(sx AS DOUBLE) * sy / n) /
                     (CAST(sxx AS DOUBLE) -
                       CAST(sx AS DOUBLE) * sx / n) *
                     (CAST(sx1 AS DOUBLE) / n1 -
                       (CAST(sx AS DOUBLE) - sx1) / (n - n1))) * 1e6, 0)
                     AS BIGINT) AS cuped_diff_micro,
                   CAST(round((CAST(sxy AS DOUBLE) -
                       CAST(sx AS DOUBLE) * sy / n) *
                     (CAST(sxy AS DOUBLE) -
                       CAST(sx AS DOUBLE) * sy / n) /
                     ((CAST(sxx AS DOUBLE) -
                        CAST(sx AS DOUBLE) * sx / n) *
                      (CAST(syy AS DOUBLE) -
                        CAST(sy AS DOUBLE) * sy / n)) * 1e6, 0)
                     AS BIGINT) AS var_reduction_micro
            FROM m"""))

  // ------- curate_cluster_canonical: which copy of a dup group to keep

  private val clusterCanonical = Q(
    "curate_cluster_canonical",
    "Dedup-cluster canonicalization — after dedup finds the groups, " +
      "WHICH copy survives? Token-set duplicate groups (the " +
      "dedup_normalized tier's fingerprint — word-order/repetition-" +
      "insensitive, the tier that actually fires on shuffled rewrites) " +
      "elect a canonical document by quality: longest " +
      "text, then smallest doc_id — a deterministic struct-ordered " +
      "aggregate pick (the survivorship idiom), with per-group loser " +
      "counts and reclaimable bytes. Only groups with ≥2 members " +
      "surface (the actionable set). One fingerprint shuffle + one " +
      "associative pick; no windows, no self-joins.",
    (s, d) => {
      val fp = t(s, d, "documents")
        .select(col("doc_id"), col("n_chars"),
          md5(concat_ws(" ",
            array_sort(array_distinct(split(col("text"), " ")))))
            .as("fp"))
      fp.groupBy("fp")
        .agg(count(lit(1)).as("n_members"),
          min(struct((-col("n_chars")).as("neg_len"), col("doc_id")))
            .as("pick"),
          sum("n_chars").as("total_chars"))
        .filter(col("n_members") >= 2)
        .select(col("fp"), col("n_members"),
          col("pick.doc_id").as("canonical_doc"),
          (-col("pick.neg_len")).as("canonical_chars"),
          (col("total_chars") + col("pick.neg_len"))
            .as("reclaimable_chars"))
        .transform(graft.engine.Ops.reportSort("fp"))
    },
    Some("""WITH fp AS (
              SELECT doc_id, n_chars,
                     md5(array_to_string(list_sort(list_distinct(
                       string_split(text, ' '))), ' ')) AS fp
              FROM documents),
            grp AS (
              SELECT fp, CAST(count(*) AS BIGINT) AS n_members,
                     min(struct_pack(neg_len := -n_chars,
                                     doc_id := doc_id)) AS pick,
                     CAST(sum(n_chars) AS BIGINT) AS total_chars
              FROM fp GROUP BY 1)
            SELECT fp, n_members,
                   pick.doc_id AS canonical_doc,
                   -pick.neg_len AS canonical_chars,
                   total_chars + pick.neg_len AS reclaimable_chars
            FROM grp WHERE n_members >= 2
            ORDER BY fp"""))

  val all: Seq[Q] = Seq(cuped, clusterCanonical)
}
