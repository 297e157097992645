package graft

import graft.engine.Ck.Ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.{DoubleType, LongType}

import graft.engine.Engine
import graft.operators.Similarity

/** Round-5 batch 8: Fisher exact test, greedy k-center coreset,
  * histogram-split boosting stump.
  */
object QueriesR5j {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Engine.table(s, dir, name)

  // ------- stat_fisher_exact: one-sided 2×2 exact test

  private val fisherExact = Q(
    "stat_fisher_exact",
    "One-sided Fisher exact test on a 2×2 panel — the small-sample " +
      "counterpart to stat_chi2_indep/stat_g_test whose p-value is a " +
      "hypergeometric tail sum, not an asymptotic: over a 200-supplier " +
      "panel (exact tests are a small-n tool; the deterministic key cap " +
      "IS the method's contract), cells = negative-balance × low-key " +
      "nation, p = Σ_{k≥a} C(c1,k)C(n−c1,r1−k)/C(n,r1). Log-binomials " +
      "come from a ln-factorial PREFIX table built by one bounded " +
      "cumulative window (both engines sum ln(i) in the same ascending " +
      "order); the tail index range explodes from the 1-row margin " +
      "frame, so every piece is bounded by the panel, never the corpus.",
    (s, d) => {
      val panel = t(s, d, "supplier")
        .withColumn("rk", row_number().over(
          Window.partitionBy(lit(1)).orderBy("s_suppkey")))
        .filter(col("rk") <= 200)
        .select((col("s_acctbal") < 0).cast(LongType).as("r"),
          (col("s_nationkey") < 12).cast(LongType).as("c"))
      val m = panel.agg(count(lit(1)).as("n"),
        sum("r").as("r1"), sum("c").as("c1"),
        sum(col("r") * col("c")).as("a")).ckpt(true)
      // ln-factorial prefix: lnf(i) = Σ_{j≤i} ln j, one bounded window
      val lnf = m.select(explode(expr("sequence(1, n)")).as("i"))
        .withColumn("lnf", sum(log(col("i").cast(DoubleType))).over(
          Window.partitionBy(lit(1)).orderBy("i")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      def lnfAt(k: org.apache.spark.sql.Column) =
        when(k <= 0, lit(0.0)).otherwise(col("arr")(k.cast("int") - 1))
      val lnfArr = lnf.orderBy("i")
        .agg(collect_list("lnf").as("arr")).ckpt(true)
      val tail = m.select(col("n"), col("r1"), col("c1"), col("a"),
          explode(expr("sequence(a, least(r1, c1))")).as("k"))
        .crossJoin(broadcast(lnfArr))
        .select(col("n"), col("r1"), col("c1"), col("a"), col("k"),
          exp(lnfAt(col("c1")) - lnfAt(col("k")) -
            lnfAt(col("c1") - col("k")) +
            lnfAt(col("n") - col("c1")) - lnfAt(col("r1") - col("k")) -
            lnfAt(col("n") - col("c1") - col("r1") + col("k")) -
            (lnfAt(col("n")) - lnfAt(col("r1")) -
              lnfAt(col("n") - col("r1")))).as("pk"))
      // nano-rounded tail terms, exact integer sum (exp/ln are
      // libm-ulp-sensitive and the tail sum order is engine-dependent)
      tail.groupBy("n", "r1", "c1", "a")
        .agg(sum(round(col("pk") * 1e9, 0).cast(LongType))
          .as("p_nano"))
        .select(col("n"), col("r1"), col("c1"), col("a"),
          round(col("p_nano").cast(DoubleType) / 1e3, 0).cast(LongType)
            .as("p_micro"))
    },
    Some("""WITH panel AS (
              SELECT CAST(s_acctbal < 0 AS BIGINT) AS r,
                     CAST(s_nationkey < 12 AS BIGINT) AS c
              FROM (SELECT *, row_number() OVER (ORDER BY s_suppkey)
                      AS rk FROM supplier)
              WHERE rk <= 200),
            m AS (
              SELECT CAST(count(*) AS BIGINT) AS n,
                     CAST(sum(r) AS BIGINT) AS r1,
                     CAST(sum(c) AS BIGINT) AS c1,
                     CAST(sum(r * c) AS BIGINT) AS a
              FROM panel),
            lnf AS (
              SELECT i, sum(ln(CAST(i AS DOUBLE))) OVER (ORDER BY i)
                       AS lnf
              FROM (SELECT unnest(range(1, n + 1)) AS i FROM m)),
            arr AS (SELECT list(lnf ORDER BY i) AS arr FROM lnf),
            tail AS (
              SELECT n, r1, c1, a, k,
                     exp((CASE WHEN c1 <= 0 THEN 0 ELSE arr[c1] END) -
                         (CASE WHEN k <= 0 THEN 0 ELSE arr[k] END) -
                         (CASE WHEN c1 - k <= 0 THEN 0
                               ELSE arr[c1 - k] END) +
                         (CASE WHEN n - c1 <= 0 THEN 0
                               ELSE arr[n - c1] END) -
                         (CASE WHEN r1 - k <= 0 THEN 0
                               ELSE arr[r1 - k] END) -
                         (CASE WHEN n - c1 - r1 + k <= 0 THEN 0
                               ELSE arr[n - c1 - r1 + k] END) -
                         ((CASE WHEN n <= 0 THEN 0 ELSE arr[n] END) -
                          (CASE WHEN r1 <= 0 THEN 0 ELSE arr[r1] END) -
                          (CASE WHEN n - r1 <= 0 THEN 0
                                ELSE arr[n - r1] END))) AS pk
              FROM m CROSS JOIN arr
              CROSS JOIN unnest(range(a, least(r1, c1) + 1)) AS u(k))
            SELECT n, r1, c1, a,
                   CAST(round(CAST(sum(CAST(round(pk * 1e9, 0) AS BIGINT))
                     AS DOUBLE) / 1e3, 0) AS BIGINT) AS p_micro
            FROM tail GROUP BY 1, 2, 3, 4"""))

  // ------- curate_kcenter: greedy k-center coreset over a panel

  private val kcenter = Q(
    "curate_kcenter",
    "Greedy k-center coreset selection (Gonzalez' 2-approximation) on " +
      "a 64-vector embedding panel: seed with the smallest id, then 4× " +
      "pick the point FARTHEST from the selected set (max of min-d², " +
      "ties on id) — the diversity-maximizing sampler behind coreset " +
      "curation and prototype selection. Each round is one bounded " +
      "panel×selected score + argmax (a 1-row pick driving the loop, " +
      "the labelSum control-flow idiom — not a data collect); at scale " +
      "the panel IS the method (k-center on a sample, assign the " +
      "corpus to centers by the existing IVF machinery). Output: each " +
      "selected center with its selection round and the distance that " +
      "earned the pick; the final coverage radius rides along.",
    (s, d) => {
      val panel = t(s, d, "embeddings")
        .filter(col("vec_id") % 31 === 0)
        .select(col("vec_id").as("id"),
          Similarity.quantize(Similarity.toDoubleVec(col("embedding")))
            .as("vec"))
        .ckpt(true)
      def d2 = {
        val dot = Similarity.dotComposed(col("vec"), col("cvec"))
        Similarity.dotComposed(col("vec"), col("vec")) -
          lit(2.0) * dot +
          Similarity.dotComposed(col("cvec"), col("cvec"))
      }
      val seed = panel.orderBy("id").limit(1)
        .select(col("id").as("cid"), col("vec").as("cvec"))
      var selected = Seq(
        (seed.head().getLong(0), 1L, 0.0))
      var centers = panel.filter(col("id") === selected.head._1)
        .select(col("id").as("cid"), col("vec").as("cvec"))
      for (r <- 2L to 5L) {
        val far = panel.crossJoin(broadcast(centers))
          .select(col("id"), d2.as("dd"))
          .groupBy("id").agg(min("dd").as("mind"))
          .orderBy(desc("mind"), col("id")).limit(1).head()
        selected = selected :+ ((far.getLong(0), r, far.getDouble(1)))
        centers = panel.filter(
            col("id").isin(selected.map(_._1): _*))
          .select(col("id").as("cid"), col("vec").as("cvec"))
      }
      val radius = panel.crossJoin(broadcast(centers))
        .select(col("id"), d2.as("dd"))
        .groupBy("id").agg(min("dd").as("mind"))
        .agg(max("mind").as("r2")).head().getDouble(0)
      import s.implicits._
      selected.toDF("center_id", "round", "d2_at_pick")
        .select(col("center_id"), col("round"),
          round(col("d2_at_pick") / lit(1099511627776.0) * 1e6, 0)
            .cast(LongType).as("d2_pick_micro"),
          round(lit(radius) / lit(1099511627776.0) * 1e6, 0)
            .cast(LongType).as("coverage_d2_micro"))
        .transform(graft.engine.Ops.reportSort("round"))
    },
    Some {
      val panel =
        """WITH p AS (SELECT vec_id AS id,
                      list_transform(embedding::DOUBLE[],
                        x -> round(x * 1048576)) AS v
                      FROM embeddings WHERE vec_id % 31 = 0),
            s1 AS (SELECT id, v FROM p ORDER BY id LIMIT 1)"""
      // unrolled greedy rounds: sr = selected set after round r
      val rounds = (2 to 5).map { r =>
        val prev = if (r == 2) "s1" else s"s${r - 1}"
        s"""f$r AS (
              SELECT p.id, p.v,
                     min(list_dot_product(p.v, p.v) -
                         2 * list_dot_product(p.v, s.v) +
                         list_dot_product(s.v, s.v)) AS mind
              FROM p CROSS JOIN $prev s GROUP BY p.id, p.v
              ORDER BY mind DESC, p.id LIMIT 1),
            s$r AS (SELECT id, v FROM $prev
                    UNION ALL SELECT id, v FROM f$r)"""
      }.mkString(",\n", ",\n", "")
      val tail =
        """,
            picks AS (
              SELECT id AS center_id, 1 AS rnd,
                     CAST(0.0 AS DOUBLE) AS d2 FROM s1
              UNION ALL SELECT id, 2, mind FROM f2
              UNION ALL SELECT id, 3, mind FROM f3
              UNION ALL SELECT id, 4, mind FROM f4
              UNION ALL SELECT id, 5, mind FROM f5),
            cov AS (
              SELECT max(mind) AS r2 FROM (
                SELECT p.id,
                       min(list_dot_product(p.v, p.v) -
                           2 * list_dot_product(p.v, s.v) +
                           list_dot_product(s.v, s.v)) AS mind
                FROM p CROSS JOIN s5 s GROUP BY p.id))
            SELECT center_id, CAST(rnd AS BIGINT) AS round,
                   CAST(round(d2 / 1099511627776.0 * 1e6, 0) AS BIGINT)
                     AS d2_pick_micro,
                   CAST(round(r2 / 1099511627776.0 * 1e6, 0) AS BIGINT)
                     AS coverage_d2_micro
            FROM picks CROSS JOIN cov ORDER BY round"""
      panel + rounds + tail
    })

  // ------- ml_boost_stump: one histogram-split boosting round

  private val boostStump = Q(
    "ml_boost_stump",
    "One gradient-boosting round as a relational plan — the HISTOGRAM " +
      "split-finding trick that makes distributed GBMs (XGBoost/" +
      "LightGBM style) feasible: price (cents) regressed on quantity, " +
      "base prediction = global mean, and the best stump split comes " +
      "from per-feature-value sufficient statistics (50 bounded rows: " +
      "n, Σy, Σy² per quantity) — never a row-level sort. Prefix sums " +
      "over the tiny histogram give every candidate split's SSE " +
      "reduction in closed form; the winner, its leaf values, and the " +
      "train-MSE before/after fall out of the same frame. All moments " +
      "are exact BIGINTs; the gain/MSE floats derive identically on " +
      "both engines.",
    (s, d) => {
      val base = t(s, d, "lineitem")
        .select(col("l_quantity").cast(LongType).as("x"),
          round(col("l_extendedprice") * 100, 0).cast(LongType).as("y"))
      val hist = base.groupBy("x")
        .agg(count(lit(1)).as("nb"), sum("y").as("sb"),
          sum(expr("CAST(y AS DECIMAL(38,0)) * y")).as("qb"))
      val w = Window.partitionBy(lit(1)).orderBy("x")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wAll = Window.partitionBy(lit(1))
      def dd(c: String) = col(c).cast(DoubleType)
      val pre = hist
        .withColumn("cn", sum("nb").over(w))
        .withColumn("cs", sum("sb").over(w))
        .withColumn("n", sum("nb").over(wAll))
        .withColumn("st", sum("sb").over(wAll))
        .withColumn("qt", sum("qb").over(wAll).cast(DoubleType))
        .filter(col("cn") < col("n"))
      pre
        .select(col("x").as("split_le"), col("n"),
          (dd("cs") * dd("cs") / dd("cn") +
            (dd("st") - dd("cs")) * (dd("st") - dd("cs")) /
              (dd("n") - dd("cn")) -
            dd("st") * dd("st") / dd("n")).as("gain"),
          expr("cs div cn").as("left_cents"),
          expr("(st - cs) div (n - cn)").as("right_cents"),
          ((col("qt") - dd("st") * dd("st") / dd("n")) / dd("n"))
            .as("mse0"),
          ((col("qt") - dd("cs") * dd("cs") / dd("cn") -
            (dd("st") - dd("cs")) * (dd("st") - dd("cs")) /
              (dd("n") - dd("cn"))) / dd("n")).as("mse1"))
        .orderBy(desc("gain"), col("split_le")).limit(1)
        .select(col("split_le"), col("n"),
          round(col("gain"), 0).cast(LongType).as("gain_c2"),
          col("left_cents"), col("right_cents"),
          round(col("mse0"), 0).cast(LongType).as("mse_before_c2"),
          round(col("mse1"), 0).cast(LongType).as("mse_after_c2"))
    },
    Some("""WITH base AS (
              SELECT CAST(l_quantity AS BIGINT) AS x,
                     CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS y
              FROM lineitem),
            hist AS (
              SELECT x, CAST(count(*) AS BIGINT) AS nb,
                     CAST(sum(y) AS BIGINT) AS sb,
                     sum(CAST(y AS HUGEINT) * y) AS qb
              FROM base GROUP BY 1),
            pre AS (
              SELECT x,
                     CAST(sum(nb) OVER (ORDER BY x) AS BIGINT) AS cn,
                     CAST(sum(sb) OVER (ORDER BY x) AS BIGINT) AS cs,
                     CAST(sum(nb) OVER () AS BIGINT) AS n,
                     CAST(sum(sb) OVER () AS BIGINT) AS st,
                     CAST(sum(qb) OVER () AS DOUBLE) AS qt
              FROM hist
              QUALIFY cn < n)
            SELECT x AS split_le, n,
                   CAST(round(CAST(cs AS DOUBLE) * cs / cn +
                     (CAST(st AS DOUBLE) - cs) * (CAST(st AS DOUBLE) - cs)
                       / (n - cn) -
                     CAST(st AS DOUBLE) * st / n, 0) AS BIGINT) AS gain_c2,
                   cs // cn AS left_cents,
                   (st - cs) // (n - cn) AS right_cents,
                   CAST(round((qt - CAST(st AS DOUBLE) * st / n) / n, 0)
                     AS BIGINT) AS mse_before_c2,
                   CAST(round((qt - CAST(cs AS DOUBLE) * cs / cn -
                     (CAST(st AS DOUBLE) - cs) * (CAST(st AS DOUBLE) - cs)
                       / (n - cn)) / n, 0) AS BIGINT) AS mse_after_c2
            FROM pre
            ORDER BY CAST(cs AS DOUBLE) * cs / cn +
                     (CAST(st AS DOUBLE) - cs) * (CAST(st AS DOUBLE) - cs)
                       / (n - cn) -
                     CAST(st AS DOUBLE) * st / n DESC, x
            LIMIT 1"""))

  val all: Seq[Q] = Seq(fisherExact, kcenter, boostStump)
}
