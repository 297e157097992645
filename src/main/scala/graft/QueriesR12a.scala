package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.Engine

/** Round-12 batch: the graded skew-join path (VERDICT r11 task 2) — at
  * 100 TB, key skew is the #1 real-world join failure, and until this
  * round `Scale.saltedJoin` was only spec-asserted, never driven
  * end-to-end over a deliberately skewed key with a DuckDB oracle.
  */
object QueriesR12a {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Engine.table(s, dir, name)

  // ------------- j27_skew_salted: salted join over a Zipf-skewed key

  private val j27 = Q(
    "j27_skew_salted",
    "Skew-salted join over a DELIBERATELY Zipf-skewed key: zkey = " +
      "floor(100/(user_id%100+1)) gives the hottest key ~50% of all " +
      "fact rows (49 863 of 100 000 at sf0.1; next keys 17%, 8%, ... — " +
      "a 1/k(k+1) frequency tail), the worst-case shape where a plain " +
      "hash join serializes half the table through one task at ANY " +
      "cluster size. Scale.saltedJoin spreads each key across 16 " +
      "deterministic salt buckets (fact salt = hash(event_id) mod 16, " +
      "dim exploded 16-fold), then a per-(zkey,label) rollup of counts " +
      "+ exact cent-quantized sums. The salted result equals the plain " +
      "join, so the oracle is the UNSALTED SQL — correctness of the " +
      "rewrite is exactly what the hash-compare grades. A/B at sf0.1 " +
      "(tools/SkewAB, interleaved best-of-3, local[32]): salted 0.59 s " +
      "vs plain 0.48 s — ratio 1.24, i.e. at fixture scale (where the " +
      "50k-row hot key still fits one task) salting COSTS 24% for the " +
      "extra salt column + 16x dim replication; the boundary where it " +
      "wins is a hot key exceeding one executor's partition budget, " +
      "unreachable under local[32] fixtures by construction.",
    (s, d) => {
      // 100.0/(k+1) is a correctly-rounded division of tiny exact ints,
      // so floor() matches DuckDB's integer semantics bit-for-bit
      val fact = t(s, d, "events")
        .select(col("event_id"),
          floor(lit(100.0) / (col("user_id") % 100 + 1)).as("zkey"),
          round(col("value") * 100).cast("long").as("cents"))
      val dim = t(s, d, "supplier")
        .groupBy((col("s_suppkey") % 100).as("zkey"))
        .agg(min("s_name").as("label"))
      graft.engine.Scale.saltedJoin(fact, dim, "zkey", col("event_id"),
          buckets = 16, joinType = "left")
        .groupBy("zkey", "label")
        .agg(count(lit(1)).as("n"), sum("cents").as("sum_cents"))
        .transform(graft.engine.Ops.reportSort("zkey"))
    },
    Some("""WITH fact AS (
              SELECT event_id,
                     CAST(floor(100.0 / (user_id % 100 + 1)) AS BIGINT)
                       AS zkey,
                     CAST(round(value * 100) AS BIGINT) AS cents
              FROM events),
            dim AS (SELECT s_suppkey % 100 AS zkey, min(s_name) AS label
                    FROM supplier GROUP BY 1)
            SELECT zkey, label, CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(cents) AS BIGINT) AS sum_cents
            FROM fact LEFT JOIN dim USING (zkey)
            GROUP BY zkey, label ORDER BY zkey"""))

  val all: Seq[Q] = Seq(j27)
}
