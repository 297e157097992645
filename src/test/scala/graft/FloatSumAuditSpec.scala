package graft

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

/** Hash-surface audit for `round(<float sum>)` outputs (VERDICT r5 task 5).
  *
  * A cross-row sum of doubles is accumulation-order-dependent: Spark sums
  * in partition order, DuckDB in its own vectorized order, and different
  * DuckDB builds (the driver's vs the local one) may even sum the same
  * list in different orders — so a rounded float-sum output can flip a
  * micro digit between engines even when every TERM is bit-identical.
  * The repo-wide discipline is micro/nano-rounded-TERMS-then-exact-
  * integer-SUM, with the output double reconstructed by one identical
  * division.
  *
  * Historical note: the rounds-4/6 `rag_context_pack` red cell that
  * motivated this spec turned out NOT to be float-sum ordering — the
  * r6 judge traced it to the oracle's uncast `sum(BIGINT) OVER (...)`
  * producing a DuckDB HUGEINT output column whose int128 serialization
  * flips the driver's dtype-sensitive hash. That hazard class is now
  * ratcheted separately: `tools/check.py` DESCRIBEs every oracle and
  * fails on HUGEINT/UHUGEINT/DECIMAL output columns. This spec remains
  * the guard for the (real, distinct) float-accumulation-order hazard.
  *
  * This spec scans the query sources: every textual `round(…sum(` site
  * must either be the hardened `round(sum(round(…` form or appear in the
  * justified allowlist below (integer-typed sums are order-proof by
  * construction). Adding a new raw float-sum output fails this test
  * until it is hardened or justified here.
  */
class FloatSumAuditSpec extends AnyFunSuite {

  // file -> substrings of JUSTIFIED raw round(sum(...)) sites.
  // Every entry must state why the sum is order-proof.
  private val justified: Map[String, Seq[(String, String)]] = Map(
    "QueriesR4n.scala" -> Seq(
      ("""round(sum("ch").cast(DoubleType) / sum("tk"), 4)""",
        "text_fertility: sums of BIGINT char counts — exact in any order"),
      ("""round(sum("by").cast(DoubleType) / sum("ch"), 4)""",
        "text_fertility: sums of BIGINT byte counts — exact in any order")),
    "QueriesR5h.scala" -> Seq(
      ("""round(sum("r").cast(DoubleType) / count(lit(1)) * 1e6, 0)""",
        "rec scores: r is BIGINT whole quantities — exact in any order")),
    "QueriesR9a.scala" -> Seq(
      ("""round(sum(col("em")).cast(DoubleType) / count(lit(1)), 6)""",
        "eval_token_f1 em_rate: em is a BIGINT 0/1 flag — exact in any order"),
      ("""round(sum(col("f1_micro")).cast(DoubleType) / count(lit(1)) / 1e6, 6)""",
        "eval_token_f1 mean_f1: f1_micro is micro-quantized BIGINT (rounded " +
          "per doc BEFORE the sum — the float-sum discipline)")),
    "QueriesR10a.scala" -> Seq(
      ("""round(sum(col("p_micro")).cast(DoubleType) / count(lit(1)) / 1e6, 6)""",
        "eval_rouge_l mean_p: p_micro is micro-quantized BIGINT (rounded " +
          "per doc BEFORE the sum — the float-sum discipline)"),
      ("""round(sum(col("r_micro")).cast(DoubleType) / count(lit(1)) / 1e6, 6)""",
        "eval_rouge_l mean_r: r_micro is micro-quantized BIGINT (rounded " +
          "per doc BEFORE the sum)"),
      ("""round(sum(col("f_micro")).cast(DoubleType) / count(lit(1)) / 1e6, 6)""",
        "eval_rouge_l mean_rouge_l: f_micro is micro-quantized BIGINT " +
          "(rounded per doc BEFORE the sum)"))
  )

  test("every round(float-sum) output is hardened or justified") {
    val dir = Paths.get("src/main/scala/graft")
    val files = Files.list(dir).iterator().asScala
      .filter(_.toString.endsWith(".scala")).toSeq
    val offending = scala.collection.mutable.Buffer.empty[String]
    for (f <- files) {
      val name = f.getFileName.toString
      val text = Files.readString(f)
      // flatten whitespace so multi-line expressions match textually
      val flat = text.replaceAll("\\s+", " ")
      val sitePattern = """round\((-?\s*)?sum\((?!round\()""".r
      for (m <- sitePattern.findAllMatchIn(flat)) {
        val ctx = flat.substring(m.start, math.min(flat.length, m.start + 160))
        val hardened =
          // nano/micro-rounded terms inside the sum (possibly under when())
          ctx.contains("sum(round(") ||
            ctx.matches(""".*sum\(when\(.{0,80}?round\(.*""") ||
            // integer-typed sum immediately cast for ONE division
            justified.getOrElse(name, Nil)
              .exists { case (sig, _) =>
                ctx.startsWith(sig.replaceAll("\\s+", " ").take(40)) ||
                  flat.contains(sig.replaceAll("\\s+", " "))
              }
        if (!hardened) offending += s"$name: ...${ctx.take(100)}..."
      }
    }
    assert(offending.isEmpty,
      s"raw float-sum-then-round outputs need hardening or a justification " +
        s"entry:\n${offending.mkString("\n")}")
  }
}
