package graft

import org.scalatest.funsuite.AnyFunSuite

/** Inventory consistency canary — pure metadata checks, no Spark.
  *
  * SparkEntry derives its maps from Queries.all; a duplicated query name
  * would SILENTLY shadow an entry in the Map (one query stops being
  * graded with no error anywhere). This spec makes that loud.
  */
class InventorySpec extends AnyFunSuite {

  test("query names are unique — Map derivation drops nothing") {
    val names = Queries.all.map(_.name)
    val dups = names.groupBy(identity).filter(_._2.size > 1).keys.toSeq
    assert(dups.isEmpty, s"duplicate query names: ${dups.mkString(", ")}")
    assert(SparkEntry.queries.size == Queries.all.size)
  }

  test("every query has an oracle and a non-trivial doc") {
    val noOracle = Queries.all.filter(_.oracle.isEmpty).map(_.name)
    assert(noOracle.isEmpty,
      s"queries without DuckDB oracle (driver grades them weaker): " +
        noOracle.mkString(", "))
    Queries.all.foreach { q =>
      assert(q.doc.trim.length >= 40, s"${q.name}: doc too thin")
    }
  }

  test("names follow the category_slug convention") {
    val pat = "^[a-z][a-z0-9]*(_[a-z0-9]+)+$".r
    val bad = Queries.all.map(_.name).filterNot(n => pat.matches(n))
    assert(bad.isEmpty, s"non-conforming names: ${bad.mkString(", ")}")
  }

  test("oracle SQL never references a table outside the fixture set") {
    val tables = graft.engine.Engine.tableNames.toSet
    // crude token scan: any FROM/JOIN identifier must be a fixture table,
    // a CTE defined in the same query, or a subquery
    // negative lookbehind skips the `IS NOT DISTINCT FROM x` operator
    val fromRe = "(?is)(?<!distinct )\\b(?:from|join)\\s+([a-z_][a-z0-9_]*)".r
    Queries.all.foreach { q =>
      val sql = q.oracle.get
      // CTE names, including the recursive `name(cols) AS (` form
      val ctes = "(?is)([a-z_][a-z0-9_]*)\\s*(?:\\([^)]*\\))?\\s+as\\s*(?:materialized\\s*)?\\(".r
        .findAllMatchIn(sql).map(_.group(1).toLowerCase).toSet
      val refs = fromRe.findAllMatchIn(sql).map(_.group(1).toLowerCase)
        .filterNot(ctes)
        .filterNot(Set("lateral", "unnest", "range", "values"))
        .toSet
      val unknown = refs -- tables
      assert(unknown.isEmpty,
        s"${q.name}: oracle references unknown tables $unknown")
    }
  }
}
