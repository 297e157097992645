package graft.engine

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

import graft.sources.{Sinks, Sources}

/** Validation / quality surface (SURVEY §2.6, V1–V3). */
object Validate {

  /** V1 — schema contract result. */
  final case class ContractReport(table: String, missing: Seq[String], rows: Long) {
    def ok: Boolean = missing.isEmpty
  }

  /** V1 + V2 — required-column assert + summary (rows, columns, head)
    * (reference validate_data.py:9-36).
    */
  def report(name: String, df: DataFrame, required: Seq[String],
             show: Boolean = false): ContractReport = {
    val missing = Ops.missingColumns(df, required)
    if (show) df.show(5, truncate = false)
    ContractReport(name, missing, df.count())
  }

  /** V3 — preflight repair (reference ensure_min_files.py:10-25): if the
    * CSV is missing, empty, or its header doesn't contain every canonical
    * column, rewrite it as empty-but-valid. Returns true if repaired.
    */
  def ensureMinCsv(path: String, schema: StructType): Boolean = {
    val p = Paths.get(path)
    // only the header line is needed — readAllLines would materialize an
    // arbitrarily large (or corrupt) file on the driver just to check it
    val valid = Files.exists(p) && {
      val reader = Files.newBufferedReader(p)
      val first = try reader.readLine() finally reader.close()
      first != null && {
        val header = first.split(",").map(_.trim).toSet
        schema.fieldNames.forall(header.contains)
      }
    }
    if (!valid) Sinks.emptyValidCsv(schema, path)
    !valid
  }

  /** F17 — sport-key auto-detect over the (driver-side) sports catalog
    * (reference fetch_the_odds_api.py:87-110): first key containing
    * "soccer" AND ("uefa" or "champ"), else the ordered fallbacks, else
    * the first soccer key.
    */
  def pickSportKey(catalogKeys: Seq[String],
                   fallbacks: Seq[String] = Seq("soccer_epl", "soccer_uefa_europa_league"))
  : Option[String] = {
    val soccer = catalogKeys.filter(_.toLowerCase.contains("soccer"))
    soccer.find { k =>
      val l = k.toLowerCase
      l.contains("uefa") || l.contains("champ")
    }.orElse(fallbacks.find(catalogKeys.contains))
      .orElse(soccer.headOption)
  }
}
