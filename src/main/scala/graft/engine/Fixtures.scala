package graft.engine

/** Fixture-content fingerprints for session memo keys.
  *
  * Any session-memoized artifact derived from a fixture table (stream
  * replay inputs, memoized sinks, bucketed/partitioned scratch twins)
  * must fold the SOURCE table's content stamp into its memo key, so a
  * fixture regenerated mid-session rebuilds the artifact instead of
  * silently serving stale data (ADVICE r10/r11). Hoisted here in round
  * 13 (ADVICE r12) — QueriesR6a and QueriesR12a carried drift-prone
  * private copies.
  */
object Fixtures {

  /** Per-table content stamp. A single-file fixture stamps length:mtime
    * directly; a multi-file parquet DIR stamps total child size + max
    * child mtime — the directory entry's own mtime/length doesn't change
    * when a part file is rewritten in place (ADVICE r11).
    */
  def stampOf(d: String, table: String): String = {
    val f = new java.io.File(d, s"$table.parquet")
    if (f.isDirectory) {
      val kids = Option(f.listFiles()).getOrElse(Array.empty).filter(_.isFile)
      s"${kids.map(_.length).sum}:${kids.map(_.lastModified).foldLeft(0L)(math.max)}"
    } else s"${f.length}:${f.lastModified}"
  }
}
