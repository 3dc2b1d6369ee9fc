package graft

/** Shared helpers for the query-definition files. */
package object queries {

  /** Render a Scala string list as a DuckDB list literal — one
    * implementation shared by every oracle that embeds the stopword
    * lists (previously copy-pasted per file). */
  private[queries] def duckList(words: Seq[String]): String =
    words.map(w => s"'$w'").mkString("[", ", ", "]")

  /** Per-process scratch directory under java.io.tmpdir: two graft
    * JVMs on one host (a verify overlapping a bench on CI) must not
    * clobber each other's on-disk indexes mid-probe — fixed shared
    * paths made that a silent wrong-rows race. Stable WITHIN a JVM so
    * bench iterations reuse their index; distinct across JVMs. */
  private[graft] def scratchPath(name: String): String =
    s"${sys.props("java.io.tmpdir")}/graft_${ProcessHandle.current().pid()}_$name"
}
