package graft.entries

/** Map construction that REFUSES duplicate keys. Scala's `Map(...)`
  * literal silently keeps the last binding, so a re-used entry name
  * would quietly replace an existing graded query instead of failing
  * the build — exactly the coverage-loss bug this guards against
  * (`tpch_rollup` was once shadowed that way). Used for every
  * entries/oracle map in this package. */
object EntryMap {
  def apply[V](entries: (String, V)*): Map[String, V] = {
    val dups = entries.groupBy(_._1).collect { case (k, vs) if vs.size > 1 => k }
    require(dups.isEmpty, s"duplicate entry keys: ${dups.mkString(", ")}")
    entries.toMap
  }
}
