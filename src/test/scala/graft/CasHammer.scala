package graft

/** Cross-process CAS hammer forked by `DurableStoreSpec`: increments
  * the integer in a [[graft.write.FileConditionalStore]] cell until it
  * has personally won `n` CASes, then prints its win count. Two of
  * these racing from SEPARATE JVMs prove the create-exclusive
  * arbitration across processes (the in-JVM thread race cannot): every
  * successful putIf advances the value by exactly one, so a double
  * winner anywhere leaves the final value below the summed wins. No
  * Spark session — the store resolves a plain local filesystem. */
object CasHammer {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val n = args(1).toInt
    val store = graft.write.FileConditionalStore.open(dir)
    var wins = 0
    while (wins < n) {
      val cur = store.get()
      val next = (cur.map(_.toInt).getOrElse(0) + 1).toString
      if (store.putIf(cur, next)) wins += 1
    }
    println(s"wins=$wins")
  }
}
