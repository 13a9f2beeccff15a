package graft

/** Tripwire for the concurrent-Verify invariant the round-9 advisor
  * flagged as convention-only: every SIDE-EFFECTING index/state directory
  * is mutated by AT MOST ONE registered query. Verify runs queries on a
  * thread pool; two queries mutating one directory (appends, tombstone
  * deletes, compactions, re-balances) would race nondeterministically —
  * an invariant previously enforced only by each query choosing a
  * distinct `#suffix` key and the one committed green run.
  *
  * Mechanics: every mutating verb calls [[claim]] with the directory it
  * is about to change. Under the oracle gate (the `graft.oracleGate`
  * system property Verify sets) and with a query context installed
  * ([[setContext]], per worker task), the first claimant of a directory
  * becomes its owner and a claim by a DIFFERENT query name throws —
  * loudly, at the mutation site, instead of a nondeterministic
  * hash-mismatch three artifacts later. Outside the gate (applications,
  * benches, specs) claims are no-ops: sequential maintenance of one index
  * from several jobs is a legal production pattern, and Bench runs the
  * surface sequentially where sharing cannot race.
  */
object MutationGuard {
  private val owner =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private val current = new ThreadLocal[String] {
    override def initialValue(): String = ""
  }

  /** Install the registered-query name for the current worker thread
    * (Verify calls this at the top of each task).
    */
  def setContext(queryName: String): Unit = current.set(queryName)

  /** Record intent to mutate `path`; throws if a different registered
    * query already mutated it in this process (gate + context only).
    */
  def claim(path: String): Unit = {
    val me = current.get()
    if (me.nonEmpty && sys.props.contains("graft.oracleGate")) {
      val prev = owner.putIfAbsent(path, me)
      if (prev != null && prev != me)
        throw new IllegalStateException(
          s"mutation-key collision: '$path' is mutated by both '$prev' and " +
            s"'$me' — concurrent Verify would race on it; give each query " +
            "its own index/state key (distinct #suffix)")
    }
  }
}
