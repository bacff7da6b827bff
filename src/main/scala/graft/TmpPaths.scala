package graft

/** Per-invocation unique temp directories for standing-state demos
  * (fingerprint registries and similar versioned-table scratch state).
  *
  * A fixed name keyed on the input dir's hashCode raced when two
  * drivers ran the same key concurrently (e.g. Verify and Bench over
  * one data dir): delete-at-entry / append / lazy-read interleavings
  * could flip the gate nondeterministically. A UUID suffix isolates
  * invocations completely; a JVM shutdown hook sweeps everything this
  * process created so repeated runs do not accumulate in /tmp. The
  * directory must outlive the returning function (the gated result is
  * a LAZY read through the table), which is why cleanup is at JVM
  * exit, not at function exit.
  *
  * Accumulation within a long-lived process is capped at ONE live path
  * per prefix: requesting a prefix again deletes the path the previous
  * request created. That is safe because every flow that re-invokes a
  * key (the Verify loop, Bench reps, a spec's assertions) materializes
  * the prior invocation's gated result before the next call reaches
  * `unique` — the lazy read is done by then — while two DIFFERENT
  * drivers racing the same key sit in different JVMs and therefore
  * different `lastForPrefix` maps, preserving the race fix.
  */
object TmpPaths {
  private val created =
    new java.util.concurrent.ConcurrentLinkedQueue[java.io.File]

  private val lastForPrefix =
    new java.util.concurrent.ConcurrentHashMap[String, java.io.File]

  private lazy val hookInstalled: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      created.forEach(f => deleteRecursively(f))
    }))

  private def deleteRecursively(f: java.io.File): Unit = {
    val kids = f.listFiles()
    if (kids != null) kids.foreach(deleteRecursively)
    f.delete(); ()
  }

  /** A fresh, not-yet-existing tmp path unique to this call. The
    * previous path handed out for the same prefix (if any) is deleted
    * now — its gated result has been materialized by every caller's
    * contract (see class doc) — so a process holds at most one live
    * copy per prefix.
    */
  def unique(prefix: String): String = {
    hookInstalled
    val f = new java.io.File(
      System.getProperty("java.io.tmpdir"),
      s"${prefix}_${java.util.UUID.randomUUID().toString.replace("-", "")}")
    val prev = lastForPrefix.put(prefix, f)
    if (prev != null) {
      created.remove(prev)
      deleteRecursively(prev)
    }
    created.add(f)
    f.toString
  }
}
