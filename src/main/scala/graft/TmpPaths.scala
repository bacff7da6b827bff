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
  */
object TmpPaths {
  private val created =
    new java.util.concurrent.ConcurrentLinkedQueue[java.io.File]

  private lazy val hookInstalled: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      created.forEach(f => deleteRecursively(f))
    }))

  private def deleteRecursively(f: java.io.File): Unit = {
    val kids = f.listFiles()
    if (kids != null) kids.foreach(deleteRecursively)
    f.delete(); ()
  }

  /** A fresh, not-yet-existing tmp path unique to this call. */
  def unique(prefix: String): String = {
    hookInstalled
    val f = new java.io.File(
      System.getProperty("java.io.tmpdir"),
      s"${prefix}_${java.util.UUID.randomUUID().toString.replace("-", "")}")
    created.add(f)
    f.toString
  }
}
