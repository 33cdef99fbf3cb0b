package graft

/** JVM-scoped /tmp scratch roots for build-once-per-JVM artifact state
  * (signature stores, IVF indexes, staged layouts) used by bench/gate
  * queries.
  *
  * ADVICE r13: the former `p<pid>_<basename>` paths accumulated
  * unboundedly across runs, and a recycled PID + a regenerated dataset
  * with the same basename would silently serve a STALE store to a
  * rows-only-checked key. The nonce here adds the JVM start time
  * (unique per run even under PID reuse), and every root registers a
  * shutdown-hook recursive delete, so artifacts live exactly as long as
  * the build-once-per-JVM reuse they exist for (bench iteration 2 hits
  * the artifact; the next JVM rebuilds from data).
  */
object Scratch {
  private val nonce: String = {
    val pid = ProcessHandle.current().pid()
    val t = java.lang.management.ManagementFactory.getRuntimeMXBean.getStartTime
    s"p${pid}_t$t"
  }

  private val registered =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  private def rmTree(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rmTree))
    f.delete()
    ()
  }

  /** `/tmp/<family>/<nonce>[/<basename(dataDir)>]` — the whole nonce root
    * is removed at JVM exit. `dataDir` (when given) scopes the path per
    * dataset so sf0.01 and sf0.1 state never cross. */
  def dir(family: String, dataDir: String = ""): String = {
    val root = s"/tmp/$family/$nonce"
    if (registered.add(root)) {
      Runtime.getRuntime.addShutdownHook(new Thread(() =>
        try rmTree(new java.io.File(root))
        catch { case scala.util.control.NonFatal(_) => () }))
      ()
    }
    if (dataDir.isEmpty) root
    else s"$root/${new java.io.File(dataDir).getName}"
  }
}
