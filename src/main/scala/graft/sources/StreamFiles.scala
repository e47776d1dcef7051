package graft.sources

import java.io.File

/** Shared scaffold for the trace-replay round trips (S2 text, S3 FSL):
  * a per-stream file writer whose output a later `spark.read` resolves
  * as a plan-time glob, so a silently-incomplete write must fail AT
  * WRITE TIME. Write, check every expected stream file on disk, retry
  * once, then fail loudly. */
private[sources] object StreamFiles {

  def rm(f: File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(rm)
    f.delete(); ()
  }

  /** Per-(corpus, process) scratch dir under java.io.tmpdir. The key is
    * a SHA-1 of the corpus path (collision-resistant — a 32-bit
    * hashCode let two different corpus dirs share one scratch dir) plus
    * the pid, so two concurrent JVMs over the SAME corpus never race
    * each other's rm/rewrite against in-flight reads. Registered for
    * deletion at JVM exit. */
  def scratchDir(prefix: String, corpusDir: String): File = {
    val sha = java.security.MessageDigest.getInstance("SHA-1")
      .digest(corpusDir.getBytes("UTF-8"))
      .take(8).map(b => f"$b%02x").mkString
    val d = new File(sys.props("java.io.tmpdir"),
      s"$prefix-$sha-p${ProcessHandle.current().pid()}")
    cleanupOnExit(d)
    d
  }

  private val registered = scala.collection.mutable.Set.empty[String]
  private def cleanupOnExit(d: File): Unit = registered.synchronized {
    if (registered.add(d.getPath)) {
      Runtime.getRuntime.addShutdownHook(new Thread(() => rm(d)))
      ()
    }
  }

  /** Stale streams from a previous invocation are removed even when
    * nothing will be rewritten — an empty input must fail loudly here,
    * never silently replay the previous corpus's files. */
  def writeChecked(tmp: File, expected: Seq[String], label: String)
                  (write: => Unit): Unit = {
    rm(tmp)
    require(expected.nonEmpty, s"$label: no stream files expected (empty input)")
    var attempt = 0
    var missing = expected
    while (missing.nonEmpty && attempt < 2) {
      if (attempt > 0) rm(tmp)
      write
      missing = expected.filterNot(f => new File(tmp, f).isFile)
      attempt += 1
    }
    require(missing.isEmpty,
      s"$label: ${missing.length}/${expected.length} stream files missing " +
        s"after $attempt attempts (first: ${missing.headOption.getOrElse("")})")
  }
}
