package graft

import org.scalatest.funsuite.AnyFunSuite

/** The spark-submit surface (core/Sessions.submit) exercised for real:
  * tools/submit_smoke.sh jars the compiled classes and drives
  * `graft.Cli trace` through an actual spark-submit (local master
  * standing in for the cluster manager — the session still comes from
  * Sessions.submit, with master/memory supplied by the submit command,
  * exactly the deployment wiring). Skipped cleanly when no
  * spark-submit is installed. */
class SubmitSmokeSpec extends AnyFunSuite {

  test("spark-submit drives the CLI through Sessions.submit") {
    val submit = new java.io.File(
      sys.env.getOrElse("SPARK_SUBMIT", "/opt/spark/bin/spark-submit"))
    assume(submit.canExecute, s"no spark-submit at $submit")
    assume(new java.io.File("target/scala-2.13/classes/graft/Cli.class").exists,
      "library classes not compiled")
    val log = java.nio.file.Files.createTempFile("submit-smoke", ".log").toString
    val p = new ProcessBuilder("bash", "tools/submit_smoke.sh", log)
      .redirectErrorStream(true)
    val proc = p.start()
    val out = new String(proc.getInputStream.readAllBytes(), "UTF-8")
    val code = proc.waitFor()
    assert(code == 0, s"submit smoke failed (exit $code):\n$out\n--- log tail ---\n" +
      scala.util.Try(java.nio.file.Files.readString(java.nio.file.Paths.get(log))
        .linesIterator.toSeq.takeRight(20).mkString("\n")).getOrElse("<no log>"))
    assert(out.contains("SUBMIT SMOKE OK"), out)
  }
}
