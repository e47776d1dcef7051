ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "destorspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Tungsten off-heap execution pages (16 MiB) come from malloc
// (Platform.allocateMemory); glibc's default mmap threshold (128 KiB,
// dynamic cap 32 MiB) sends every page alloc/free through
// mmap/munmap, and the kernel mm-lock churn serializes all 32 task
// threads (doc/shuffle-scaling-notes.md). Raising the threshold keeps
// big blocks on per-thread arena free lists: measured on the
// posting-shuffle stage (graft.ShuffleDiag 100k-group matrix),
// per-rep kernel sys-CPU fell 440→7 s and steady-state wall 7.3→5.3 s.
val mallocTuning = Map(
  "MALLOC_MMAP_THRESHOLD_" -> "268435456",
  "MALLOC_TRIM_THRESHOLD_" -> "268435456",
  "MALLOC_TOP_PAD_" -> "67108864",
  "MALLOC_ARENA_MAX" -> "64",
)
run / envVars ++= mallocTuning
Test / envVars ++= mallocTuning
// The driver parses ONE bare JSON line from `sbt runMain graft.Bench`
// stdout; sbt's default logger prefixes forked-process output with
// [info], which defeats that parse (BENCH_r01.json: "parsed": null).
// Inherit stdout instead so the JSON line arrives undecorated.
run / outputStrategy := Some(StdoutOutput)
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // local-mode Spark = one JVM: the heap IS executor memory for all 32
  // task threads. 8g thrashes GC at local[32] on 100k-image runs.
  // FIXED-SIZE heap (Xms == Xmx) is load-bearing on this kernel: with
  // an adaptive heap, GC grow/shrink cycles mmap/munmap heap regions
  // and the mm-lock churn serializes all 32 task threads (measured:
  // 400k-image pipeline 217 s adaptive vs 21 s fixed at local[32];
  // same pathology class as doc/shuffle-scaling-notes.md).
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
)
