package graft

import graft.core.{DedupConfig, Sessions}
import graft.pipeline.DedupPipeline
import org.apache.spark.storage.StorageLevel

/** Shuffle-scaling diagnostic (not part of the driver contract): reps
  * the posting-shuffle-heavy candidates stage in one JVM and reports
  * per-rep wall, process user/sys CPU seconds, and machine-wide TLB
  * shootdown deltas — the system-time share attributes kernel-side
  * serialization (mmap/munmap churn, page-fault storms) that wall
  * time alone can't distinguish from co-tenant interference.
  * Usage: sbt "runMain graft.ShuffleDiag [nGroups] [reps]"
  */
object ShuffleDiag {

  private def cpuJiffies(): (Long, Long) = {
    val s = scala.io.Source.fromFile("/proc/self/stat").mkString.split(" ")
    (s(13).toLong, s(14).toLong)
  }

  private def tlbShootdowns(): Long =
    scala.io.Source.fromFile("/proc/interrupts").getLines()
      .find(_.contains("TLB shootdowns"))
      .map(_.split(":")(1).trim.split("\\s+").takeWhile(_.forall(_.isDigit)).map(_.toLong).sum)
      .getOrElse(0L)

  def main(args: Array[String]): Unit = {
    val nGroups = if (args.nonEmpty) args(0).toLong else 100000L
    val reps = if (args.length > 1) args(1).toInt else 4
    // confirms build.sbt's malloc tuning reached the forked JVM's env
    println(s"MALLOC_MMAP_THRESHOLD_=${sys.env.getOrElse("MALLOC_MMAP_THRESHOLD_", "<unset>")}")
    if (reps == 0) return
    val cfg = DedupConfig.default
    val spark = Sessions.local(32, 128, "graft-shufflediag")
    import spark.implicits._
    val base = if (new java.io.File("/dev/shm").isDirectory) "/dev/shm" else "/tmp"
    val dir = s"$base/graft-profile-corpus-$nGroups"
    if (!new java.io.File(dir, "_SUCCESS").exists())
      graft.synth.CorpusGen.generate(spark, nGroups).write.mode("overwrite").parquet(dir)
    val images = spark.read.parquet(dir).as[graft.core.ImageRow]
    val sigs = DedupPipeline.signatures(images, cfg).persist(StorageLevel.MEMORY_AND_DISK_SER)
    println(s"sigs=${sigs.count()} pageSize=${spark.conf.getOption("spark.buffer.pageSize")}")
    for (r <- 1 to reps) {
      System.gc(); Thread.sleep(300)
      val (u0, s0) = cpuJiffies(); val tl0 = tlbShootdowns(); val t0 = System.nanoTime()
      val n = DedupPipeline.candidates(DedupPipeline.buckets(sigs, cfg), cfg).count()
      val dt = (System.nanoTime() - t0) / 1e9
      val (u1, s1) = cpuJiffies(); val tl1 = tlbShootdowns()
      println(f"DIAG rep=$r wall=$dt%6.2f user=${(u1 - u0) / 100.0}%7.1f sys=${(s1 - s0) / 100.0}%7.1f tlb=${tl1 - tl0}%10d pairs=$n")
    }
    spark.stop()
  }
}
