package graft

import graft.core.{DedupConfig, Sessions}
import graft.pipeline.DedupPipeline
import graft.synth.CorpusGen
import org.apache.spark.sql.SparkSession

/** Per-stage scaling profiler (diagnostic tool, not part of the driver
  * contract): times each pipeline stage separately at two parallelism
  * levels over the same corpus, with stage boundaries materialized, so
  * the non-scaling residue seen in the end-to-end bench can be
  * attributed to a stage. Usage:
  *   sbt "runMain graft.Profile [nGroups] [cores...]"
  */
object Profile {

  private val cfg = DedupConfig.default

  private def time[T](label: String, cores: Int)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    val dt = (System.nanoTime() - t0) / 1e9
    println(f"PROFILE cores=$cores%2d $label%-14s $dt%8.2f s")
    r
  }

  /** Spark-stage-level listener: prints every completed stage's wall
    * time, task-time sum, GC sum, and shuffle bytes when GRAFT_STAGES=1. */
  private def attachStageLog(spark: SparkSession, cores: Int): Unit = {
    if (!sys.env.get("GRAFT_STAGES").contains("1")) return
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val i = sc.stageInfo
        val m = i.taskMetrics
        val wall = (for (a <- i.completionTime; b <- i.submissionTime) yield a - b).getOrElse(-1L)
        println(f"STAGE cores=$cores%3d id=${i.stageId}%4d wall=${wall / 1e3}%7.2fs " +
          f"taskSum=${m.executorRunTime / 1e3}%8.2fs gc=${m.jvmGCTime / 1e3}%6.2fs " +
          f"shufW=${m.shuffleWriteMetrics.bytesWritten / 1e6}%8.1fMB " +
          f"shufR=${m.shuffleReadMetrics.totalBytesRead / 1e6}%8.1fMB " +
          f"tasks=${i.numTasks}%4d ${i.name.takeWhile(_ != '\n').take(60)}")
      }
    })
  }

  private def runStages(spark: SparkSession, dir: String, cores: Int): Unit = {
    import spark.implicits._
    attachStageLog(spark, cores)
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER
    val images = spark.read.parquet(dir).as[graft.core.ImageRow]
    val sigs = time("signatures", cores) {
      val s = DedupPipeline.signatures(images, cfg).persist(lvl)
      s.count()
      s
    }
    // the LEAN candidates() path — what run() executes; the skew-aware
    // variant (persisted exchange + histogram) is the ingest path and
    // can be profiled separately if it regresses
    val cand = time("candidates", cores) {
      val p = DedupPipeline.candidates(DedupPipeline.buckets(sigs, cfg), cfg).persist(lvl)
      p.count()
      p
    }
    val ver = time("verify", cores) {
      val (v, cleanup, _) = DedupPipeline.verifyWithCleanup(cand, sigs, images.toDF(), cfg)
      val vp = v.persist(lvl)
      vp.count()
      cleanup()
      vp
    }
    time("clusters", cores) {
      DedupPipeline.clusters(images.toDF(), ver).count()
    }
    time("end_to_end", cores) {
      DedupPipeline.run(images, cfg).count()
    }
    sigs.unpersist(false); cand.unpersist(false); ver.unpersist(false)
  }

  def main(args: Array[String]): Unit = {
    val nGroups = if (args.nonEmpty) args(0).toLong else 40000L
    val cores = if (args.length > 1) args.drop(1).map(_.toInt).toSeq else Seq(8, 32)
    val base = if (new java.io.File("/dev/shm").isDirectory) "/dev/shm" else "/tmp"
    val dir = s"$base/graft-profile-corpus-$nGroups"
    locally {
      val s = Sessions.local(32, 128, "graft-profile-gen")
      if (!new java.io.File(dir, "_SUCCESS").exists())
        CorpusGen.generate(s, nGroups).write.mode("overwrite").parquet(dir)
      // JVM warmup so JIT/codegen noise stays out of the first timed level
      runStages(s, dir, -32)
      s.stop()
    }
    for (c <- cores) {
      val s = Sessions.local(c, 128, s"graft-profile-$c")
      System.gc(); Thread.sleep(300)
      runStages(s, dir, c)
      s.stop()
    }
  }
}
