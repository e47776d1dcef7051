package graft

import graft.core.DedupConfig
import graft.pipeline.{CheckpointedPipeline, TableIO}
import graft.synth.CorpusGen
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Checkpoint/resume semantics (north_rule): per-stage atomic publish,
  * resume skips completed stages, config change invalidates, lineage +
  * metrics tables are written. */
class ResumeSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.core.Sessions.local(4, 8, "resume-spec")
  val cfg = DedupConfig.default

  test("checkpointed run == direct run; resume skips all stages; config change recomputes") {
    val dir = Files.createTempDirectory("graft-ckpt").toString
    val corpus = CorpusGen.generate(spark, 10)
    val (clusters1, r1) = CheckpointedPipeline.run(corpus, cfg, dir, "run1")
    val a = clusters1.collect().map(r => (r.getString(0), r.getString(1))).sorted.toSeq
    assert(r1.stagesResumed.isEmpty)
    assert(a.nonEmpty)

    // resume: everything published -> all six stages skipped, same result
    val (clusters2, r2) = CheckpointedPipeline.run(corpus, cfg, dir, "run2")
    val b = clusters2.collect().map(r => (r.getString(0), r.getString(1))).sorted.toSeq
    assert(b == a)
    assert(r2.stagesResumed.toSet ==
      Set("images", "signatures", "lsh_buckets", "candidate_pairs", "verified_pairs", "clusters"))

    // partial resume: drop the last two stages -> only they recompute
    val io = new TableIO(spark, dir)
    io.drop("clusters")
    io.drop("verified_pairs")
    val (clusters3, r3) = CheckpointedPipeline.run(corpus, cfg, dir, "run3")
    val c = clusters3.collect().map(r => (r.getString(0), r.getString(1))).sorted.toSeq
    assert(c == a)
    assert(r3.stagesResumed.toSet ==
      Set("images", "signatures", "lsh_buckets", "candidate_pairs"))

    // config change invalidates every checkpoint
    val cfg2 = cfg.copy(jaccardMin = 0.85)
    val (_, r4) = CheckpointedPipeline.run(corpus, cfg2, dir, "run4")
    assert(r4.stagesResumed.isEmpty)

    // lineage + metrics published
    val lineage = io.read("lineage_run1").collect()
    assert(lineage.nonEmpty)
    val stages = lineage.map(_.getString(0)).toSet
    assert(stages.contains("signatures") && stages.contains("clusters"))
    val metrics = io.read("metrics_run1").collect()
    assert(metrics.exists(m => m.getString(0) == "clusters" && m.getString(1) == "rows"))
  }

  test("same config, different corpus => full recompute (input fingerprint)") {
    val dir = Files.createTempDirectory("graft-inputfp").toString
    val (cl1, r1) = CheckpointedPipeline.run(CorpusGen.generate(spark, 10), cfg, dir, "runA")
    assert(cl1.count() == 80 && r1.stagesResumed.isEmpty)
    // same config, same workDir, DIFFERENT corpus: nothing may be reused
    val (cl2, r2) = CheckpointedPipeline.run(CorpusGen.generate(spark, 12), cfg, dir, "runB")
    assert(r2.stagesResumed.isEmpty, "stale checkpoints reused for a different input")
    assert(cl2.count() == 96)
    // and re-running the second corpus resumes everything
    val (_, r3) = CheckpointedPipeline.run(CorpusGen.generate(spark, 12), cfg, dir, "runC")
    assert(r3.stagesResumed.nonEmpty)
  }

  test("interrupted publish leaves no half-visible table") {
    val dir = Files.createTempDirectory("graft-atomic").toString
    val io = new TableIO(spark, dir)
    import spark.implicits._
    io.publish(Seq(1, 2, 3).toDF("x"), "t", "h1", "r1")
    assert(io.isPublished("t", "h1"))
    assert(!io.isPublished("t", "OTHER")) // config mismatch = absent
    // simulate crash after data write but before manifest: delete manifest
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$dir/t/_MANIFEST.json"), false)
    assert(!io.isPublished("t", "h1")) // treated as absent -> recompute
  }
}
