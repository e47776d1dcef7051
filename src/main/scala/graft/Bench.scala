package graft

import graft.core.{DedupConfig, Sessions}
import graft.pipeline.DedupPipeline
import graft.synth.CorpusGen
import org.apache.spark.sql.SparkSession

/** Round benchmark (driver contract: ONE JSON line on stdout) + the
  * two-parallelism scaling protocol from BASELINE.md: the same
  * end-to-end pipeline at local[8] and local[32] on the same input,
  * reporting images/sec at both and the scaling efficiency
  * speedup/(32/8) — the sandbox stand-in for the N→4N-executor rule.
  *
  * Each parallelism level gets a fresh SparkSession (stopped between)
  * with shuffle partitions = 2x cores; a small warmup run precedes the
  * timed run so JIT/codegen compilation is excluded (BASELINE.md
  * protocol).
  */
object Bench {

  private val cfg = DedupConfig.default

  /** Timed end-to-end pipeline on a pre-materialized corpus (cache +
    * count BEFORE the clock starts — generation stands in for the
    * storage read, and the pipeline consumes `images` three times, so
    * an uncached corpus would triple-count synthesis instead of
    * measuring the engine). Returns (wallSec, images). */
  private def runPipeline(spark: SparkSession, nGroups: Long): (Double, Long) = {
    val corpus = CorpusGen.generate(spark, nGroups)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    corpus.count() // materialize outside the timed window
    val t0 = System.nanoTime()
    val n = DedupPipeline.run(corpus, cfg).count()
    val dt = (System.nanoTime() - t0) / 1e9
    corpus.unpersist(blocking = false)
    (dt, n)
  }

  private def session(cores: Int): SparkSession =
    Sessions.local(cores, 2 * cores, s"graft-bench-$cores")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val nGroups = SparkEntry.groupsFor(sfDir) * 5 // bench corpus: 5x the verify corpus
    val warmupGroups = math.max(2L, nGroups / 50)

    // headline per-query timings at local[32] (the driver-facing numbers)
    val spark32 = session(32)
    runPipeline(spark32, warmupGroups) // warmup: JIT + codegen
    val headline = Seq(
      "img_pipeline" -> (() => runPipeline(spark32, nGroups)._1),
      "minhash_dedup" -> (() => time(graft.text.TextOps.minhashDedup(spark32, sfDir, cfg).count())),
      "exact_dedup" -> (() => time(graft.text.TextOps.exactDedup(spark32, sfDir).count())),
      "agg_stats" -> (() => time(graft.ops.RelationalOps.aggStats(spark32, sfDir).count())),
      "topk_per_group" -> (() => time(graft.ops.RelationalOps.topKPerGroup(spark32, sfDir).count())),
      "embed_ann" -> (() => time(graft.sim.EmbedOps.annTopK(spark32, sfDir).count())),
      "substr_dups" -> (() => time(graft.text.TextOps.substrDedup(spark32, sfDir, cfg).count()))
    )
    val queryTimes = headline.map { case (name, f) => name -> f() }
    val t32 = queryTimes.head._2 // img_pipeline at 32 cores
    val images = nGroups * CorpusGen.GroupSize
    spark32.stop()

    // scaling protocol: same pipeline at local[8]
    val spark8 = session(8)
    runPipeline(spark8, warmupGroups)
    val (t8, _) = runPipeline(spark8, nGroups)
    spark8.stop()

    val ips32 = images / t32
    val ips8 = images / t8
    val eff = (t8 / t32) / 4.0

    val qs = queryTimes.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }.mkString("{", ",", "}")
    val total = queryTimes.map(_._2).sum
    println(
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir","images":$images,"images_per_sec_local32":$ips32%.1f,"images_per_sec_local8":$ips8%.1f,"scaling_efficiency_8_to_32":$eff%.3f}""")

    writeBenchMd(sfDir, images, t8, t32, ips8, ips32, eff, queryTimes)
  }

  private def time(f: => Unit): Double = {
    val t0 = System.nanoTime()
    f
    (System.nanoTime() - t0) / 1e9
  }

  private def writeBenchMd(sfDir: String, images: Long, t8: Double, t32: Double,
      ips8: Double, ips32: Double, eff: Double, queryTimes: Seq[(String, Double)]): Unit = {
    val dir = java.nio.file.Paths.get("BENCH")
    java.nio.file.Files.createDirectories(dir)
    val md = new StringBuilder
    md ++= s"# BENCH — two-parallelism scaling protocol (BASELINE.md)\n\n"
    md ++= s"End-to-end near-dup pipeline (corpus gen → signatures → LSH →\n"
    md ++= s"verify → clusters) on the deterministic synthetic corpus,\n"
    md ++= s"$images images, same input at both parallelism levels, JVM/codegen\n"
    md ++= s"warmup run excluded. sfDir=$sfDir\n\n"
    md ++= "| parallelism | wall s | images/sec | efficiency vs local[8] |\n"
    md ++= "|---|---|---|---|\n"
    md ++= f"| local[8]  | $t8%.2f | $ips8%.1f | 1.000 |\n"
    md ++= f"| local[32] | $t32%.2f | $ips32%.1f | $eff%.3f |\n\n"
    md ++= f"Scaling efficiency 8→32 cores (speedup/4): **$eff%.3f** (gate: ≥ 0.8)\n\n"
    md ++= "## Headline query timings at local[32]\n\n| query | sec |\n|---|---|\n"
    queryTimes.foreach { case (k, v) => md ++= f"| $k | $v%.3f |\n" }
    java.nio.file.Files.writeString(dir.resolve("BASELINE.md"), md.toString)
  }
}
