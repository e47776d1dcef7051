package graft.pipeline

import graft.core._
import org.apache.spark.sql.{DataFrame, Dataset, Encoder, SparkSession}
import org.apache.spark.sql.functions._

/** Checkpointed, resumable pipeline execution (north_rule): every stage
  * publishes atomically via TableIO; a resumed run skips stages whose
  * manifest matches the current config hash — the Spark recast of
  * destor's container-log restartability (reference: persisted stat
  * store src/destor.c:136-215 + kv flush src/index/kvstore_htable.c:
  * 102-153, whose known weakness — crash => full rebuild, README.md:
  * 147-149 — is exactly what per-stage commits fix).
  *
  * Alongside each stage it appends:
  *   - `lineage`: per-partition (= per parquet file) row counts + wall
  *     time, the analog of destor's recipe store;
  *   - `metrics`: stage rows/sec + rows, the analog of jcr counters
  *     (src/jcr.h:19-61) and backup.log lines (src/do_backup.c:179-207).
  */
final class StageRunner(
    spark: SparkSession,
    workDir: String,
    cfg: DedupConfig,
    runId: String) {

  val io = new TableIO(spark, workDir)
  private val lineageBuf = scala.collection.mutable.ArrayBuffer.empty[LineageRow]
  private val metricsBuf = scala.collection.mutable.ArrayBuffer.empty[MetricRow]
  private val resumedStages = scala.collection.mutable.ArrayBuffer.empty[String]

  /** Run (or resume) one stage: returns the PUBLISHED table as a
    * DataFrame, so downstream stages always read the checkpoint (plans
    * never grow beyond one stage — bounded lineage at any scale). */
  def stage(name: String)(compute: => DataFrame): DataFrame = {
    if (io.isPublished(name, cfg.configHash)) {
      resumedStages += name
      metricsBuf += MetricRow(name, "resumed", 1.0, runId)
      return io.read(name)
    }
    val t0 = System.nanoTime()
    val rows = io.publish(compute, name, cfg.configHash, runId)
    val wallMs = (System.nanoTime() - t0) / 1000000
    val published = io.read(name)
    // per-partition lineage from the published parquet files
    val perFile = published.groupBy(input_file_name().as("file")).count()
      .collect().sortBy(_.getString(0))
    lineageBuf ++= perFile.zipWithIndex.map { case (r, i) =>
      LineageRow(name, i, r.getLong(1), wallMs, runId)
    }
    metricsBuf += MetricRow(name, "rows", rows.toDouble, runId)
    metricsBuf += MetricRow(name, "wall_ms", wallMs.toDouble, runId)
    metricsBuf += MetricRow(name, "rows_per_sec", if (wallMs == 0) 0 else rows * 1000.0 / wallMs, runId)
    published
  }

  def stagesResumed: Seq[String] = resumedStages.toSeq

  /** Publish accumulated lineage + metrics tables (call once at end). */
  def finish(): Unit = {
    import spark.implicits._
    io.publish(lineageBuf.toSeq.toDF(), s"lineage_$runId", cfg.configHash, runId)
    io.publish(metricsBuf.toSeq.toDF(), s"metrics_$runId", cfg.configHash, runId)
  }

  def metrics: Seq[MetricRow] = metricsBuf.toSeq
}

/** The checkpointed form of DedupPipeline: each stage reads the
  * previous stage's PUBLISHED parquet, so a killed run resumes from
  * the last complete stage with identical results (determinism test in
  * ResumeSpec). */
object CheckpointedPipeline {

  def run(
      images: Dataset[ImageRow],
      cfg: DedupConfig,
      workDir: String,
      runId: String): (DataFrame, StageRunner) = {
    val spark = images.sparkSession
    import spark.implicits._
    val runner = new StageRunner(spark, workDir, cfg, runId)

    val imagesDf = runner.stage("images")(images.toDF())
    def imagesDs = imagesDf.as[ImageRow]

    val sigs = runner.stage("signatures")(
      DedupPipeline.signatures(imagesDs, cfg).toDF())
    def sigsDs = sigs.as[SignatureRow]

    val buckets = runner.stage("lsh_buckets")(
      DedupPipeline.buckets(sigsDs, cfg).toDF())

    val cand = runner.stage("candidate_pairs")(
      DedupPipeline.candidates(buckets.as[BucketRow], cfg))

    val verified = runner.stage("verified_pairs")(
      DedupPipeline.verify(cand, sigsDs, imagesDs, cfg).toDF())

    val clusters = runner.stage("clusters")(
      DedupPipeline.clusters(imagesDs, verified.as[VerifiedPair]).toDF())

    runner.finish()
    (clusters, runner)
  }
}
