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
    runId: String,
    inputKey: String = "") {

  val io: TableBackend = new TableIO(spark, workDir)
  /** Stage key = config hash + input-identity fingerprint: a resumed
    * run in the same workDir with a DIFFERENT corpus (but same config)
    * must recompute, not silently return the previous run's tables —
    * the analog of destor tying recipe/container stores to the backup
    * job's trace. */
  val stageKey: String = if (inputKey.isEmpty) cfg.configHash else s"${cfg.configHash}-$inputKey"
  private val lineageBuf = scala.collection.mutable.ArrayBuffer.empty[LineageRow]
  private val metricsBuf = scala.collection.mutable.ArrayBuffer.empty[MetricRow]
  private val resumedStages = scala.collection.mutable.ArrayBuffer.empty[String]

  /** Run (or resume) one stage: returns the PUBLISHED table as a
    * DataFrame, so downstream stages always read the checkpoint (plans
    * never grow beyond one stage — bounded lineage at any scale). */
  def stage(name: String)(compute: => DataFrame): DataFrame = {
    if (io.isPublished(name, stageKey)) {
      resumedStages += name
      metricsBuf += MetricRow(name, "resumed", 1.0, runId)
      return io.read(name)
    }
    val t0 = System.nanoTime()
    // per-file row counts come from the publish's parquet footers
    // (metadata only) — no post-write re-scan of the table
    val (rows, perFile) = io.publishWithFiles(compute, name, stageKey, runId)
    val wallMs = (System.nanoTime() - t0) / 1000000
    lineageBuf ++= perFile.zipWithIndex.map { case ((_, n), i) =>
      LineageRow(name, i, n, wallMs, runId)
    }
    metricsBuf += MetricRow(name, "rows", rows.toDouble, runId)
    metricsBuf += MetricRow(name, "wall_ms", wallMs.toDouble, runId)
    metricsBuf += MetricRow(name, "rows_per_sec", if (wallMs == 0) 0 else rows * 1000.0 / wallMs, runId)
    io.read(name)
  }

  def stagesResumed: Seq[String] = resumedStages.toSeq

  /** Record an ad-hoc metric observation alongside a stage (jcr-counter
    * analog for values the stage computes internally, e.g. the CBR
    * cap_used or HAR inherited-bucket count). */
  def noteMetric(stage: String, metric: String, value: Double): Unit =
    metricsBuf += MetricRow(stage, metric, value, runId)

  /** Publish accumulated lineage + metrics tables (call once at end). */
  def finish(): Unit = {
    import spark.implicits._
    io.publish(lineageBuf.toSeq.toDF(), s"lineage_$runId", stageKey, runId)
    io.publish(metricsBuf.toSeq.toDF(), s"metrics_$runId", stageKey, runId)
  }

  def metrics: Seq[MetricRow] = metricsBuf.toSeq
}

/** The checkpointed form of DedupPipeline: each stage reads the
  * previous stage's PUBLISHED parquet, so a killed run resumes from
  * the last complete stage with identical results (determinism test in
  * ResumeSpec). */
object CheckpointedPipeline {

  /** @param datasetId optional caller-supplied input identity; when
    *   absent, a fingerprint is computed from the input with one narrow
    *   3-column aggregate (count + order-independent sum of row hashes
    *   over id/caption/phash — `bytes` stays pruned out of the scan).
    */
  def run(
      images: Dataset[ImageRow],
      cfg: DedupConfig,
      workDir: String,
      runId: String,
      datasetId: Option[String] = None): (DataFrame, StageRunner) = {
    val spark = images.sparkSession
    import spark.implicits._
    val inputKey = datasetId.getOrElse {
      val r = images.toDF()
        .agg(count(lit(1)), expr("bit_xor(xxhash64(image_id, caption, phash))"))
        .first()
      val n = r.getLong(0)
      val h = if (r.isNullAt(1)) 0L else r.getLong(1)
      java.lang.Long.toHexString(n ^ graft.signatures.Sig.mix64(h))
    }
    val runner = new StageRunner(spark, workDir, cfg, runId, inputKey)
    // the checkpointed flow owns durable storage, so route the CC
    // loop's lineage cuts there too: an executor loss mid-CC then
    // resumes from the last reliable cut instead of recomputing the
    // label chain from round 0 (ConnectedComponents picks this up via
    // sc.getCheckpointDir). Set UNCONDITIONALLY: the dir is session-
    // global, and a second SEQUENTIAL run in the same session with a
    // different workDir must not write its "durable" cuts into the
    // first run's workDir (which may be retired underneath it).
    // CONTRACT: at most one CheckpointedPipeline run per SparkSession
    // at a time — the checkpoint dir is session-global state, so two
    // CONCURRENT runs sharing a session would race it (one run's cuts
    // landing in the other's possibly-retired workDir). Concurrent
    // pipelines must use separate sessions (spark.newSession() shares
    // the session-global SparkContext checkpoint dir too — use separate
    // contexts, i.e. separate driver processes, or serialize the runs).
    // This also means a caller-configured checkpoint dir is overridden
    // for the session; run pipelines last or reset it afterwards.
    spark.sparkContext.setCheckpointDir(s"$workDir/rdd-checkpoints")

    // signature-only simulation (destor's metadata-only simulation
    // levels, src/destor.h:55-59): the published images checkpoint
    // carries ONLY the metadata columns — `bytes` is neither read nor
    // written anywhere in the flow
    val imagesDf = runner.stage("images")(
      if (cfg.signatureOnly) images.toDF().select("image_id", "caption", "phash")
      else images.toDF())

    val sigs = runner.stage("signatures")(
      DedupPipeline.signaturesFromDF(imagesDf, cfg).toDF())
    def sigsDs = sigs.as[SignatureRow]

    // P9 degenerate-input counters (zero-chunk jcr analog): one narrow
    // aggregate over the published signature checkpoint
    locally {
      val d = sigs.agg(
        sum(when(col("degenerate"), 1L).otherwise(0L)),
        sum(when(length(trim(col("caption"))) === 0, 1L).otherwise(0L))).first()
      runner.noteMetric("signatures", "degenerate_pixel_rows",
        if (d.isNullAt(0)) 0.0 else d.getLong(0).toDouble)
      runner.noteMetric("signatures", "blank_caption_rows",
        if (d.isNullAt(1)) 0.0 else d.getLong(1).toDouble)
    }

    val buckets = runner.stage("lsh_buckets")(
      DedupPipeline.buckets(sigsDs, cfg).toDF())

    // Skew-aware candidates: CBR adaptive cap + HAR inheritance — the
    // hot-bucket table is keyed by CONFIG hash only (no input key): a
    // later run over a different/larger corpus inherits the previous
    // run's hot list, exactly destor's bv<id-1>.sparse handoff
    // (src/har_rewrite.c:17-57).
    val HarTable = "har_hot_buckets"
    // inherited list is MATERIALIZED to the driver (hot lists are tiny
    // by construction — only buckets above the cap) so republishing the
    // table below can never invalidate a lazy plan that still reads it
    val inheritedHot: Option[DataFrame] =
      if (runner.io.isPublished(HarTable, cfg.configHash)) {
        val hot = runner.io.readMaterialized(HarTable)
        if (hot.isEmpty) None else Some(hot)
      } else None
    var sk: Option[DedupPipeline.SkewAwareCandidates] = None
    val cand = runner.stage("candidate_pairs") {
      val s = DedupPipeline.candidatesSkewAware(buckets.as[BucketRow], cfg, inheritedHot)
      sk = Some(s)
      runner.noteMetric("candidate_pairs", "cap_used", s.capUsed.toDouble)
      runner.noteMetric("candidate_pairs", "har_inherited_buckets",
        inheritedHot.map(_.count().toDouble).getOrElse(0.0))
      s.pairs
    }
    // publish THIS run's hot list for the next run (bv<id>.sparse
    // analog) — after the pairs stage has fully materialized
    sk.foreach { s =>
      runner.io.publish(s.hotBuckets, HarTable, cfg.configHash, runId)
      s.cleanup()
    }

    val verified = {
      // verifyWithCleanup eagerly materializes its Mid cache, so it must
      // only run inside the stage thunk (skipped entirely on resume)
      var cleanupMid: () => Unit = () => ()
      val published = runner.stage("verified_pairs") {
        val (ver, cm, _) = DedupPipeline.verifyWithCleanup(cand, sigsDs, imagesDf, cfg)
        cleanupMid = cm
        ver.toDF()
      }
      cleanupMid() // stage publish materialized it; drop the Mid cache
      published
    }

    val clusters = runner.stage("clusters")(
      DedupPipeline.clusters(imagesDf, verified.as[VerifiedPair]).toDF())

    runner.finish()
    (clusters, runner)
  }
}
