package graft.pipeline

import graft.core.DedupConfig
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Delete / GC over the incremental stores — the Spark recast of
  * destor's delete + manifest-truncation path (reference: do_delete
  * src/do_delete.c:23-112 computes the live set and reclaims what no
  * surviving backup references; trunc_manifest src/cma.c:83-139 updates
  * the manifest BEFORE space is reclaimed; the retention trigger
  * src/destor.c:318-322 fires delete when backups exceed the retention
  * window).
  *
  * Mapping:
  *   D1 manifest update   — TableIO.dropBatch rewrites the store
  *                          manifest first, then deletes the batch dir
  *   D2 truncate/retention— expire()/retainLast() drop whole ingest
  *                          batches from every store
  *   D3 index reclaim     — surviving EDGE batches may reference
  *                          dropped image ids (cross-batch dup pairs);
  *                          they are compacted by anti-join against the
  *                          dropped-id set. Postings/signatures/images
  *                          are batch-owned (every row belongs to the
  *                          batch that ingested it), so dropping the
  *                          batch dir reclaims them exactly — no
  *                          dangling entries by construction.
  *   D4 retention trigger — retainLast(n) expires everything older
  *                          than the newest n batches.
  *
  * After reclaim, `clusters_current` is recomputed from the surviving
  * vertices + compacted edges — components split correctly when their
  * bridge rows are deleted (a previous assignment cannot be reused for
  * that reason).
  */
final class Retention(
    spark: SparkSession,
    workDir: String,
    cfg: DedupConfig = DedupConfig.default) {

  import IncrementalDedup._

  import Retention.Report

  val io: TableBackend = new TableIO(spark, workDir)

  /** Expire the given ingest batches from every store, reclaim index
    * entries that reference them, and recompute the cluster table. */
  def expire(runIds: Seq[String], gcRunId: String): Report = {
    val present = io.batches(ImagesStore)
    val toDrop = runIds.filter(present.contains)
    if (toDrop.isEmpty) return Report(Seq.empty, 0L, 0L,
      if (io.hasBatches(ImagesStore)) io.readBatches(ImagesStore).count() else 0L)

    // the dropped-id set (read ONLY the dropped batch dirs, id column).
    // Materialized DURABLY before any dir is deleted: a cached-only
    // copy whose blocks are lost AFTER the drop would recompute its
    // lineage from paths that no longer exist and abort GC mid-way.
    // The tmp name carries ".tmp-" so a crashed GC's copy is reclaimed
    // by the same gcOrphans sweep as crashed publishes.
    val dropTmp = s"$workDir/gc-dropids.tmp-$gcRunId"
    toDrop.map(r => io.readBatch(ImagesStore, r).select("image_id"))
      .reduce(_ unionByName _).distinct()
      .write.mode("overwrite").parquet(dropTmp)
    val dropIds = spark.read.parquet(dropTmp)
    val droppedImages = dropIds.count()

    // D1 + D2: manifest-first batch drops from every batch-owned store
    for (store <- Seq(ImagesStore, SigStore, PostStore, EdgeStore); r <- toDrop)
      if (io.batches(store).contains(r)) io.dropBatch(store, r)

    // D3: compact surviving edge batches that reference dropped ids
    // (cross-batch pairs discovered by a LATER, surviving ingest) —
    // ONE anti-join job over the batch-union with the batch id as a
    // column, instead of the round-2 per-batch count+count+rewrite loop
    // (thousands of ingest batches meant thousands of serial Spark
    // jobs). Only touched batches are rewritten; untouched batch dirs
    // stay byte-identical.
    val reclaimed = compactEdges(dropIds, gcRunId)

    // recompute clusters over the surviving corpus
    val surviving =
      if (io.hasBatches(ImagesStore)) io.readBatches(ImagesStore).select("image_id")
      else spark.emptyDataFrame.withColumn("image_id", lit(""))
    val survivingCount = surviving.count()
    if (survivingCount > 0) {
      val edges =
        if (io.hasBatches(EdgeStore))
          io.readBatches(EdgeStore).select(col("id1").as("src"), col("id2").as("dst"))
        else surviving.limit(0).select(col("image_id").as("src"), col("image_id").as("dst"))
      val assign = graft.cluster.ConnectedComponents.run(
          spark, surviving.select(col("image_id").as("id")), edges)
        .select(col("id").as("image_id"), col("component").as("cluster_id"),
          (col("id") === col("component")).as("representative"))
      io.publish(assign, ClustersTable, cfg.configHash, gcRunId)
    } else if (io.exists(ClustersTable)) {
      io.drop(ClustersTable)
    }
    org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(dropTmp), spark.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path(dropTmp), true)
    Report(toDrop, droppedImages, reclaimed, survivingCount)
  }

  /** D3 edge-store compaction against a dropped-id set, batch-count
    * independent: ONE job materializes the anti-joined union of every
    * surviving edge batch (batch id as a column) to a durable tmp
    * table, ONE job counts survivors per batch, and only batches whose
    * footer count differs are rewritten (from the tmp table — never
    * from plans over the dirs being replaced). Returns edges reclaimed. */
  private[graft] def compactEdges(dropIds: DataFrame, gcRunId: String): Long = {
    val batchIds = io.batches(EdgeStore)
    if (batchIds.isEmpty) return 0L
    val pruned = io.readBatchesTagged(EdgeStore, "__batch")
      .join(dropIds.withColumnRenamed("image_id", "id1"), Seq("id1"), "left_anti")
      .join(dropIds.withColumnRenamed("image_id", "id2"), Seq("id2"), "left_anti")
    // durable materialization BEFORE any dir is rewritten: a lazy plan
    // (or cached-only copy) would recompute its lineage from batch dirs
    // this method is about to replace. Same ".tmp-" reclaim discipline
    // as the dropIds copy.
    val edgesTmp = s"$workDir/gc-edges.tmp-$gcRunId"
    pruned.write.mode("overwrite").parquet(edgesTmp)
    val survivors = spark.read.parquet(edgesTmp)
    val after = survivors.groupBy("__batch").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    var reclaimed = 0L
    for (r <- batchIds) {
      val before = io.batchRowCount(EdgeStore, r) // footers — no job
      val kept = after.getOrElse(r, 0L)
      if (kept != before) {
        io.rewriteBatch(
          survivors.filter(col("__batch") === r).drop("__batch"), EdgeStore, r)
        reclaimed += before - kept
      }
    }
    org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(edgesTmp), spark.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path(edgesTmp), true)
    reclaimed
  }

  /** D4 retention trigger: keep only the newest `n` ingest batches
    * (destor fires do_delete when jcr.id - retention crosses zero,
    * src/destor.c:318-322). */
  def retainLast(n: Int, gcRunId: String): Report = {
    val all = io.batches(ImagesStore)
    expire(all.dropRight(n), gcRunId)
  }

  /** GC crashed-publish leftovers (invisible-by-protocol tmp dirs). */
  def gcOrphans(): Seq[String] = io.gcOrphans()
}

object Retention {
  final case class Report(
      droppedBatches: Seq[String],
      droppedImages: Long,
      reclaimedEdges: Long,
      survivingImages: Long)
}
