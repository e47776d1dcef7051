package graft.pipeline

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The table-layer contract every pipeline component is written
  * against (their `io` fields are typed as this trait, so swapping the
  * backend touches NO caller): atomic whole-table publish with a
  * config-hash guard, append-oriented batch stores with manifest-first
  * drop, and metadata-only row counts. Each operation maps 1:1 onto
  * Iceberg DDL when those jars are available (none ship in this
  * sandbox — SURVEY.md §7.1):
  *
  *  - publish/publishWithFiles  → CREATE OR REPLACE TABLE ... AS
  *                                (atomic snapshot swap); the config
  *                                hash rides a snapshot property
  *  - isPublished/exists/tables → catalog lookup + snapshot property
  *  - appendBatch               → an append commit (one snapshot),
  *                                runId as a snapshot/partition tag
  *  - rewriteBatch              → REPLACE of that partition (overwrite
  *                                commit filtered to the batch id)
  *  - dropBatch                 → DELETE WHERE batch = id + snapshot
  *                                expiry (manifest-first discipline is
  *                                exactly Iceberg's: metadata commit
  *                                precedes file reclaim)
  *  - readBatches/Tagged        → plain scans (batch id a column)
  *  - batchRowCount/fileCounts  → manifest/metadata tables, no job
  *  - gcOrphans                 → remove_orphan_files
  *  - drop                      → DROP TABLE PURGE
  */
trait TableBackend {
  def fileCounts(table: String): Seq[(String, Long)]
  def publish(df: DataFrame, table: String, configHash: String, runId: String): Long
  def publishWithFiles(df: DataFrame, table: String, configHash: String,
      runId: String): (Long, Seq[(String, Long)])
  def isPublished(table: String, configHash: String): Boolean
  def read(table: String): DataFrame
  def readMaterialized(table: String): DataFrame
  def batches(table: String): Seq[String]
  def appendBatch(df: DataFrame, table: String, runId: String): Long
  def rewriteBatch(df: DataFrame, table: String, runId: String): Unit
  def dropBatch(table: String, runId: String): Unit
  def readBatch(table: String, runId: String): DataFrame
  def batchRowCount(table: String, runId: String): Long
  def readBatches(table: String): DataFrame
  def readBatchesTagged(table: String, tagCol: String): DataFrame
  def hasBatches(table: String): Boolean = batches(table).nonEmpty
  def gcOrphans(): Seq[String]
  def exists(table: String): Boolean
  def drop(table: String): Unit
  def tables(): Seq[String]
}

/** Atomic table publish on any Hadoop FileSystem — the parquet+manifest
  * stand-in for Iceberg commits (no Iceberg jars ship in this sandbox;
  * the [[TableBackend]] contract is shaped so an Iceberg backend can
  * replace it 1:1).
  *
  * Publish protocol (the analog of destor's sealed-container +
  * recipe-store commit, reference: src/storage/containerstore.c:131-216
  * and src/recipe/recipestore.c:286-484):
  *   1. write parquet to `<table>.tmp-<runId>`
  *   2. delete any previous `<table>`
  *   3. rename tmp -> `<table>`   (atomic on HDFS / posix)
  *   4. write `<table>/_MANIFEST.json` (rows, config hash, run id)
  * A table without a manifest is treated as absent, so a crash between
  * 2 and 4 is safe: the stage simply recomputes on resume.
  *
  * Row counts come from the parquet FOOTERS (driver-side metadata reads,
  * one per file) — round 1 re-scanned the freshly written table twice
  * per stage (once to count, once for per-file lineage), which at 100 TB
  * is two extra full-table passes per stage.
  */
final class TableIO(spark: SparkSession, baseDir: String) extends TableBackend {
  private def fs: FileSystem = new Path(baseDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
  private def tablePath(t: String) = new Path(baseDir, t)
  private def manifestPath(t: String) = new Path(tablePath(t), "_MANIFEST.json")

  /** Per-data-file row counts under one directory, from parquet footer
    * metadata only (driver-side, no Spark job, no data pages read) —
    * the single implementation behind every footer-based count here. */
  private def footerCounts(dir: Path): Seq[(String, Long)] = {
    val f = fs
    val conf = spark.sparkContext.hadoopConfiguration
    f.listStatus(dir).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .sortBy(_.getPath.getName)
      .map { s =>
        val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromStatus(s, conf)
        val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try s.getPath.getName -> reader.getRecordCount
        finally reader.close()
      }
  }

  /** Per-data-file row counts of a published table, from parquet footer
    * metadata only (no Spark job, no data pages read). */
  def fileCounts(table: String): Seq[(String, Long)] =
    footerCounts(tablePath(table))

  def publish(df: DataFrame, table: String, configHash: String, runId: String): Long =
    publishWithFiles(df, table, configHash, runId)._1

  /** Publish and return (total rows, per-file row counts) — the
    * per-file counts feed the lineage table without re-scanning. */
  def publishWithFiles(df: DataFrame, table: String, configHash: String,
      runId: String): (Long, Seq[(String, Long)]) = {
    val f = fs
    val tmp = new Path(baseDir, s"$table.tmp-$runId")
    f.delete(tmp, true)
    df.write.mode("overwrite").parquet(tmp.toString)
    val dest = tablePath(table)
    f.delete(dest, true)
    if (!f.rename(tmp, dest))
      throw new java.io.IOException(s"atomic publish failed: $tmp -> $dest")
    val files = fileCounts(table)
    val rows = files.map(_._2).sum
    val manifest =
      s"""{"table":"$table","rows":$rows,"config_hash":"$configHash","run_id":"$runId","ts":${System.currentTimeMillis()}}"""
    val out = f.create(manifestPath(table), true)
    out.write(manifest.getBytes("UTF-8"))
    out.close()
    (rows, files)
  }

  /** True iff the table was fully published under the SAME config —
    * a config change invalidates every checkpoint (the configHash guard
    * in DedupConfig; callers fold an input-identity fingerprint into
    * the hash so a different corpus in the same workDir never silently
    * reuses stale stages). */
  def isPublished(table: String, configHash: String): Boolean = {
    val f = fs
    if (!f.exists(manifestPath(table))) return false
    val in = f.open(manifestPath(table))
    val txt = scala.io.Source.fromInputStream(in).mkString
    in.close()
    txt.contains(s""""config_hash":"$configHash"""")
  }

  def read(table: String): DataFrame = spark.read.parquet(tablePath(table).toString)

  /** Read a SMALL table fully materialized to the driver and re-created
    * as a local DataFrame — for control tables (e.g. the HAR hot-bucket
    * list) that are re-published while lazy plans still reference them:
    * a plan over the materialized copy can never observe the overwrite. */
  def readMaterialized(table: String): DataFrame = {
    val df = read(table)
    val rows = df.collect()
    spark.createDataFrame(spark.sparkContext.parallelize(rows.toSeq, 1), df.schema)
  }

  // ------------------------------------------------------------------
  // Append-oriented batch stores (incremental ingest / retention).
  //
  // Each batch is its own subdirectory `<table>/batch-<runId>`,
  // committed by the same tmp→rename protocol; `_STORE.json` lists the
  // committed batch ids IN INGEST ORDER. A batch directory not listed
  // in the manifest is invisible (a crash mid-append is simply retried).
  // This is the destor container-store append discipline
  // (src/storage/containerstore.c:131-216: containers are append-only,
  // the manifest/recordset tells which are live) — and what an Iceberg
  // append commit would replace 1:1.
  // ------------------------------------------------------------------
  private def storeManifestPath(t: String) = new Path(tablePath(t), "_STORE.json")
  private def batchPath(t: String, runId: String) = new Path(tablePath(t), s"batch-$runId")

  /** Committed batch run-ids of a store, in ingest order. */
  def batches(table: String): Seq[String] = {
    val f = fs
    if (!f.exists(storeManifestPath(table))) return Seq.empty
    val in = f.open(storeManifestPath(table))
    val txt = scala.io.Source.fromInputStream(in).mkString
    in.close()
    "\"([^\"]+)\"".r.findAllMatchIn(
      txt.substring(txt.indexOf('['), txt.indexOf(']') + 1)).map(_.group(1)).toSeq
  }

  private def writeStoreManifest(table: String, ids: Seq[String]): Unit = {
    val out = fs.create(storeManifestPath(table), true)
    out.write(s"""{"table":"$table","batches":[${ids.map("\"" + _ + "\"").mkString(",")}]}"""
      .getBytes("UTF-8"))
    out.close()
  }

  /** Append one batch to a store: tmp-write, rename into place, then
    * commit by rewriting the store manifest. Returns rows appended
    * (parquet footers — no re-scan). */
  def appendBatch(df: DataFrame, table: String, runId: String): Long = {
    val f = fs
    require(!batches(table).contains(runId), s"batch $runId already in $table")
    val tmp = new Path(baseDir, s"$table.tmp-$runId")
    f.delete(tmp, true)
    df.write.mode("overwrite").parquet(tmp.toString)
    val dest = batchPath(table, runId)
    f.delete(dest, true)
    f.mkdirs(tablePath(table))
    if (!f.rename(tmp, dest))
      throw new java.io.IOException(s"batch append failed: $tmp -> $dest")
    writeStoreManifest(table, batches(table) :+ runId)
    footerCounts(dest).map(_._2).sum
  }

  /** Replace one committed batch's data in place (index-entry reclaim:
    * retention rewrites surviving edge batches minus dropped ids). */
  def rewriteBatch(df: DataFrame, table: String, runId: String): Unit = {
    val f = fs
    require(batches(table).contains(runId), s"batch $runId not in $table")
    val tmp = new Path(baseDir, s"$table.tmp-rw-$runId")
    f.delete(tmp, true)
    df.write.mode("overwrite").parquet(tmp.toString)
    val dest = batchPath(table, runId)
    f.delete(dest, true)
    if (!f.rename(tmp, dest))
      throw new java.io.IOException(s"batch rewrite failed: $tmp -> $dest")
  }

  /** Drop one batch: remove it from the manifest FIRST (it becomes
    * invisible), then delete the directory (trunc_manifest discipline,
    * reference src/cma.c:83-139: manifest update precedes reclaim). */
  def dropBatch(table: String, runId: String): Unit = {
    writeStoreManifest(table, batches(table).filterNot(_ == runId))
    fs.delete(batchPath(table, runId), true)
  }

  /** Read one committed batch. */
  def readBatch(table: String, runId: String): DataFrame =
    spark.read.parquet(batchPath(table, runId).toString)

  /** Row count of one committed batch from parquet FOOTERS only —
    * driver-side metadata reads, no Spark job. */
  def batchRowCount(table: String, runId: String): Long =
    footerCounts(batchPath(table, runId)).map(_._2).sum

  /** Read the whole store (union of committed batches). */
  def readBatches(table: String): DataFrame = {
    val ids = batches(table)
    require(ids.nonEmpty, s"store $table has no batches")
    spark.read.parquet(ids.map(r => batchPath(table, r).toString): _*)
  }

  /** Read the whole store with the owning batch id attached as column
    * `tagCol`. The schema is inferred ONCE and pinned for every other
    * batch dir — a naive per-dir `spark.read.parquet` launches one
    * schema-inference job per batch, which turns any whole-store pass
    * into O(batches) Spark jobs. */
  def readBatchesTagged(table: String, tagCol: String): DataFrame = {
    import org.apache.spark.sql.functions.lit
    val ids = batches(table)
    require(ids.nonEmpty, s"store $table has no batches")
    val schema = spark.read.parquet(batchPath(table, ids.head).toString).schema
    ids.map { r =>
      spark.read.schema(schema).parquet(batchPath(table, r).toString)
        .withColumn(tagCol, lit(r))
    }.reduce(_ unionByName _)
  }

  /** GC crashed-publish leftovers: `*.tmp-*` directories are invisible
    * by protocol; delete them and report what was reclaimed. */
  def gcOrphans(): Seq[String] = {
    val f = fs
    val base = new Path(baseDir)
    if (!f.exists(base)) return Seq.empty
    f.listStatus(base).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.contains(".tmp-"))
      .map { s => f.delete(s.getPath, true); s.getPath.getName }
  }

  def exists(table: String): Boolean = fs.exists(manifestPath(table))

  def drop(table: String): Unit = fs.delete(tablePath(table), true)

  /** List published tables under the base dir (those with a manifest). */
  def tables(): Seq[String] = {
    val f = fs
    val base = new Path(baseDir)
    if (!f.exists(base)) return Seq.empty
    f.listStatus(base).toSeq
      .filter(s => s.isDirectory && f.exists(new Path(s.getPath, "_MANIFEST.json")))
      .map(_.getPath.getName)
      .sorted
  }
}
