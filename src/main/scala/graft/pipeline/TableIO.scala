package graft.pipeline

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Atomic table publish on any Hadoop FileSystem — the parquet+manifest
  * stand-in for Iceberg commits (no Iceberg jars ship in this sandbox;
  * the API is shaped so an Iceberg backend can replace it 1:1).
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
final class TableIO(spark: SparkSession, baseDir: String) {
  private def fs: FileSystem = new Path(baseDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
  private def tablePath(t: String) = new Path(baseDir, t)
  private def manifestPath(t: String) = new Path(tablePath(t), "_MANIFEST.json")

  /** Per-data-file row counts of a published table, from parquet footer
    * metadata only (no Spark job, no data pages read). */
  def fileCounts(table: String): Seq[(String, Long)] = {
    val f = fs
    val conf = spark.sparkContext.hadoopConfiguration
    f.listStatus(tablePath(table)).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .sortBy(_.getPath.getName)
      .map { s =>
        val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromStatus(s, conf)
        val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try s.getPath.getName -> reader.getRecordCount
        finally reader.close()
      }
  }

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
