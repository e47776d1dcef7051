package graft

import graft.ops.ChunkOps
import graft.signatures.Chunker
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Exact oracle for the chunk-level backup job (q_chunk_backup): the
  * distributed window/pack/agg machinery vs a single-threaded replay of
  * destor's backup loop (chunk, probe a growing fingerprint set, seal
  * containers per shard). The chunker math itself is ChunkerSpec's job;
  * here both sides share it, so any mismatch is in the Spark plan.
  */
class ChunkBackupSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.core.Sessions.local(4, 8, "chunkbackup-spec")
  val dir = "/root/testdata/sf0.001"
  private val p = Chunker.docParams
  private val containerBytes = 4096L

  test("chunk backup stats == single-threaded backup-loop replay") {
    val row = ChunkOps.chunkBackup(spark, dir, "fastcdc", p, containerBytes).collect()(0)

    // oracle: replay the backup job sequentially in doc_id, chunk_idx order
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    var nChunks = 0L; var nUnique = 0L; var total = 0L; var stored = 0L
    val seen = scala.collection.mutable.Set[Long]()
    // per-shard unique-byte tallies -> container count via pack()'s
    // floor((cum - size)/containerBytes) boundary rule
    val shardContainers = scala.collection.mutable.Map[Int, scala.collection.mutable.Set[Long]]()
    val shardCum = scala.collection.mutable.Map[Int, Long]().withDefaultValue(0L)
    for ((id, text) <- docs) {
      val b = text.getBytes("UTF-8")
      var off = 0
      for (end <- Chunker.fastcdc(b, p)) {
        val len = end - off
        val fp = Chunker.rangeFp(b, off, len)
        nChunks += 1; total += len
        if (seen.add(fp)) {
          nUnique += 1; stored += len
          // same shard function as chunkBackup: pmod(hash(fp), 32) — use
          // Spark to evaluate its Murmur3 hash on the driver
          val shard = math.floorMod(
            org.apache.spark.sql.catalyst.expressions.Murmur3HashFunction.hash(
              fp, org.apache.spark.sql.types.LongType, 42L).toInt, 32)
          val cum = shardCum(shard) + len
          shardCum(shard) = cum
          shardContainers.getOrElseUpdate(shard, scala.collection.mutable.Set[Long]()) +=
            (cum - len) / containerBytes
        }
        off = end
      }
    }
    val nContainers = shardContainers.values.map(_.size.toLong).sum

    assert(row.getAs[Long]("n_chunks") == nChunks)
    assert(row.getAs[Long]("n_unique") == nUnique)
    assert(row.getAs[Long]("total_bytes") == total)
    assert(row.getAs[Long]("stored_bytes") == stored)
    assert(row.getAs[Long]("n_containers") == nContainers)
    val ratio = BigDecimal((total - stored).toDouble / total)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(row.getAs[Double]("dedup_ratio") == ratio)
    // the synthetic corpus plants near-dup docs, so chunk-level dedup
    // must actually find shared content
    assert(nUnique < nChunks, "corpus should contain duplicate chunks")
  }

  test("chunk restore reproduces every slice byte-for-byte for every algorithm") {
    for (algo <- Chunker.algos) {
      val r = ChunkOps.chunkRestore(spark, dir, algo, p).collect()(0)
      assert(r.getAs[Long]("missing_chunks") == 0L, algo)
      assert(r.getAs[Long]("byte_mismatches") == 0L, algo)
      assert(r.getAs[Long]("all_restored") == 1L, algo)
    }
  }

  test("chunk restore detects a corrupted fetch (off-by-one would not pass silently)") {
    // sanity of the verify itself: shift every source offset by one and
    // the byte compare must flag (nearly) every multi-chunk fetch
    import org.apache.spark.sql.functions._
    val bytesDf = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("bytes"))
    val chunks = ChunkOps.chunkDocs(spark, dir, "fastcdc", p)
    val corrupted = chunks.join(bytesDf, "doc_id")
      .select(sum(when(
        expr("substring(bytes, off + 2, len)") =!= expr("substring(bytes, off + 1, len)"),
        1L).otherwise(0L)).as("diffs"))
      .collect()(0).getAs[Long]("diffs")
    assert(corrupted > 0L)
  }

  test("incremental chunk ingest: two backups == one-shot, re-backup dedups ~fully") {
    import org.apache.spark.sql.functions._
    val docsDf = spark.read.parquet(s"$dir/documents.parquet").select("doc_id", "text")
    val wd = java.nio.file.Files.createTempDirectory("chunk-ingest").toString
    val ing = new graft.pipeline.ChunkIngest(spark, wd)

    val a = ing.ingest(docsDf.filter(col("doc_id") < 250), "b1").collect()(0)
    val b = ing.ingest(docsDf.filter(col("doc_id") >= 250), "b2").collect()(0)

    // destor invariant: consecutive backups store exactly what one
    // backup of the union would — nothing recomputed, nothing lost
    val oneShot = ChunkOps.chunkBackup(spark, dir, "fastcdc", p, 4096L).collect()(0)
    assert(a.getAs[Long]("n_new") + b.getAs[Long]("n_new") ==
      oneShot.getAs[Long]("n_unique"))
    assert(a.getAs[Long]("new_bytes") + b.getAs[Long]("new_bytes") ==
      oneShot.getAs[Long]("stored_bytes"))
    assert(ing.store.select("fp").distinct().count() ==
      oneShot.getAs[Long]("n_unique"))

    // the daily re-backup: identical content under fresh doc ids must
    // dedup completely against the store (destor's headline ratio)
    val rerun = ing.ingest(
      docsDf.withColumn("doc_id", col("doc_id") + 1000000), "b3").collect()(0)
    assert(rerun.getAs[Long]("n_new") == 0L)
    assert(rerun.getAs[Double]("dedup_ratio") == 1.0)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(wd))
  }

  test("chunk backup is deterministic across reruns and algorithms stay distinct") {
    val a = ChunkOps.chunkBackup(spark, dir, "rabin", p, containerBytes).collect()(0)
    val b = ChunkOps.chunkBackup(spark, dir, "rabin", p, containerBytes).collect()(0)
    assert(a == b)
    val c = ChunkOps.chunkBackup(spark, dir, "ae", p, containerBytes).collect()(0)
    assert(a.getAs[Long]("n_chunks") != c.getAs[Long]("n_chunks") ||
      a.getAs[Long]("stored_bytes") != c.getAs[Long]("stored_bytes"))
  }
}
