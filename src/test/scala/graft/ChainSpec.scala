package graft

import graft.core.DedupConfig
import graft.pipeline.{DedupPipeline, IncrementalDedup, Retention}
import graft.synth.CorpusGen
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Long-chain multi-version backup workload — the reference's primary
  * dataset shape is O(100) successive backup versions per stream
  * (scripts/benchmark.sh:53-63 loops backup over every version;
  * cma.c:12-15 retains across many jobs). IncrementalSpec proves 2-3
  * batches == one-shot; this spec runs a 20-VERSION chain with
  * retention firing mid-chain and asserts the chain stays exactly
  * equal to a one-shot run at every checkpoint, while the per-version
  * counters (images, store rows, clusters) accumulate the way
  * backup.log rows do. */
class ChainSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.core.Sessions.local(4, 8, "chain-spec")
  val cfg = DedupConfig.default

  test("20-version chain with mid-chain retention == one-shot at every checkpoint") {
    val dir = Files.createTempDirectory("graft-chain").toString
    val versions = 20
    val corpus = CorpusGen.generate(spark, 20).cache()
    corpus.count()
    // slice WITHIN dup groups (id modulo) so every version shares dup
    // classes with earlier versions — each backup re-encounters content
    // the chain has seen, the defining property of version chains
    val idNum = substring(col("image_id"), 4, 10).cast("long")
    def slice(v: Int) = corpus.filter(idNum % versions === v)

    def oneShot(over: org.apache.spark.sql.Dataset[graft.core.ImageRow]): Seq[(String, String)] =
      DedupPipeline.run(over, cfg).collect().map(r => (r.image_id, r.cluster_id)).sorted.toSeq
    def chainClusters(inc: IncrementalDedup): Seq[(String, String)] =
      inc.clusters.select("image_id", "cluster_id").collect()
        .map(r => (r.getString(0), r.getString(1))).sorted.toSeq

    val inc = new IncrementalDedup(spark, dir, cfg)
    var prevStoreRows = 0L
    val log = Seq.newBuilder[(Int, Long, Long, Long)]
    for (v <- 0 until versions) {
      val b = slice(v).cache()
      val clusters = inc.ingest(b, f"v$v%02d")
      val storeRows = inc.ingested
        .map(id => inc.io.batchRowCount(IncrementalDedup.SigStore, id)).sum
      val nClusters = clusters.select("cluster_id").distinct().count()
      log += ((v, b.count(), storeRows, nClusters))
      assert(storeRows > prevStoreRows, s"v$v: store must grow monotonically")
      prevStoreRows = storeRows

      if (v == 7) {
        // checkpoint 1: eight versions in, before retention
        val expect = oneShot(corpus.filter(idNum % versions < 8))
        assert(chainClusters(inc) == expect,
          "chain after v7 must equal one-shot over versions 0-7")
      }
      if (v == 11) {
        // retention fires mid-chain: expire the three oldest versions
        // (cma.c's rolling window), then the chain keeps ingesting
        new Retention(spark, dir, cfg).expire(Seq("v00", "v01", "v02"), "gc-mid")
        prevStoreRows = inc.ingested
          .map(id => inc.io.batchRowCount(IncrementalDedup.SigStore, id)).sum
        val expect = oneShot(corpus.filter(idNum % versions >= 3 && idNum % versions < 12))
        assert(chainClusters(inc) == expect,
          "chain after mid-chain retention must equal one-shot over the survivors")
      }
      b.unpersist()
      ()
    }

    // final checkpoint: 17 surviving versions (3 expired mid-chain)
    assert(inc.ingested.length == versions - 3)
    val expect = oneShot(corpus.filter(idNum % versions >= 3))
    assert(chainClusters(inc) == expect,
      "chain after 20 versions + retention must equal one-shot over the survivors")

    // the accumulated per-version log is backup.log-shaped: images per
    // job, cumulative store rows, current cluster count — all monotone
    // where they must be
    val rows = log.result()
    assert(rows.length == versions)
    assert(rows.map(_._2).sum == corpus.count())
    info("ver images cum_store_rows n_clusters")
    rows.foreach { case (v, n, s, c) => info(f"v$v%02d $n%6d $s%13d $c%10d") }
  }
}
