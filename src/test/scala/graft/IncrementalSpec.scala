package graft

import graft.core.DedupConfig
import graft.pipeline.{DedupPipeline, IncrementalDedup}
import graft.synth.CorpusGen
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Incremental ingest: batch B dedups against batch A through the
  * persistent signature/posting index — no recompute of A — and the
  * merged clusters equal a one-shot run over A ∪ B. */
class IncrementalSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.core.Sessions.local(4, 8, "incr-spec")
  val cfg = DedupConfig.default

  import spark.implicits._

  test("two-batch ingest == one-shot over the union; A's batch files untouched by B's ingest") {
    val dir = Files.createTempDirectory("graft-incr").toString
    val corpus = CorpusGen.generate(spark, 16).cache()
    corpus.count()

    // split WITHIN dup groups (odd/even row ids) so every dup class has
    // cross-batch pairs: exact copies, re-encodes, jitters, substr
    // chains and the boilerplate hot bucket all straddle A/B
    val idNum = substring(col("image_id"), 4, 10).cast("long")
    val batchA = corpus.filter(idNum % 2 === 0).cache()
    val batchB = corpus.filter(idNum % 2 === 1).cache()
    assert(batchA.count() + batchB.count() == corpus.count())

    val oneShot = DedupPipeline.run(corpus, cfg)
      .collect().map(r => (r.image_id, r.cluster_id)).sorted.toSeq

    val inc = new IncrementalDedup(spark, dir, cfg)
    inc.ingest(batchA, "r1")
    assert(inc.ingested == Seq("r1"))

    // fingerprint A's committed store files before B's ingest
    def storeFiles(store: String): Seq[(String, Long, Long)] = {
      val p = java.nio.file.Paths.get(dir, store, "batch-r1")
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(p).iterator().asScala
        .filter(java.nio.file.Files.isRegularFile(_))
        .map(f => (f.toString, java.nio.file.Files.size(f),
          java.nio.file.Files.getLastModifiedTime(f).toMillis)).toSeq.sorted
    }
    val before = Seq(IncrementalDedup.SigStore, IncrementalDedup.PostStore,
      IncrementalDedup.ImagesStore).map(s => s -> storeFiles(s)).toMap

    val merged = inc.ingest(batchB, "r2")
    assert(inc.ingested == Seq("r1", "r2"))

    // batch A's signature/posting/image files are byte-stable: nothing
    // about A was recomputed or rewritten
    for ((s, b) <- before) assert(storeFiles(s) == b, s"store $s changed")

    val got = merged.select("image_id", "cluster_id")
      .collect().map(r => (r.getString(0), r.getString(1))).sorted.toSeq
    assert(got == oneShot)

    // index stores carry exactly one signature/image per ingested row
    assert(inc.io.readBatches(IncrementalDedup.SigStore).count() == corpus.count())
    assert(inc.io.readBatches(IncrementalDedup.ImagesStore).count() == corpus.count())
    // HAR state was handed off (boilerplate caption bucket is hot at 16 groups? —
    // list may be empty at this size; the table itself must exist)
    assert(inc.io.exists(IncrementalDedup.HarTable))

    corpus.unpersist(); batchA.unpersist(); batchB.unpersist()
  }

  test("three-batch ingest stays equal to one-shot (assignments replay as star edges)") {
    val dir = Files.createTempDirectory("graft-incr3").toString
    val corpus = CorpusGen.generate(spark, 9).cache()
    corpus.count()
    val idNum = substring(col("image_id"), 4, 10).cast("long")
    val parts = (0 until 3).map(m => corpus.filter(idNum % 3 === m).cache())

    val oneShot = DedupPipeline.run(corpus, cfg)
      .collect().map(r => (r.image_id, r.cluster_id)).sorted.toSeq

    val inc = new IncrementalDedup(spark, dir, cfg)
    parts.zipWithIndex.foreach { case (p, i) => inc.ingest(p, s"r$i") }
    val got = inc.clusters.select("image_id", "cluster_id")
      .collect().map(r => (r.getString(0), r.getString(1))).sorted.toSeq
    assert(got == oneShot)

    corpus.unpersist(); parts.foreach(_.unpersist())
  }

  test("crash debris under a DIFFERENT runId is dropped at the next ingest (SigStore commit set is authoritative)") {
    val dir = Files.createTempDirectory("graft-incr-heal").toString
    val corpus = CorpusGen.generate(spark, 8).cache()
    corpus.count()
    val idNum = substring(col("image_id"), 4, 10).cast("long")
    val batchA = corpus.filter(idNum % 2 === 0).cache()
    val batchB = corpus.filter(idNum % 2 === 1).cache()

    val inc = new IncrementalDedup(spark, dir, cfg)
    inc.ingest(batchA, "r1")

    // simulate a crashed ingest of B that died AFTER the images/postings
    // appends but BEFORE the SigStore commit marker — and is then
    // retried under a DIFFERENT runId (the ADVICE round-2 hole: debris
    // keyed by the crashed id was previously only healed when the retry
    // reused the same id)
    val crashedSigs = DedupPipeline.signatures(batchB, cfg)
    val crashedPost = DedupPipeline.buckets(crashedSigs, cfg)
      .toDF().withColumn("ingest_seq", lit(1))
    inc.io.appendBatch(batchB.toDF(), IncrementalDedup.ImagesStore, "crashX")
    inc.io.appendBatch(crashedPost, IncrementalDedup.PostStore, "crashX")
    assert(inc.io.batches(IncrementalDedup.PostStore).contains("crashX"))

    val merged = inc.ingest(batchB, "r2")
    // the orphan batch is gone from every store
    for (s <- Seq(IncrementalDedup.ImagesStore, IncrementalDedup.PostStore,
        IncrementalDedup.EdgeStore))
      assert(!inc.io.batches(s).contains("crashX"), s"store $s kept debris")
    // and the result equals the clean one-shot (no phantom postings
    // doubled pairs, no images from an uncommitted batch)
    val oneShot = DedupPipeline.run(corpus, cfg)
      .collect().map(r => (r.image_id, r.cluster_id)).sorted.toSeq
    val got = merged.select("image_id", "cluster_id")
      .collect().map(r => (r.getString(0), r.getString(1))).sorted.toSeq
    assert(got == oneShot)
    assert(inc.io.readBatches(IncrementalDedup.ImagesStore).count() == corpus.count())

    corpus.unpersist(); batchA.unpersist(); batchB.unpersist()
  }

  test("verify-side store inputs are bounded by the candidate ids (broadcast prune, O(cand) not O(store))") {
    val corpus = CorpusGen.generate(spark, 6).cache()
    val sigs = DedupPipeline.signatures(corpus, cfg).cache()
    val nStore = sigs.count()
    val ids = sigs.collect().map(_.nid).distinct.sorted.take(4)
    val cand = Seq((ids(0), ids(1), 3, "exact"), (ids(2), ids(3), 2, "minhash"))
      .toDF("id1", "id2", "srcmask", "src")
    val (vs, vi, cleanup) = IncrementalDedup.pruneToCandidates(cand, 2L, sigs, corpus.toDF())
    // the signature side verify sees is exactly the candidate-touched
    // rows — a 6-group store contributes 4 rows, not nStore
    assert(nStore > 4)
    assert(vs.count() == 4)
    assert(vs.collect().map(_.nid).toSet == ids.toSet)
    // the image side likewise, and its physical plan joins a BROADCAST
    // of the touched ids — the image store is never hash-exchanged
    assert(vi.count() == 4)
    val plan = vi.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast prune, got:\n$plan")
    cleanup()
    corpus.unpersist(); sigs.unpersist()
  }

  test("re-ingesting a committed batch id is rejected") {
    val dir = Files.createTempDirectory("graft-incr-dup").toString
    val inc = new IncrementalDedup(spark, dir, cfg)
    val c = CorpusGen.generate(spark, 2).cache()
    inc.ingest(c, "r1")
    assertThrows[IllegalArgumentException](inc.ingest(c, "r1"))
    c.unpersist()
  }
}
