package graft

import graft.core.{BucketRow, DedupConfig}
import graft.ops.SkewControl
import graft.pipeline.DedupPipeline
import graft.synth.CorpusGen
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** CBR adaptive cap (skewQuantile is LIVE) + HAR cross-run hot-bucket
  * feedback: the two data-driven skew controllers of SkewControl /
  * candidatesSkewAware. */
class SkewSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.core.Sessions.local(4, 8, "skew-spec")
  val cfg = DedupConfig.default

  import spark.implicits._

  // synthetic nid scheme: bucket b's members are [b*100000, b*100000+n)
  private def postings(sizes: Seq[Int]): Seq[BucketRow] =
    sizes.zipWithIndex.flatMap { case (n, b) =>
      (0 until n).map(i => BucketRow(0, b.toLong * 1000003L, b.toLong * 100000 + i))
    }

  test("CBR: shifted bucket-size distribution re-derives the cap (knob not dead)") {
    // a corpus whose TYPICAL bucket has 100 members — above the static
    // floor of 64 — plus one mega-bucket outlier
    val dist = Seq.fill(200)(100) :+ 5000
    val bk = spark.createDataset(postings(dist))
    val sizes = SkewControl.bucketSizes(bk.toDF())
    val cap = SkewControl.adaptiveCap(sizes, cfg.skewQuantile, cfg.bucketCap)
    // quantile of sizes at 0.99 over (200 x 100, 1 x 5000) is 100:
    // the effective cap follows the distribution up from the static 64
    assert(cap >= 100 && cap < 5000, s"cap=$cap")

    // with the adaptive cap, a 100-member bucket is all-pairs (C(100,2)
    // per bucket), NOT star-paired (99) — the static cap would have
    // star-paired the entire corpus
    val sk = DedupPipeline.candidatesSkewAware(bk, cfg, None)
    val one = sk.pairs.filter("id1 < 100000").count()
    assert(sk.capUsed == cap)
    assert(one == 100L * 99 / 2, s"bucket0 pairs=$one")
    // the mega-bucket is above the adaptive cap: star pairs only
    val mega = sk.pairs.filter("id1 >= 20000000 or id2 >= 20000000").count()
    assert(mega == 4999, s"mega pairs=$mega")
    // and it is reported as hot for the next run (HAR handoff)
    val hot = sk.hotBuckets.collect()
    assert(hot.length == 1 && hot.head.getAs[Long]("n") == 5000)
    sk.cleanup()
  }

  test("HAR: inherited hot buckets take the broadcast min-join path with an identical pair set") {
    val dist = Seq.fill(200)(8) :+ 500 // one planted hot bucket (q99 of sizes = 8 -> cap stays at the static 64)
    val bk = spark.createDataset(postings(dist))

    val base = DedupPipeline.candidatesSkewAware(bk, cfg, None)
    val basePairs = base.pairs.select("id1", "id2", "srcmask").as[(Long, Long, Int)]
      .collect().toSet
    val hot = base.hotBuckets
    assert(hot.count() == 1)

    // run 2 "inherits" run 1's hot list: identical candidates, but the
    // hot bucket's postings never enter the sort shuffle
    val har = DedupPipeline.candidatesSkewAware(bk, cfg, Some(hot))
    val harPairs = har.pairs.select("id1", "id2", "srcmask").as[(Long, Long, Int)]
      .collect().toSet
    assert(harPairs == basePairs)
    base.cleanup(); har.cleanup()
  }

  test("HAR: hamming-LSH hot bucket still rejects far members at emission") {
    // phash band id => hamming semantics; payloads: 3 near the min, 2 far.
    // 200 singleton buckets keep the adaptive cap at the static floor
    // (4 here) so the 5-member bucket counts as hot.
    val cfgSmall = cfg.copy(bucketCap = 4)
    val band = DedupPipeline.BandPhash
    val members = Seq(
      (1L, 0L), (2L, 1L), (3L, 3L), // hamming(0, x) <= 2 bits
      (4L, 0x00ffffffffL), (5L, 0xffff000000L)) // far
    val filler = (0 until 200).map(i => BucketRow(0, 500L + i, 900000L + i))
    val bk = spark.createDataset(
      members.map { case (id, p) => BucketRow(band, 7L, id, p) } ++ filler)
    val hot = Seq((band, 7L, 5L)).toDF("band", "bucket", "n")
    val har = DedupPipeline.candidatesSkewAware(bk, cfgSmall, Some(hot))
    assert(har.capUsed == 4)
    val pairs = har.pairs.select("id1", "id2").as[(Long, Long)].collect().toSet
    // star from min member nid 1 (payload 0): far members rejected by
    // the hamming gate exactly as the streamed expander would
    assert(pairs == Set((1L, 2L), (1L, 3L)))
    har.cleanup()
  }

  test("HAR: an inherited key that shrank below the cap is all-paired again") {
    // run-2 bucket has only 3 members though it was hot last run: the
    // star path must NOT fire (pair set == plain expander's all-pairs)
    val filler = (0 until 200).map(i => BucketRow(0, 500L + i, 900000L + i))
    val bk = spark.createDataset(
      Seq(1L, 2L, 3L).map(id => BucketRow(0, 7L, id)) ++ filler)
    val hot = Seq((0, 7L, 999L)).toDF("band", "bucket", "n")
    val har = DedupPipeline.candidatesSkewAware(bk, cfg, Some(hot))
    val pairs = har.pairs.select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L), (1L, 3L), (2L, 3L)))
    har.cleanup()
  }

  test("pipeline end-to-end result is invariant under HAR inheritance") {
    val corpus = CorpusGen.generate(spark, 8).cache()
    corpus.count()
    val direct = DedupPipeline.run(corpus, cfg)
      .collect().map(r => (r.image_id, r.cluster_id)).sorted.toSeq

    val sigs = DedupPipeline.signatures(corpus, cfg).cache()
    val bk = DedupPipeline.buckets(sigs, cfg)
    // inherit a FABRICATED hot list naming real buckets: result must
    // not change (only the physical path for those keys does)
    val someBuckets = bk.toDF().groupBy("band", "bucket")
      .count().withColumnRenamed("count", "n").limit(20)
    val sk = DedupPipeline.candidatesSkewAware(bk, cfg,
      Some(someBuckets.cache()))
    val (ver, cleanup, _) = DedupPipeline.verifyWithCleanup(sk.pairs, sigs, corpus.toDF(), cfg)
    val got = DedupPipeline.clusters(corpus.toDF(), ver)
      .collect().map(r => (r.image_id, r.cluster_id)).sorted.toSeq
    assert(got == direct)
    cleanup(); sk.cleanup()
    sigs.unpersist(); corpus.unpersist()
  }
}
