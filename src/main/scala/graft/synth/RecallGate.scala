package graft.synth

import graft.core.DedupConfig
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver-visible form of the BASELINE.json headline metric (dup-pair
  * recall >= 0.99 at the reference shingle/signature config): runs the
  * full image near-dup pipeline on the deterministic planted corpus,
  * compares its cluster-implied pairs against the brute-force oracle's
  * union-find closure IN-QUERY, and emits one constant-shaped verdict
  * row — the q_roundtrip_verify pattern, so the DuckDB oracle is a
  * literal and any recall/precision regression hash-mismatches the
  * CORRECTNESS run instead of hiding inside ScalaTest.
  *
  * The corpus size is FIXED (not sf-scaled): the oracle is O(n²) by
  * definition and the invariant is size-independent — 60 groups plant
  * every dup class (exact, re-encode, pixel-jitter, caption-edit,
  * substring, chain, hot-bucket skew, near-miss negative) 12 times
  * each. Both collects are bounded by construction (480 rows).
  *
  * destor analog: restore-and-compare validation as a per-job printed
  * verdict (reference: src/do_restore.c:253-256 speed/ratio lines —
  * the job itself emits its acceptance metrics).
  */
object RecallGate {

  def report(spark: SparkSession, cfg: DedupConfig = DedupConfig.default,
      nGroups: Long = 60L): DataFrame = {
    import spark.implicits._
    val corpus = CorpusGen.generate(spark, nGroups)
    val assign = graft.pipeline.DedupPipeline.run(corpus, cfg)
      .collect().map(c => c.image_id -> c.cluster_id).toMap
    val local = corpus.collect().toSeq
    val want = Oracle.clusterPairs(
      Oracle.clusters(local.map(_.image_id), Oracle.truePairs(local, cfg)))
    val got = Oracle.clusterPairs(assign)
    val missed = want -- got
    val extra = got -- want
    val recall =
      if (want.isEmpty) 1.0 else (want.size - missed.size).toDouble / want.size
    Seq((local.size.toLong,
      if (want.nonEmpty) 1 else 0,
      if (recall >= 0.99) 1 else 0,
      if (extra.isEmpty) 1 else 0))
      .toDF("n_images", "pairs_found", "recall_ok", "precision_ok")
  }
}
