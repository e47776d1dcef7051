package graft.pipeline

import graft.core._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Incremental / cross-run ingest: dedup each NEW batch against the
  * persistent signature + posting index WITHOUT recomputing anything
  * for previously ingested batches — destor's entire point (dedup new
  * backup streams against the on-disk fingerprint index; reference:
  * index probe src/index/index.c:140-217, publish `index_update`
  * :266-275, kv store append/caps src/index/kvstore_htable.c:158-207).
  *
  * Persistent stores under `workDir` (TableIO batch stores — every
  * append is an atomic batch-dir commit, so a crashed ingest is simply
  * retried and half-written batches are invisible):
  *
  *   images_store    one batch-dir per ingest — the raw rows (container
  *                   store analog; `bytes` is only ever read back for
  *                   pixel-verify side-joins, column-pruned otherwise)
  *   sig_store       per-image signature bundles (recipe/feature analog)
  *   postings_store  (band, bucket, image_id, payload, ingest_seq) —
  *                   THE probe index (kv store analog)
  *   edges_store     verified dup pairs per batch (provenance for
  *                   retention-time cluster recompute)
  *   clusters_current  latest full cluster assignment (overwritten per
  *                   ingest)
  *   har_hot_buckets  the previous ingest's hot-bucket list (HAR)
  *
  * Probe shape (scale analysis at 10^12 stored rows): the store side is
  * pruned FIRST by an equi-join on the new batch's distinct (band,
  * bucket) keys — a fraction proportional to |batch|, not |store| —
  * then fan-in per bucket is FIFO-capped at cfg.indexValueLength
  * newest entries (destor's index_value_length), so one boilerplate
  * bucket accumulated over months cannot explode a single probe.
  * Old-vs-old pairs are never re-generated: within-batch pairs come
  * from the skew-aware expander over NEW postings only, cross pairs
  * from the new→store join. Cluster maintenance replays previous
  * ASSIGNMENTS (star edges to the component representative), not the
  * full historical edge set, so the CC input stays O(|corpus| + |new
  * edges|) with iteration count driven by the new merges only.
  */
final class IncrementalDedup(
    spark: SparkSession,
    workDir: String,
    cfg: DedupConfig = DedupConfig.default) {

  import IncrementalDedup._

  val io: TableBackend = new TableIO(spark, workDir)

  private val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER

  /** Batches ingested so far (ids in ingest order). */
  def ingested: Seq[String] = io.batches(SigStore)

  /** Current full cluster assignment (image_id, cluster_id,
    * representative) across every ingested batch. */
  def clusters: DataFrame = io.read(ClustersTable)

  /** Ingest one batch: probe it against the persistent index, verify,
    * merge clusters, append the batch to every store. Returns the new
    * `clusters_current` (read from its published table). Batch image
    * ids must be disjoint from previously ingested ids. */
  def ingest(batch: Dataset[ImageRow], runId: String): DataFrame = {
    import spark.implicits._
    require(!ingested.contains(runId), s"batch $runId already ingested")
    // crash-retry self-heal: SigStore is the COMMIT MARKER (appended
    // last, and `ingested` is keyed on it), so ANY runId present in
    // another store without a SigStore entry is debris from a crashed
    // attempt — not just the runId being retried: a crashed ingest
    // retried under a DIFFERENT runId would otherwise leave orphan
    // postings/images/edges that every later probe joins against
    // (clusters could then include images from a batch that was never
    // committed). Drop the full uncommitted set so the stores are
    // exactly the SigStore commit set before this ingest begins
    // (destor equally replays an uncommitted jcr from scratch).
    locally {
      val committed = ingested.toSet
      for (store <- Seq(EdgeStore, ImagesStore, PostStore);
           r <- io.batches(store) if !committed.contains(r))
        io.dropBatch(store, r)
    }
    val seq = ingested.length

    // 1. signatures + postings for the NEW batch only (narrow stages)
    val newSigs = DedupPipeline.signatures(batch, cfg).persist(lvl)
    val newPost = DedupPipeline.buckets(newSigs, cfg).persist(lvl)

    // 2. within-batch candidates — skew-aware, inheriting the previous
    //    ingest's hot-bucket list (HAR); materialized copy so the
    //    publish at step 8 can't invalidate the plan
    val inheritedHot =
      if (io.exists(HarTable)) {
        val hot = io.readMaterialized(HarTable)
        if (hot.isEmpty) None else Some(hot)
      } else None
    val sk = DedupPipeline.candidatesSkewAware(newPost, cfg, inheritedHot)

    // 3. cross-batch probe: new postings vs the stored index
    val probeCleanup = scala.collection.mutable.ArrayBuffer.empty[() => Unit]
    val crossRaw: DataFrame =
      if (io.hasBatches(PostStore)) {
        val old = io.readBatches(PostStore)
        val newKeys = newPost.select("band", "bucket").distinct()
          .persist(lvl)
        probeCleanup += (() => { newKeys.unpersist(blocking = false); () })
        // F7 Bloom front-end (DDFS's in-memory filter that prunes index
        // probes, reference src/utils/bloom_filter.c:98-127): a
        // driver-built Bloom over the new batch's bucket keys drops
        // ~all store rows whose bucket the batch never touches BEFORE
        // the shuffle join. The store side is |store| rows, the batch
        // side |batch| — without the bloom every stored posting pays
        // the exchange; with it only (touched + fpp * rest) do. False
        // positives are removed by the equi-join; no false negatives.
        val nKeys = newKeys.count()
        val bloom = newKeys.stat.bloomFilter(
          xxhash64(col("band"), col("bucket")), math.max(nKeys, 1L), cfg.bloomFpp)
        val bloomBc = spark.sparkContext.broadcast(bloom)
        val mightContain = udf((k: Long) => bloomBc.value.mightContainLong(k))
        // store-side prune: bloom first (narrow, pre-shuffle), then the
        // exact equi-join on the batch's keys
        val touched = old
          .filter(mightContain(xxhash64(col("band"), col("bucket"))))
          .join(newKeys, Seq("band", "bucket"))
        val w = Window.partitionBy("band", "bucket")
          .orderBy(col("ingest_seq").desc, col("nid").desc)
        val capped = touched
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") <= cfg.indexValueLength)
          .select(col("band"), col("bucket"),
            col("nid").as("old_id"), col("payload").as("old_payload"))
        val srcbitCol =
          when(col("band") < DedupPipeline.BandPhash, DedupPipeline.SrcMinhash)
            .when(col("band") < DedupPipeline.BandSubstr, DedupPipeline.SrcPhash)
            .when(col("band") < DedupPipeline.BandExactSha, DedupPipeline.SrcSubstr)
            .otherwise(DedupPipeline.SrcExact)
        val hamOk = when(
          col("band") >= DedupPipeline.BandPhash && col("band") < DedupPipeline.BandSubstr,
          expr(s"bit_count(payload ^ old_payload) <= ${cfg.hammingMax}")).otherwise(lit(true))
        newPost.toDF().join(capped, Seq("band", "bucket"))
          .filter(col("nid") =!= col("old_id"))
          .filter(hamOk)
          .select(
            least(col("nid"), col("old_id")).as("id1"),
            greatest(col("nid"), col("old_id")).as("id2"),
            srcbitCol.as("srcbit"))
      } else spark.emptyDataset[(Long, Long, Int)].toDF("id1", "id2", "srcbit")

    // one cross-source pair dedup: srcmask = bit_or over within + cross
    val cand = DedupPipeline.finishCandidates(
      sk.pairs.select(col("id1"), col("id2"), col("srcmask").as("srcbit"))
        .unionByName(crossRaw))

    // 4. verify — old sides resolved from the STORES (no recompute),
    //    PRUNED to the candidate ids FIRST: verify's shuffle_hash joins
    //    exchange their full inputs, so feeding them the whole store
    //    would cost O(|store|) per ingest even though the probe side is
    //    beautifully bounded (destor's probe equally touches only hit
    //    keys, src/index/index.c:181-204). A broadcast semi-join (the
    //    same needIds pattern as verify's internal pixel prune) bounds
    //    both verify sides by O(|cand|); above the broadcast threshold
    //    (pathological candidate sets ~ corpus-sized) the shuffled
    //    semi-join is the correct plan and AQE handles it.
    val allSigs =
      if (io.hasBatches(SigStore))
        newSigs.toDF().unionByName(io.readBatches(SigStore)).as[SignatureRow]
      else newSigs
    // signature-only simulation (destor src/destor.h:55-59): only the
    // metadata columns ever flow — the images side feeds verify's pixel
    // join (skipped under the flag) and the CC vertex list (image_id
    // only), so the narrow projection is complete. A simulation workDir
    // and a full workDir must not mix (destor's simulated stores carry
    // the same constraint): the ImagesStore batch schema differs.
    val metaCols = Seq("image_id", "caption", "phash").map(col)
    val allImages: DataFrame =
      if (cfg.signatureOnly) {
        val nb = batch.toDF().select(metaCols: _*)
        if (io.hasBatches(ImagesStore))
          nb.unionByName(io.readBatches(ImagesStore).select(metaCols: _*))
        else nb
      } else {
        if (io.hasBatches(ImagesStore))
          batch.toDF().unionByName(io.readBatches(ImagesStore))
        else batch.toDF()
      }
    val candM = cand.persist(lvl)
    val candPairs = candM.count()
    probeCleanup += (() => { candM.unpersist(blocking = false); () })
    val (verSigs, verImages, cleanupPrune) =
      IncrementalDedup.pruneToCandidates(candM, candPairs, allSigs, allImages)
    probeCleanup += cleanupPrune
    val (ver, cleanupMid, _) = DedupPipeline.verifyWithCleanup(candM, verSigs, verImages, cfg)

    // 5. commit this batch's verified edges, then read them BACK from
    //    the store (single materialization; CC consumes the checkpoint)
    io.appendBatch(ver.toDF(), EdgeStore, runId)
    cleanupMid()
    probeCleanup.foreach(_.apply())
    val newEdges = io.readBatch(EdgeStore, runId)

    // 6. cluster maintenance: previous assignments as star edges +
    //    this batch's verified pairs
    val prevEdges =
      if (io.exists(ClustersTable))
        io.read(ClustersTable)
          .filter(col("image_id") =!= col("cluster_id"))
          .select(col("image_id").as("src"), col("cluster_id").as("dst"))
      else spark.emptyDataset[(String, String)].toDF("src", "dst")
    val vertices = allImages.select(col("image_id").as("id"))
    val assign = graft.cluster.ConnectedComponents.run(spark, vertices,
        newEdges.select(col("id1").as("src"), col("id2").as("dst")).unionByName(prevEdges))
      .select(col("id").as("image_id"), col("component").as("cluster_id"),
        (col("id") === col("component")).as("representative"))

    // 7. publish clusters + append batch to the index stores. The
    //    SigStore append is LAST — it is the ingest's commit marker
    //    (`ingested` reads SigStore), so a crash anywhere earlier
    //    leaves the batch un-ingested and the entry self-heal above
    //    clears the partial appends on retry; table publishes
    //    (clusters, HAR) are replace-style and idempotent.
    io.publish(assign, ClustersTable, cfg.configHash, runId)
    io.appendBatch(
      if (cfg.signatureOnly) batch.toDF().select(metaCols: _*) else batch.toDF(),
      ImagesStore, runId)
    io.appendBatch(newPost.toDF().withColumn("ingest_seq", lit(seq)), PostStore, runId)
    io.appendBatch(newSigs.toDF(), SigStore, runId)

    // 8. HAR handoff: this ingest's hot buckets for the next one (a
    //    crash between 7 and here leaves the previous run's hot list
    //    in place — HAR is an advisory routing hint, not correctness)
    io.publish(sk.hotBuckets, HarTable, cfg.configHash, runId)
    sk.cleanup()
    newSigs.unpersist(blocking = false)
    newPost.unpersist(blocking = false)
    io.read(ClustersTable)
  }
}

object IncrementalDedup {
  val ImagesStore = "images_store"
  val SigStore = "sig_store"
  val PostStore = "postings_store"
  val EdgeStore = "edges_store"
  val ClustersTable = "clusters_current"
  val HarTable = "har_hot_buckets"

  /** Ids (pairs * 2, or touched rows) at or below which the candidate
    * id list broadcasts — the same order as verify's pixel needIds
    * threshold; a long id is 8 bytes, so 4M ids is a ~32 MB build side. */
  private[pipeline] val BroadcastIdLimit = 4000000L

  /** Prune the verify-stage signature and image sides to the ids that
    * appear in the candidate pairs: verify cost is then O(batch +
    * touched), never O(store). Returns (prunedSigs, prunedImages,
    * cleanup) — the pruned signature set is persisted (it feeds both
    * verify caption joins AND the image-id derivation); call cleanup
    * after the verified pairs are materialized. */
  private[graft] def pruneToCandidates(
      cand: DataFrame,
      candPairs: Long,
      allSigs: Dataset[SignatureRow],
      allImages: DataFrame): (Dataset[SignatureRow], DataFrame, () => Unit) = {
    val spark = cand.sparkSession
    import spark.implicits._
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER
    val candIdsRaw = cand.select(col("id1").as("nid"))
      .union(cand.select(col("id2").as("nid"))).distinct()
    val candIds =
      if (candPairs * 2 <= BroadcastIdLimit) broadcast(candIdsRaw) else candIdsRaw
    val verSigs = allSigs.toDF().join(candIds, "nid").as[SignatureRow].persist(lvl)
    // touched image ids come from the (already pruned, persisted)
    // signature rows — O(|cand|), and counting it materializes the
    // cache before verify's joins consume it twice
    val nTouched = verSigs.count()
    val touchedIds = verSigs.toDF().select("image_id")
    val verImages = allImages.join(
      if (nTouched <= BroadcastIdLimit) broadcast(touchedIds) else touchedIds,
      "image_id")
    (verSigs, verImages, () => { verSigs.unpersist(blocking = false); () })
  }
}
