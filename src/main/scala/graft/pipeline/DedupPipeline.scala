package graft.pipeline

import graft.core._
import graft.signatures.{Codec, Sig}
import graft.cluster.ConnectedComponents
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** The near-duplicate detection + clustering pipeline — destor's backup
  * pipeline (reference: src/do_backup.c:31-210, six pthread stages over
  * bounded SyncQueues) recast as a DAG of Dataset stages:
  *
  *   images → signatures → lsh_buckets → candidate_pairs →
  *   verified_pairs → clusters
  *
  * Thread boundaries become stage/shuffle boundaries; SyncQueue
  * backpressure becomes Spark scheduling; the index_lock serialization
  * (src/dedup_phase.c:87-91) disappears because within-batch
  * canonicalization is a min-aggregate, not a mutable buffer.
  *
  * Scale design (100 TB / 10^12 rows):
  *  - signatures is a NARROW stage (mapPartitions; no shuffle); `bytes`
  *    is read once here and never again except for the small pixel-
  *    verify side-join (column pruning keeps it out of all other scans).
  *  - candidate generation shuffles on (band,bucket) — the only O(data)
  *    shuffle; bucket sizes are bounded by the CAP-analog skew stage
  *    (star pairing for buckets > bucketCap) so no O(n^2) explosion.
  *  - all joins are equi-joins; AQE splits residual skew.
  */
/** Intermediate verify-stage row (pre pixel check). Top-level so the
  * Catalyst product encoder resolves (local case classes have no
  * TypeTag). */
private[pipeline] final case class Mid(id1: String, id2: String, src: String,
    jaccard: Double, hamming: Int, verdict: String, needPixel: Boolean)

object DedupPipeline {

  private def hex(b: Array[Byte]): String = {
    val sb = new StringBuilder(b.length * 2)
    var i = 0
    while (i < b.length) { sb.append(f"${b(i) & 0xff}%02x"); i += 1 }
    sb.toString
  }

  // --- band-id namespaces: one flat (band,bucket) key space for every
  //     candidate source (minhash LSH, phash hamming-LSH, winnowing
  //     substring postings, exact sha) — a single shuffle serves all.
  val BandPhash = 1000
  val BandSubstr = 2000
  val BandExactSha = 3000
  val BandExactPix = 3001

  /** Stage 1 — per-image signature bundle (narrow, no shuffle).
    * Analog of destor's chunk+hash phases (src/chunk_phase.c,
    * src/hash_phase.c:8-38). */
  def signatures(images: Dataset[ImageRow], cfg: DedupConfig): Dataset[SignatureRow] = {
    val spark = images.sparkSession
    import spark.implicits._
    images.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("SHA-1")
      it.map { r =>
        md.reset()
        md.update(r.bytes)
        md.update(r.caption.getBytes("UTF-8"))
        val sha = hex(md.digest())
        val pix = Codec.decode(r.bytes, r.fmt)
        md.reset()
        md.update(pix)
        val pixsha = hex(md.digest())
        val shingles = Sig.shingleHashes(r.caption, cfg.shingleSize)
        SignatureRow(
          image_id = r.image_id,
          sha = sha,
          pixsha = pixsha,
          minhash = Sig.minhash(shingles, cfg),
          simhash = Sig.simhash64(shingles, null),
          phash = r.phash,
          shingle_count = shingles.length,
          caption = r.caption)
      }
    }
  }

  /** Stage 2 — LSH bucket postings (narrow flatMap). Analog of the
    * feature→segment kv postings (src/index/kvstore_htable.c:11-53).
    * Emits, per image: b minhash band keys, phashBands hamming band
    * keys (pigeonhole guarantee for hamming<=hammingMax since
    * hammingMax < phashBands), winnowed caption fingerprints
    * (guaranteed substring recall), and the two exact keys. */
  def buckets(sigs: Dataset[SignatureRow], cfg: DedupConfig): Dataset[BucketRow] = {
    val spark = sigs.sparkSession
    import spark.implicits._
    sigs.flatMap { s =>
      val out = scala.collection.mutable.ArrayBuffer.empty[BucketRow]
      val bk = Sig.bandKeys(s.minhash, cfg)
      var b = 0
      while (b < bk.length) { out += BucketRow(b, bk(b), s.image_id); b += 1 }
      val pk = Sig.hammingBandKeys(s.phash, cfg.phashBands)
      b = 0
      while (b < pk.length) { out += BucketRow(BandPhash + b, pk(b), s.image_id); b += 1 }
      val cap = s.caption.toLowerCase
      if (cap.length >= cfg.substrMinChars) {
        val fps = Sig.captionFingerprints(s.caption, cfg.substrGram, cfg.substrWindow)
        var i = 0
        while (i < fps.length) { out += BucketRow(BandSubstr, fps(i), s.image_id); i += 1 }
      }
      out += BucketRow(BandExactSha, Sig.hash64(s.sha), s.image_id)
      out += BucketRow(BandExactPix, Sig.hash64(s.pixsha), s.image_id)
      out
    }
  }

  /** Stage 3 — candidate pair generation with explicit skew handling.
    * Small buckets (size <= bucketCap): all-pairs self-join. Hot buckets
    * (size > cap): star pairing to the bucket's min image_id — destor's
    * CAP capping (src/cap_rewrite.c:44-107) transposed: bounded fan-in
    * per bucket, connectivity preserved for the clustering stage.
    * One shuffle on (band,bucket); pair dedup across bands is a second
    * shuffle on (id1,id2). */
  def candidates(bk: Dataset[BucketRow], cfg: DedupConfig): DataFrame = {
    val spark = bk.sparkSession
    import spark.implicits._
    val src = when(col("band") < BandPhash, "minhash")
      .when(col("band") < BandSubstr, "phash")
      .when(col("band") < BandExactSha, "substr")
      .otherwise("exact")
    val sizes = bk.groupBy("band", "bucket")
      .agg(count(lit(1)).as("sz"), min("image_id").as("rep"))
      .filter(col("sz") >= 2)
    val withSz = bk.join(sizes, Seq("band", "bucket"))
    val small = withSz.filter(col("sz") <= cfg.bucketCap)
      .select(col("band"), col("bucket"), col("image_id"))
    val smallPairs = small.as("a")
      .join(small.withColumnRenamed("image_id", "id2").as("b"), Seq("band", "bucket"))
      .filter(col("image_id") < col("id2"))
      .select(col("image_id").as("id1"), col("id2"), col("band"))
    val hotPairs = withSz.filter(col("sz") > cfg.bucketCap && col("image_id") =!= col("rep"))
      .select(col("rep").as("id1"), col("image_id").as("id2"), col("band"))
    smallPairs.union(hotPairs)
      .withColumn("src", src)
      .groupBy("id1", "id2")
      .agg(min("src").as("src"))
  }

  /** Stage 4 — verification with the EXACT oracle predicates (same
    * DedupConfig): sha equality, exact shingle Jaccard, normalized
    * substring containment, phash hamming + decoded-pixel PSNR. Only
    * pairs that need the pixel check touch `bytes` (small side-join —
    * column pruning keeps the scan narrow). Analog of destor's
    * per-chunk dedup decision (src/index/index.c:140-217). */
  def verify(
      cand: DataFrame,
      sigs: Dataset[SignatureRow],
      images: Dataset[ImageRow],
      cfg: DedupConfig): Dataset[VerifiedPair] = {
    val spark = cand.sparkSession
    import spark.implicits._

    val s1 = sigs.select(
      col("image_id").as("id1"), col("sha").as("sha_1"), col("pixsha").as("pixsha_1"),
      col("phash").as("phash_1"), col("caption").as("cap_1"))
    val s2 = sigs.select(
      col("image_id").as("id2"), col("sha").as("sha_2"), col("pixsha").as("pixsha_2"),
      col("phash").as("phash_2"), col("caption").as("cap_2"))
    val joined = cand.join(s1, "id1").join(s2, "id2")

    val mid = joined
      .select("id1", "id2", "src", "sha_1", "sha_2", "pixsha_1", "pixsha_2",
        "phash_1", "phash_2", "cap_1", "cap_2")
      .as[(String, String, String, String, String, String, String, Long, Long, String, String)]
      .map { case (id1, id2, src, shaA, shaB, pixA, pixB, phA, phB, capA, capB) =>
        val ham = Sig.hamming(phA, phB)
        val ja = Sig.jaccard(
          Sig.shingleHashes(capA, cfg.shingleSize),
          Sig.shingleHashes(capB, cfg.shingleSize))
        val la = capA.toLowerCase
        val lb = capB.toLowerCase
        val substr =
          (la.length >= cfg.substrMinChars && lb.contains(la) && la != lb) ||
          (lb.length >= cfg.substrMinChars && la.contains(lb) && la != lb)
        val verdict =
          if (shaA == shaB) "exact"
          else if (ja >= cfg.jaccardMin) "caption"
          else if (substr) "substr"
          else if (pixA == pixB) "pixel" // identical decoded pixels: PSNR = inf
          else ""
        val needPixel = verdict.isEmpty && ham <= cfg.hammingMax
        Mid(id1, id2, src, ja, ham, verdict, needPixel)
      }

    val settled = mid.filter(_.verdict.nonEmpty).map(m =>
      VerifiedPair(m.id1, m.id2, m.src, m.jaccard, m.hamming,
        if (m.verdict == "exact" || m.verdict == "pixel") 1e9 else 0.0, m.verdict))

    // pixel-verify side-join: only hamming-close, otherwise-unverified pairs
    val pix = images.select(col("image_id"), col("bytes"), col("fmt"))
    val needPix = mid.filter(_.needPixel).toDF()
    val pixVerified = needPix
      .join(pix.select(col("image_id").as("id1"), col("bytes").as("bytes_1"), col("fmt").as("fmt_1")), "id1")
      .join(pix.select(col("image_id").as("id2"), col("bytes").as("bytes_2"), col("fmt").as("fmt_2")), "id2")
      .select("id1", "id2", "src", "jaccard", "hamming", "bytes_1", "fmt_1", "bytes_2", "fmt_2")
      .as[(String, String, String, Double, Int, Array[Byte], String, Array[Byte], String)]
      .map { case (id1, id2, src, ja, ham, b1, f1, b2, f2) =>
        val pa = Codec.decode(b1, f1)
        val pb = Codec.decode(b2, f2)
        val p = if (pa.length == pb.length) Codec.psnr(pa, pb) else 0.0
        VerifiedPair(id1, id2, src, ja, ham, p, if (p >= cfg.psnrMin) "pixel" else "")
      }
      .filter(_.verdict.nonEmpty)

    settled.union(pixVerified)
  }

  /** Stage 5 — connected components + deterministic representative. */
  def clusters(
      images: Dataset[ImageRow],
      verified: Dataset[VerifiedPair]): Dataset[ClusterRow] = {
    val spark = images.sparkSession
    import spark.implicits._
    val vertices = images.select(col("image_id").as("id"))
    val edges = verified.select(col("id1").as("src"), col("id2").as("dst"))
    ConnectedComponents.run(spark, vertices, edges)
      .select(col("id").as("image_id"), col("component").as("cluster_id"),
        (col("id") === col("component")).as("representative"))
      .as[ClusterRow]
  }

  /** Whole pipeline in one call (no checkpointing — see StageRunner for
    * the checkpointed/resumable form). */
  def run(images: Dataset[ImageRow], cfg: DedupConfig): Dataset[ClusterRow] = {
    val sigs = signatures(images, cfg)
    val bk = buckets(sigs, cfg)
    val cand = candidates(bk, cfg)
    val ver = verify(cand, sigs, images, cfg)
    clusters(images, ver)
  }
}
