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

object DedupPipeline extends Serializable {

  private val HexDigits = "0123456789abcdef".toCharArray

  private def hex(b: Array[Byte]): String = {
    // char-table encode: a Formatter-based (f"%02x") loop allocated one
    // java.util.Formatter per BYTE and showed up in task stack samples
    // of the signatures stage (~16M instances at 400k images)
    val out = new Array[Char](b.length * 2)
    var i = 0
    while (i < b.length) {
      val v = b(i) & 0xff
      out(i * 2) = HexDigits(v >>> 4)
      out(i * 2 + 1) = HexDigits(v & 0xf)
      i += 1
    }
    new String(out)
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
        // length delimiter between the two fields: without it, distinct
        // rows whose bytes/caption boundary shifts ("ab"/"c" vs "a"/"bc")
        // would collide into the same exact-dup key
        val len = r.bytes.length
        md.update(Array[Byte]((len >>> 24).toByte, (len >>> 16).toByte, (len >>> 8).toByte, len.toByte))
        md.update(r.caption.getBytes("UTF-8"))
        val sha = hex(md.digest())
        val pix = Codec.decode(r.bytes, r.fmt)
        md.reset()
        md.update(pix)
        val pixsha = hex(md.digest())
        val shingles = Sig.shingleHashes(r.caption, cfg.shingleSize)
        // P9 degenerate guard: uniform decoded pixels (all-black etc.)
        var uniform = pix.length > 0
        var i = 1
        while (uniform && i < pix.length) { uniform = pix(i) == pix(0); i += 1 }
        SignatureRow(
          image_id = r.image_id,
          nid = Sig.hash64(r.image_id),
          sha = sha,
          pixsha = pixsha,
          bands = Sig.bandKeys(Sig.minhash(shingles, cfg), cfg),
          simhash = Sig.simhash64(shingles, null),
          phash = r.phash,
          shingle_count = shingles.length,
          caption = r.caption,
          degenerate = uniform)
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
      val bk = s.bands
      val pk = Sig.hammingComboKeys(s.phash, cfg.phashBlocks, cfg.phashCombo)
      val fps =
        if (s.caption.length >= cfg.substrMinChars)
          Sig.captionFingerprints(s.caption, cfg.substrGram, cfg.substrWindow)
        else Array.emptyLongArray
      // exact-size output (one growth-free array per image; the posting
      // stage runs at ~60 rows/image so buffer churn is measurable)
      val out = new Array[BucketRow](bk.length + pk.length + fps.length + 2)
      var o = 0
      var b = 0
      while (b < bk.length) { out(o) = BucketRow(b, bk(b), s.nid); o += 1; b += 1 }
      b = 0
      while (b < pk.length) { out(o) = BucketRow(BandPhash + b, pk(b), s.nid, s.phash); o += 1; b += 1 }
      var i = 0
      while (i < fps.length) { out(o) = BucketRow(BandSubstr, fps(i), s.nid); o += 1; i += 1 }
      out(o) = BucketRow(BandExactSha, Sig.hash64(s.sha), s.nid)
      out(o + 1) = BucketRow(BandExactPix, Sig.hash64(s.pixsha), s.nid)
      out
    }
  }

  /** Stage 3 — candidate pair generation with explicit skew handling.
    * ONE shuffle groups postings per (band,bucket); pairs are expanded
    * locally from the member list — all-pairs for buckets <= bucketCap,
    * star pairing to the min image_id above it (destor's CAP capping,
    * src/cap_rewrite.c:44-107: bounded fan-in per bucket, connectivity
    * preserved for clustering). Pair dedup across bands is the second
    * shuffle. (The earlier sizes-join + self-join formulation computed
    * the posting subtree twice and shuffled each pair row three times.)
    */
  // source bit flags — srcmask is a bit-OR across all bands a pair was
  // seen in (a pair can be a candidate from several signature families;
  // verify routes on the full set, not a single label)
  val SrcExact = 1
  val SrcMinhash = 2
  val SrcPhash = 4
  val SrcSubstr = 8

  def candidates(bk: Dataset[BucketRow], cfg: DedupConfig): DataFrame =
    finishCandidates(pairStream(bk, cfg, cfg.bucketCap))

  // --- packed posting shuffle key: xxhash64(band,bucket) with the
  //     2-bit signature-CLASS index in the low bits. The hot-path
  //     shuffle row is then exactly (key, nid, payload) — three longs,
  //     32 bytes in UnsafeRow — instead of carrying band+bucket
  //     alongside (48 bytes): postings are the pipeline's one O(data)
  //     shuffle, so every byte here is the binding resource at scale.
  //     Key collisions merge two same-class buckets: candidates only
  //     gain members and verify is exact, so recall/correctness are
  //     unaffected (cross-class merges are impossible — the class bits
  //     differ). The Tungsten sort on the single long key is a pure
  //     radix sort (zero comparator calls).
  private val ClassSrcbit = Array(SrcMinhash, SrcPhash, SrcSubstr, SrcExact)

  private def packedKeyCol: org.apache.spark.sql.Column = {
    val cls =
      when(col("band") < BandPhash, 0L)
        .when(col("band") < BandSubstr, 1L)
        .when(col("band") < BandExactSha, 2L)
        .otherwise(3L)
    xxhash64(col("band"), col("bucket")).bitwiseAND(lit(-4L)).bitwiseOR(cls)
  }

  /** Raw candidate pair stream (id1, id2, srcbit) from postings, with
    * all-pairs ≤ `cap` / star-pairing above it. */
  private[pipeline] def pairStream(bk: Dataset[BucketRow], cfg: DedupConfig, cap: Int): DataFrame = {
    // Pair expansion WITHOUT building per-bucket lists: repartition on
    // the packed key, sort within partitions, stream over runs of
    // equal keys emitting pairs directly. A collect_list-based
    // formulation spent ~170s at 100k rows just materializing 10M
    // grouped lists (object-aggregation fallback); this is one Tungsten
    // sort shuffle + a linear scan. Buffer is bounded by the largest
    // bucket (hot buckets emit only star pairs, so the buffer is
    // read-only after the cap).
    val spark = bk.sparkSession
    import spark.implicits._
    spark.createDataFrame(
      bk.select(packedKeyCol.as("key"), col("nid"), col("payload"))
        .repartition(col("key"))
        .sortWithinPartitions("key")
        .queryExecution.toRdd
        .mapPartitions(it => expandRows(it, cap, cfg.hammingMax)))
      .toDF("id1", "id2", "srcbit")
  }

  /** CAP-capped pair expansion over one partition of (key, nid,
    * payload) InternalRows sorted by key (class index in the key's low
    * bits): all-pairs ≤ cap, star above. Hamming-LSH buckets reject far
    * pairs AT EMISSION, before they hit the pair-dedup shuffle (bucket
    * key saturation makes random collisions ~n^2/keyspace at scale).
    *
    * Iterates raw InternalRows (queryExecution.toRdd) with primitive
    * long buffers: the previous `Dataset[(Long,Long,Long)]` form
    * allocated a Tuple3 + three boxed Longs PER POSTING — ~10^8
    * short-lived objects per scan at 400k images, and the resulting GC
    * pauses stall all workers at once (measured 105-156 GC-seconds per
    * scan stage at 32 threads). The only per-pair allocation left is
    * the bounded output tuple. Over-cap (star) buckets use a single
    * min scan instead of a full sort — a hot bucket's member order is
    * irrelevant when only (min → other) pairs are emitted. */
  private def expandRows(
      rows: Iterator[org.apache.spark.sql.catalyst.InternalRow],
      cap: Int, hamMax: Int): Iterator[(Long, Long, Int)] = {
    var idsA = new Array[Long](64)
    var plsA = new Array[Long](64)
    var n = 0
    var cur = 0L
    var open = false
    def grow(): Unit = {
      idsA = java.util.Arrays.copyOf(idsA, idsA.length * 2)
      plsA = java.util.Arrays.copyOf(plsA, plsA.length * 2)
    }
    def flush(): Iterator[(Long, Long, Int)] = {
      if (!open || n < 2) return Iterator.empty
      val cls = (cur & 3L).toInt
      val sb = ClassSrcbit(cls)
      val ham = cls == 1
      val len = n
      val m = java.util.Arrays.copyOf(idsA, len)
      val p = java.util.Arrays.copyOf(plsA, len)
      if (len <= cap) {
        // primitive dual-array insertion sort (len is cap-bounded);
        // canonical id1 < id2 within the bucket
        var i = 1
        while (i < len) {
          val k = m(i); val pl = p(i); var j = i - 1
          while (j >= 0 && m(j) > k) { m(j + 1) = m(j); p(j + 1) = p(j); j -= 1 }
          m(j + 1) = k; p(j + 1) = pl; i += 1
        }
        for (i <- (0 until len).iterator; j <- (i + 1) until len
             if !ham || Sig.hamming(p(i), p(j)) <= hamMax)
          yield (m(i), m(j), sb)
      } else {
        var minI = 0; var i = 1
        while (i < len) { if (m(i) < m(minI)) minI = i; i += 1 }
        val mi = minI
        (0 until len).iterator
          .filter(j => j != mi && (!ham || Sig.hamming(p(mi), p(j)) <= hamMax))
          .map(j => (m(mi), m(j), sb))
      }
    }
    val body = rows.flatMap { r =>
      val k = r.getLong(0)
      if (!open || k != cur) {
        val out = flush()
        open = true; cur = k; n = 0
        idsA(0) = r.getLong(1); plsA(0) = r.getLong(2); n = 1
        out
      } else {
        if (n == idsA.length) grow()
        idsA(n) = r.getLong(1); plsA(n) = r.getLong(2); n += 1
        Iterator.empty
      }
    }
    body ++ new Iterator[(Long, Long, Int)] {
      private var tail: Iterator[(Long, Long, Int)] = null
      private def t: Iterator[(Long, Long, Int)] = {
        if (tail == null) tail = flush()
        tail
      }
      def hasNext: Boolean = t.hasNext
      def next(): (Long, Long, Int) = t.next()
    }
  }

  /** Cross-band pair dedup + provenance: bit-OR the source bits of every
    * band a pair was seen in, label with the strongest evidence class. */
  private[pipeline] def finishCandidates(pairs: DataFrame): DataFrame =
    pairs
      // nid-collision guard: two distinct images hashing to the same nid
      // inside one bucket would emit a degenerate self-pair — drop it
      // (the real A-B pair still surfaces through verify's m:n sig join)
      .filter(col("id1") =!= col("id2"))
      .groupBy("id1", "id2")
      .agg(expr("cast(bit_or(srcbit) as int)").as("srcmask"))
      .withColumn("src",
        when(col("srcmask").bitwiseAND(SrcExact) =!= 0, "exact")
          .when(col("srcmask").bitwiseAND(SrcMinhash) =!= 0, "minhash")
          .when(col("srcmask").bitwiseAND(SrcSubstr) =!= 0, "substr")
          .otherwise("phash"))

  /** Skew-aware candidate generation result: the candidate pairs, this
    * run's hot-bucket list (HAR state for the NEXT run), the CBR-derived
    * effective cap, and a cleanup thunk that drops the internal
    * bucket-size cache — call AFTER pairs and hotBuckets have been
    * materialized. */
  final case class SkewAwareCandidates(
      pairs: DataFrame, hotBuckets: DataFrame, capUsed: Int, cleanup: () => Unit)

  /** Stage 3 with BOTH adaptive skew controllers live (see SkewControl):
    *  - CBR: effective cap = skewQuantile-quantile of this run's bucket
    *    sizes, floored at cfg.bucketCap — a shifted bucket-size
    *    distribution re-derives the cap instead of star-pairing the
    *    bulk of the corpus;
    *  - HAR: postings of `inheritedHot` buckets (the previous run's
    *    published hot list) bypass the big posting sort entirely — star
    *    pairs come from a broadcast min-per-bucket join, so known-skewed
    *    keys never land on one sort partition.
    * The pair SET is identical to the non-HAR path for the same cap
    * (star pairs to the same per-bucket min member); only the physical
    * plan for hot keys changes.
    */
  def candidatesSkewAware(
      bk: Dataset[BucketRow],
      cfg: DedupConfig,
      inheritedHot: Option[DataFrame] = None): SkewAwareCandidates = {
    import graft.ops.SkewControl
    val spark = bk.sparkSession
    import spark.implicits._
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER

    // HAR: split the inherited keys out BEFORE the posting shuffle — the
    // whole point is that known-skewed keys never land on one sort
    // partition (destor equally acts on the inherited sparse list
    // up-front, har_rewrite.c:186-201)
    val (coldRaw, hotRaw) = inheritedHot match {
      case Some(hot) if !hot.isEmpty =>
        val hotKeys = hot.select("band", "bucket").distinct()
        (bk.toDF().join(broadcast(hotKeys), Seq("band", "bucket"), "left_anti"),
          Some(bk.toDF().join(broadcast(hotKeys), Seq("band", "bucket"))))
      case _ => (bk.toDF(), None)
    }

    // THE posting shuffle — one repartition+radix-sort, PERSISTED so the
    // bucket-size scan (CBR) and the pair expansion read the same
    // exchange instead of shuffling the postings twice (round-2 interim
    // version paid a second full groupBy shuffle + a percentile sketch
    // for the cap; both replaced by a local run-length scan + an exact
    // histogram quantile). The row is the packed 32-byte (key, nid,
    // payload) — band/bucket for the (tiny) hot list are recovered by a
    // broadcast join-back below instead of riding the big shuffle.
    val sorted = coldRaw
      .select(packedKeyCol.as("key"), col("nid"), col("payload"))
      .repartition(col("key"))
      .sortWithinPartitions("key")
      .persist(lvl)

    // bucket-size HISTOGRAM via a run-length scan of the cached sort
    // (materializes the cache): the cache is partitioned AND sorted by
    // `key`, so bucket sizes are run lengths — no per-key state needed.
    // The obvious `groupBy(key).count` formulation built a ~20M-entry
    // BytesToBytesMap per task whose page allocations serialized every
    // worker on the HeapMemoryAllocator pool lock at 32 threads
    // (jstack: all executor threads RUNNABLE in allocate(); the stage's
    // task-time sum inflated 9 s → 374 s from 8 to 32 cores). The scan
    // iterates raw InternalRows (zero per-posting allocation — see
    // expandRows for why that matters at 32 threads) and emits
    // ~hundreds of (size, count) rows per partition — the driver
    // quantile walk is unchanged.
    val histRows = spark.createDataFrame(
      sorted.select(col("key")).queryExecution.toRdd
        .mapPartitions { it =>
          val h = scala.collection.mutable.LongMap.empty[Long]
          var cur = 0L; var n = 0L; var open = false
          while (it.hasNext) {
            val k = it.next().getLong(0)
            if (open && k == cur) n += 1
            else {
              if (open) h(n) = h.getOrElse(n, 0L) + 1L
              cur = k; n = 1L; open = true
            }
          }
          if (open) h(n) = h.getOrElse(n, 0L) + 1L
          h.iterator
        })
      .toDF("n", "cnt")
    val hist = histRows.groupBy("n").agg(sum("cnt").as("count")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val cap = math.max(cfg.bucketCap,
      SkewControl.histogramQuantile(hist, cfg.skewQuantile))
    val anyColdHot = hist.exists { case (n, _) => n > cap }

    // pair expansion: second LOCAL scan of the same cache
    val coldPairs = spark.createDataFrame(
      sorted.queryExecution.toRdd
        .mapPartitions(it => expandRows(it, cap, cfg.hammingMax)))
      .toDF("id1", "id2", "srcbit")

    // hot-list recovery: the packed key is one-way, so real (band,
    // bucket) for this run's hot buckets (HAR publish) come from a
    // broadcast semi-join of the hot keys (a second run-length scan,
    // emitting only over-cap runs — tiny) against a narrow re-scan of
    // the posting source; runs only when the histogram saw any over-cap
    // bucket (rare by construction: cap is the skewQuantile tail).
    val coldHot =
      if (anyColdHot) {
        val hotKeys = spark.createDataFrame(
          sorted.select(col("key")).queryExecution.toRdd
            .mapPartitions { it =>
              val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
              var cur = 0L; var n = 0L; var open = false
              while (it.hasNext) {
                val k = it.next().getLong(0)
                if (open && k == cur) n += 1
                else {
                  if (open && n > cap) out += ((cur, n))
                  cur = k; n = 1L; open = true
                }
              }
              if (open && n > cap) out += ((cur, n))
              out.iterator
            })
          .toDF("key", "n")
        coldRaw
          .select(col("band"), col("bucket"), packedKeyCol.as("key"))
          .join(broadcast(hotKeys), "key")
          .groupBy("band", "bucket").agg(max("n").as("n"))
      } else coldRaw.select(col("band"), col("bucket"), lit(0L).as("n")).limit(0)

    val (raw, hotSizes, cleanupHot) = hotRaw match {
      case Some(hp) =>
        // per-bucket (min member, size) from a partial aggregation —
        // tiny (one row per inherited bucket), persisted for its three
        // consumers (star join, shrink re-route, hot list)
        val minPer = hp.groupBy("band", "bucket")
          .agg(min(struct(col("nid"), col("payload"))).as("m"),
            count(lit(1)).as("n"))
          .persist(lvl)
        val srcbitCol =
          when(col("band") < BandPhash, SrcMinhash)
            .when(col("band") < BandSubstr, SrcPhash)
            .when(col("band") < BandExactSha, SrcSubstr)
            .otherwise(SrcExact)
        val hamOk = when(
          col("band") >= BandPhash && col("band") < BandSubstr,
          expr(s"bit_count(payload ^ m.payload) <= ${cfg.hammingMax}")).otherwise(lit(true))
        // still-hot inherited keys: star pairs via broadcast min-join
        val starred = hp
          .join(broadcast(minPer.filter(col("n") > cap)), Seq("band", "bucket"))
          .filter(col("nid") =!= col("m.nid"))
          .filter(hamOk)
          .select(col("m.nid").as("id1"), col("nid").as("id2"),
            srcbitCol.as("srcbit"))
        // inherited keys that SHRANK below the cap must be all-paired —
        // re-routed through a (tiny) expander pass so the pair set stays
        // exactly the non-HAR path's
        val backKeys = minPer.filter(col("n") <= cap).select("band", "bucket")
        val backPairs = pairStream(
          hp.join(broadcast(backKeys), Seq("band", "bucket")).as[BucketRow], cfg, cap)
        (coldPairs.union(starred).union(backPairs),
          minPer.select(col("band"), col("bucket"), col("n")),
          () => { minPer.unpersist(blocking = false); () })
      case None =>
        (coldPairs, coldHot.limit(0), () => ())
    }

    val hotNow = coldHot.unionByName(SkewControl.hotBuckets(hotSizes, cap))
    SkewAwareCandidates(finishCandidates(raw), hotNow, cap,
      () => { sorted.unpersist(blocking = false); cleanupHot(); () })
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
      cfg: DedupConfig): Dataset[VerifiedPair] =
    verifyWithCleanup(cand, sigs, images, cfg)._1

  /** verify() plus a cleanup thunk that unpersists the internal Mid
    * cache — call it AFTER the returned dataset has been materialized
    * (otherwise repeated pipeline invocations in one session accumulate
    * cached blocks for the session's lifetime) — plus the resolved
    * candidate-pair count, which rides the Mid materialization for free
    * and serves downstream as an edge-count upper bound (CC partitioner
    * sizing without an extra counting pass). */
  private[graft] def verifyWithCleanup(
      cand: DataFrame,
      sigs: Dataset[SignatureRow],
      images: Dataset[ImageRow],
      cfg: DedupConfig): (Dataset[VerifiedPair], () => Unit, Long) = {
    val spark = cand.sparkSession
    import spark.implicits._

    // NOTE: no phash pre-filter join here — the pair generator already
    // rejects hamming-far pairs AT EMISSION (candidates() checks
    // Sig.hamming against payload phashes inside every hamming-LSH
    // bucket), so every phash-only candidate that reaches verify is
    // hamming-close by construction. Round 1 carried a redundant
    // two-join bit_count pre-filter here; it filtered nothing and cost
    // two exchanges plus a second consumer of `cand`.
    // candidates carry 64-bit nids; the sig join resolves them back to
    // string image ids (every downstream consumer — CC, restore, API —
    // speaks image_id). An nid collision fans out m:n here; each joined
    // row is verified EXACTLY below, so collisions cost extra rows,
    // never correctness (self-combos are dropped by the img_1 != img_2
    // filter).
    val toFull = cand.select("id1", "id2", "src")

    val s1 = sigs.select(
      col("nid").as("id1"), col("image_id").as("img_1"),
      col("sha").as("sha_1"), col("pixsha").as("pixsha_1"),
      col("phash").as("phash_1"), col("caption").as("cap_1"))
    val s2 = sigs.select(
      col("nid").as("id2"), col("image_id").as("img_2"),
      col("sha").as("sha_2"), col("pixsha").as("pixsha_2"),
      col("phash").as("phash_2"), col("caption").as("cap_2"))
    // SHUFFLE_HASH, not broadcast: the signature side is O(corpus) — at
    // cluster scale it can never broadcast (Catalyst's stats would agree),
    // and locally the driver-side hash-relation build (collect 400k rows
    // + single-threaded build, twice) was pure serial time that made the
    // whole verify stage scale NEGATIVELY with cores. The hint pins the
    // cluster-correct plan at every scale.
    val joined = toFull
      .join(s1.hint("shuffle_hash"), "id1")
      .join(s2.hint("shuffle_hash"), "id2")
      .filter(col("img_1") =!= col("img_2"))

    val mid = joined
      .select("img_1", "img_2", "src", "sha_1", "sha_2", "pixsha_1", "pixsha_2",
        "phash_1", "phash_2", "cap_1", "cap_2")
      .as[(String, String, String, String, String, String, String, Long, Long, String, String)]
      .mapPartitions { it =>
        // per-partition memo: pairs arrive grouped by id1 (post-shuffle),
        // so each caption's shingle set is computed ~once, not per pair;
        // identical boilerplate captions (hot clusters) also dedupe here
        val memo = new java.util.HashMap[String, Array[Long]]()
        def shingles(cap: String): Array[Long] = {
          if (memo.size > 100000) memo.clear()
          var r = memo.get(cap)
          if (r == null) { r = Sig.shingleHashes(cap, cfg.shingleSize); memo.put(cap, r) }
          r
        }
        it.map { case (i1, i2, src, sA, sB, pA, pB, hA, hB, cA, cB) =>
          // canonical pair order = lexicographic image_id (nids order the
          // shuffle; output pairs keep the string-id convention)
          val flip = i1 > i2
          val (id1, id2) = if (flip) (i2, i1) else (i1, i2)
          val (shaA, shaB) = if (flip) (sB, sA) else (sA, sB)
          val (pixA, pixB) = if (flip) (pB, pA) else (pA, pB)
          val (phA, phB) = if (flip) (hB, hA) else (hA, hB)
          val (capA, capB) = if (flip) (cB, cA) else (cA, cB)
          val ham = Sig.hamming(phA, phB)
          val ja =
            if (shaA == shaB) 1.0 // identical bytes+caption
            else Sig.jaccard(shingles(capA), shingles(capB))
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
          // pixel evidence is computed for EVERY hamming-close pair
          // with distinct pixels — including caption/substr-verdict
          // pairs — so downstream content dedup (RestoreOps) can rely
          // on psnr regardless of which cheaper predicate fired first
          // (a lossy re-encode with an identical caption settles as
          // "caption" but still needs its PSNR for the store).
          val needPixel = ham <= cfg.hammingMax &&
            verdict != "exact" && verdict != "pixel"
          Mid(id1, id2, src, ja, ham, verdict, needPixel)
        }
      }
      // two consumers (settled + pixel side-join) in ONE downstream job
      // — persist AND materialize eagerly, otherwise the union's
      // subplans race and each computes the caption joins
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    // eager materialization (see above) with the total and needPixel
    // counts riding the same job — they drive the broadcast decision
    // below and the CC partitioner hint for free
    val countsRow = mid.toDF().agg(
      count(lit(1)), sum(when(col("needPixel"), 1L).otherwise(0L)))
      .first()
    val midCount = countsRow.getLong(0)
    val needCount = countsRow.getAs[Any](1) match { case null => 0L; case n: Long => n }

    val settled = mid.filter(m => m.verdict.nonEmpty && !m.needPixel).map(m =>
      VerifiedPair(m.id1, m.id2, m.src, m.jaccard, m.hamming,
        if (m.verdict == "exact" || m.verdict == "pixel") 1e9 else 0.0, m.verdict))

    // pixel-verify side-join: only hamming-close, otherwise-unverified
    // pairs. The `bytes` column is scanned ONCE — a semi-join prunes
    // the image scan to the ids any pending pair touches, and the
    // (small) pruned set is materialized so the two per-side joins
    // don't each re-scan and re-decompress the full corpus bytes
    // column (the pipeline's widest column; round 1 scanned it twice).
    val needPix = mid.filter(_.needPixel).toDF()
    val needIdsRaw = needPix.select(col("id1").as("image_id"))
      .union(needPix.select(col("id2").as("image_id"))).distinct()
    // broadcast the pruning ids when bounded: a shuffled semi-join here
    // hash-exchanges the ENTIRE corpus `bytes` column just to match ids
    // (measured 25 s of a 59 s pipeline at 400k images — the single
    // largest verify job). With the id list broadcast, `bytes` rows
    // stream scan→filter→cache and never hit a shuffle. Above the
    // threshold (pathological corpus where most pairs need pixel
    // verification) the shuffled join is the correct plan and AQE
    // handles it.
    val needIds =
      if (needCount * 2 <= 4000000L) broadcast(needIdsRaw) else needIdsRaw
    val pix = images.select(col("image_id"), col("bytes"), col("fmt"))
      .join(needIds, "image_id")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    pix.count() // eager: two consumers below; without this both race to compute it
    val pixVerified = needPix
      .join(pix.select(col("image_id").as("id1"), col("bytes").as("bytes_1"), col("fmt").as("fmt_1")), "id1")
      .join(pix.select(col("image_id").as("id2"), col("bytes").as("bytes_2"), col("fmt").as("fmt_2")), "id2")
      .select("id1", "id2", "src", "jaccard", "hamming", "verdict", "bytes_1", "fmt_1", "bytes_2", "fmt_2")
      .as[(String, String, String, Double, Int, String, Array[Byte], String, Array[Byte], String)]
      .map { case (id1, id2, src, ja, ham, v0, b1, f1, b2, f2) =>
        val pa = Codec.decode(b1, f1)
        val pb = Codec.decode(b2, f2)
        val p = if (pa.length == pb.length) Codec.psnr(pa, pb) else 0.0
        // an earlier (cheaper) verdict survives with its psnr recorded;
        // an otherwise-unverified pair is a dup only past the PSNR gate
        val verdict = if (v0.nonEmpty) v0 else if (p >= cfg.psnrMin) "pixel" else ""
        VerifiedPair(id1, id2, src, ja, ham, p, verdict)
      }
      .filter(_.verdict.nonEmpty)

    (settled.union(pixVerified),
      () => { mid.unpersist(blocking = false); pix.unpersist(blocking = false); () },
      midCount)
  }

  /** Stage 5 — connected components + deterministic representative. */
  def clusters(
      images: Dataset[ImageRow],
      verified: Dataset[VerifiedPair],
      edgeCountHint: Option[Long] = None): Dataset[ClusterRow] = {
    val spark = images.sparkSession
    import spark.implicits._
    val vertices = images.select(col("image_id").as("id"))
    val edges = verified.select(col("id1").as("src"), col("id2").as("dst"))
    ConnectedComponents.run(spark, vertices, edges, edgeCountHint = edgeCountHint)
      .select(col("id").as("image_id"), col("component").as("cluster_id"),
        (col("id") === col("component")).as("representative"))
      .as[ClusterRow]
  }

  /** Whole pipeline in one call (no checkpointing — see StageRunner for
    * the checkpointed/resumable form). Signatures are persisted: three
    * consumers (bucket postings, both verify sides) would otherwise
    * recompute the most expensive narrow stage; spill-safe via
    * MEMORY_AND_DISK_SER. The result is eagerly materialized (small:
    * one row per image, three narrow columns) so every intermediate
    * cache can be dropped before returning — repeated invocations in
    * one session leak nothing. */
  def run(images: Dataset[ImageRow], cfg: DedupConfig): Dataset[ClusterRow] = {
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER
    val sigs = signatures(images, cfg).persist(lvl)
    val bk = buckets(sigs, cfg)
    // LEAN candidate path for the one-shot run: static CAP cap
    // (destor's rewrite_capping_level is equally a static per-run knob,
    // destor.config:140), pairs streaming straight out of the single
    // posting sort-shuffle into the verify joins in ONE query — no
    // persisted copy of the exchange, no bucket-size histogram job.
    // Star-pairing above the cap preserves bucket connectivity, so
    // cluster output is cap-invariant wherever verification passes.
    // The ADAPTIVE controllers (CBR quantile cap, HAR hot-bucket
    // inheritance) live on the cross-run ingest flow — see
    // candidatesSkewAware / IncrementalDedup — where destor's own
    // feedback loops operate (cbr_rewrite.c keeps a cross-job utility
    // history; har_rewrite.c loads the previous job's sparse list).
    val cand = candidates(bk, cfg)
    val (ver, cleanupMid, pairCount) = verifyWithCleanup(cand, sigs, images, cfg)
    val out = clusters(images, ver, Some(pairCount)).localCheckpoint() // eager
    sigs.unpersist(blocking = false)
    cleanupMid()
    out
  }
}
