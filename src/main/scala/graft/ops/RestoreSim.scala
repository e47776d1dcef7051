package graft.ops

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Restore-cache simulations (T2/T3/T4/O5) and the cache-aware rewrite
  * filter (R6) — destor's restore-side cache policies recast as batch
  * metrics over the recipe stream.
  *
  * Reference:
  *  - LRU restore cache: `lru_restore_thread` src/do_restore.c:11-66 —
  *    per chunk pointer, LRU of containers, miss = one container read.
  *  - Belady/optimal cache: src/optimal_restore.c:51-285 — victim is
  *    the cached container whose next access is farthest in the future,
  *    known through a sliding window of upcoming access records
  *    (`restore_opt_window_size`); containers with NO access left in
  *    the window are evicted first (g_access_records_cmp_by_first_seqno
  *    src/optimal_restore.c:38-49).
  *  - Forward assembly: src/assembly_restore.c:13-188 — fill an
  *    assembly area with the next (cache_size-1)*CONTAINER_SIZE bytes
  *    of recipe, read the head chunk's container, mark every area chunk
  *    from that container ready, flush the ready prefix, repeat.
  *  - Cache-aware rewrite filter: src/filter_phase.c:98-103 +
  *    src/restore_aware.c:45-68 — during backup, an LRU simulating the
  *    future restore denies the rewrite of any duplicate whose
  *    container is currently cached.
  *
  * Spark recast: each backup stream's recipe is a linear, stateful
  * walk, so a stream simulates in ONE task while streams parallelize
  * across the cluster (the TraceSource pattern: repartition by stream +
  * sortWithinPartitions + mapPartitions). All policies run in a single
  * shared pass per stream — the Belady window is the bounded-memory
  * lookahead knob, so no policy ever buffers the whole stream — which
  * is what lets one 10^12-image recipe stream simulate in O(window +
  * cache) memory.
  */
object RestoreSim {

  /** A policy consumes the access stream one (cid, size) at a time and
    * reports container reads at the end. */
  sealed trait SimConsumer {
    def name: String
    def cacheSize: Int
    def feed(cid: String, size: Long): Unit
    def finish(): Long
  }

  /** T2: LRU of containers, capacity `k` (do_restore.c:11-66). */
  final class LruSim(val cacheSize: Int) extends SimConsumer {
    val name = "lru"
    private var reads = 0L
    private[ops] val cache = new java.util.LinkedHashMap[String, AnyRef](16, 0.75f, true) {
      override def removeEldestEntry(e: java.util.Map.Entry[String, AnyRef]): Boolean =
        size() > cacheSize
    }
    def feed(cid: String, size: Long): Unit =
      if (cache.get(cid) == null) { reads += 1; cache.put(cid, this) }
    def finish(): Long = reads
    def contains(cid: String): Boolean = cache.containsKey(cid)
  }

  /** T3/O5: Belady with a bounded lookahead window `window` — exact
    * offline-optimal when the window covers the stream. Victim = the
    * cached container with no buffered next use, else the farthest
    * head seqno (optimal_restore.c:38-49,131-231). */
  final class BeladySim(val cacheSize: Int, window: Int,
                        override val name: String = "belady") extends SimConsumer {
    private var reads = 0L
    private var seqIn = 0L
    private val buffer = new java.util.ArrayDeque[String]()
    private val nextUse = mutable.HashMap.empty[String, java.util.ArrayDeque[Long]]
    // insertion-ordered so the no-next-use tie (destor's "empty queue
    // sorts last") breaks deterministically: oldest-cached wins
    private val cache = mutable.LinkedHashSet.empty[String]

    def feed(cid: String, size: Long): Unit = {
      buffer.addLast(cid)
      nextUse.getOrElseUpdate(cid, new java.util.ArrayDeque[Long]()).addLast(seqIn)
      seqIn += 1
      if (buffer.size > window) step()
    }
    def finish(): Long = { while (!buffer.isEmpty) step(); reads }

    private def step(): Unit = {
      val cid = buffer.pollFirst()
      // slide the window: this access record is consumed
      val q = nextUse(cid)
      q.pollFirst()
      if (q.isEmpty) { nextUse.remove(cid); () }
      if (!cache.contains(cid)) {
        reads += 1
        if (cache.size >= cacheSize) {
          // farthest-next-use victim; no-buffered-use sorts farthest
          var victim: String = null
          var worst = -1L
          cache.foreach { c =>
            val d = nextUse.get(c) match {
              case Some(q) if !q.isEmpty => q.peekFirst(): Long
              case _ => Long.MaxValue
            }
            if (d > worst) { worst = d; victim = c }
          }
          cache.remove(victim)
        }
        cache.add(cid)
      }
    }
  }

  /** T4: forward assembly area of (k-1) container-sizes of upcoming
    * recipe bytes; one container read fills every matching area chunk
    * (assembly_restore.c:29-120). */
  final class AssemblySim(val cacheSize: Int, containerBytes: Long) extends SimConsumer {
    require(cacheSize >= 2, s"assembly needs cache_size >= 2, got $cacheSize")
    val name = "assembly"
    private val areaLimit = (cacheSize - 1).toLong * containerBytes
    private var reads = 0L
    private var areaBytes = 0L
    private final case class Slot(cid: String, size: Long, var ready: Boolean)
    private val area = new java.util.ArrayDeque[Slot]()

    def feed(cid: String, size: Long): Unit = {
      area.addLast(Slot(cid, size, ready = false))
      areaBytes += size
      while (areaBytes >= areaLimit && !area.isEmpty) assembleOnce()
    }
    def finish(): Long = { while (!area.isEmpty) assembleOnce(); reads }

    private def assembleOnce(): Unit = {
      // flush any ready prefix first (previous reads may have filled it)
      flushReady()
      if (area.isEmpty) return
      val id = area.peekFirst().cid
      reads += 1
      val it = area.iterator()
      while (it.hasNext) { val s = it.next(); if (s.cid == id) s.ready = true }
      flushReady()
    }
    private def flushReady(): Unit =
      while (!area.isEmpty && area.peekFirst().ready)
        areaBytes -= area.pollFirst().size
  }

  /** The recipe stream the sims replay: every chunk of every document
    * (fastcdc), pointing at the container of its fingerprint's FIRST
    * occurrence — chunkBackup's dedup + packing decision re-read as a
    * restore plan. One data-scale shuffle on fp (the store probe), one
    * on the pack shard: identical budget to chunkBackup. */
  def recipe(spark: SparkSession, dir: String, algo: String = "fastcdc",
             containerBytes: Long = 4096L): DataFrame = {
    val src = spark.read.parquet(s"$dir/documents.parquet").select("doc_id", "source")
    val chunks = ChunkOps.chunkDocs(spark, dir, algo)
    val store = ChunkOps.packFlagged(ChunkOps.flagFirst(chunks), containerBytes)
      .filter(col("is_first"))
      .select(col("fp"), col("container_id").as("cid"))
    chunks.join(store, Seq("fp"))
      .join(src, Seq("doc_id"))
      .select(col("source"), col("doc_id"), col("chunk_idx"), col("cid"),
        col("len").cast("long").as("len"))
  }

  /** Run every policy in one shared pass per stream. Emits one row per
    * (source, policy, cache_size): container reads + the stream's
    * access/distinct counts. */
  def cacheSim(recipeDf: DataFrame,
               mkPolicies: () => Seq[SimConsumer]): DataFrame = {
    val spark = recipeDf.sparkSession
    import spark.implicits._
    recipeDf.select("source", "doc_id", "chunk_idx", "cid", "len")
      .repartition(col("source"))
      .sortWithinPartitions("source", "doc_id", "chunk_idx")
      .mapPartitions { it =>
        val out = Seq.newBuilder[(String, String, Int, Long, Long, Long)]
        val rows = it.buffered
        while (rows.hasNext) {
          val src = rows.head.getString(0)
          val sims = mkPolicies()
          val distinct = mutable.HashSet.empty[String]
          var n = 0L
          while (rows.hasNext && rows.head.getString(0) == src) {
            val r = rows.next()
            val cid = r.getString(3); val len = r.getLong(4)
            distinct.add(cid); n += 1
            sims.foreach(_.feed(cid, len))
          }
          sims.foreach(s =>
            out += ((src, s.name, s.cacheSize, s.finish(), n, distinct.size.toLong)))
        }
        out.result().iterator
      }
      .toDF("source", "policy", "cache_size", "reads", "n_accesses", "n_distinct")
  }

  /** Driver query (rows-only; RestoreSimSpec holds the exact oracles —
    * DP-optimal paging, brute LRU, hand-worked assembly): the three
    * restore cache policies over the corpus recipe at two cache sizes,
    * plus the windowed-Belady approximation destor actually ships. */
  def restoreCacheQuery(spark: SparkSession, dir: String): DataFrame =
    cacheSim(recipe(spark, dir), () => Seq(
      new LruSim(4), new LruSim(16),
      new BeladySim(4, 1 << 20), new BeladySim(16, 1 << 20),
      new BeladySim(4, 64, name = "belady_w64"),
      new AssemblySim(4, 4096L), new AssemblySim(16, 4096L)))
      .orderBy("source", "policy", "cache_size")

  /** Self-verifying gate (the q_recall_gate pattern): paging-theory
    * invariants that must hold exactly on every stream — Belady is
    * optimal (≤ LRU at equal k, ≤ its own windowed approximation), LRU
    * is a stack algorithm (monotone in k), every policy reads each
    * distinct container at least once, and a cache big enough to hold
    * everything reads exactly n_distinct. One constant verdict row,
    * hash-checked by the driver against literal SQL. */
  def cacheGate(spark: SparkSession, dir: String): DataFrame = {
    // bounded-scale verification INSTRUMENT (the same class as the
    // O(n²) oracle twins, never run at corpus scale): the exact-Belady
    // and everything-fits-LRU legs use Int.MaxValue window/capacity so
    // the invariants hold for ANY stream the instrument can buffer —
    // a finite 2^20 window would silently turn Belady approximate on
    // longer streams and fail the constant verdict for a non-bug
    val sim = cacheSim(recipe(spark, dir), () => Seq(
      new LruSim(4), new LruSim(16), new LruSim(Int.MaxValue),
      new BeladySim(4, Int.MaxValue), new BeladySim(4, 64, name = "belady_w64"),
      new AssemblySim(4, 4096L)))
    def rd(pol: String, k: Int) =
      min(when(col("policy") === pol && col("cache_size") === k, col("reads")))
    // single conditional-aggregation pass: the simulation pipeline
    // executes ONCE (a pivot + self-join spelling ran it twice)
    val p = sim.groupBy("source").agg(
      rd("lru", 4).as("lru_k4"), rd("lru", 16).as("lru_k16"),
      rd("lru", Int.MaxValue).as("lru_kinf"),
      rd("belady", 4).as("belady_k4"), rd("belady_w64", 4).as("belady_w64_k4"),
      rd("assembly", 4).as("assembly_k4"),
      max("n_accesses").as("n_accesses"), max("n_distinct").as("n_distinct"))
    p.agg(
      count(lit(1)).as("n_streams"),
      min(when(col("belady_k4") <= col("lru_k4"), 1L).otherwise(0L)).as("opt_le_lru_ok"),
      min(when(col("lru_k16") <= col("lru_k4"), 1L).otherwise(0L)).as("lru_monotone_ok"),
      min(when(col("belady_k4") <= col("belady_w64_k4"), 1L).otherwise(0L)).as("window_ge_exact_ok"),
      min(when(col("belady_k4") >= col("n_distinct") &&
        col("lru_k4") >= col("n_distinct") &&
        col("assembly_k4") >= col("n_distinct"), 1L).otherwise(0L)).as("ge_distinct_ok"),
      min(when(col("lru_kinf") === col("n_distinct"), 1L).otherwise(0L)).as("bigcache_exact_ok"))
  }

  // ------------------------------------------------------------------
  // R6: cache-aware rewrite filter
  // ------------------------------------------------------------------

  /** Per-stream replay of destor's filter-phase write decision with the
    * restore-aware LRU (R6): a duplicate flagged for rewrite is DENIED
    * when its container is currently in the simulated restore cache
    * (filter_phase.c:98-103); written chunks (uniques + granted
    * rewrites) pack into an open container that rolls over at
    * `containerBytes`; every chunk then updates the restore-aware LRU
    * with the container a restore would actually read
    * (restore_aware.c:45-60). Emits destor's per-job counters plus the
    * restore-aware CFL (ocf/ccf, capped at 1 — restore_aware.c:57-67).
    *
    * Input rows: (source, doc_id, chunk_idx, cid, len, is_first,
    * flagged) — `cid` the stored container of the chunk's fingerprint,
    * `flagged` the upstream rewrite request (CFL/CBR/CAP decision).
    */
  def cacheAwareRewrite(flaggedRecipe: DataFrame, cacheSize: Int,
                        containerBytes: Long): DataFrame = {
    val spark = flaggedRecipe.sparkSession
    import spark.implicits._
    flaggedRecipe
      .select("source", "doc_id", "chunk_idx", "cid", "len", "is_first", "flagged")
      .repartition(col("source"))
      .sortWithinPartitions("source", "doc_id", "chunk_idx")
      .mapPartitions { it =>
        val out = Seq.newBuilder[(String, Long, Long, Long, Long, Long, Double)]
        val rows = it.buffered
        while (rows.hasNext) {
          val src = rows.head.getString(0)
          val aware = new LruSim(cacheSize) // restore_aware's internal LRU
          var open = 0L      // open container ordinal for this stream
          var fill = 0L
          var total = 0L     // restore_aware total_size
          var nChunks, nDups, nFlagged, nDenied, nRewritten = 0L
          // W3 overflow check first, then pack into the open container
          def writeTo(len: Long): String = {
            if (fill > 0 && fill + len > containerBytes) { open += 1; fill = 0 }
            fill += len
            s"$src!$open"
          }
          while (rows.hasNext && rows.head.getString(0) == src) {
            val r = rows.next()
            val cid = r.getString(3); val len = r.getLong(4)
            val isFirst = r.getBoolean(5); val flagged = r.getBoolean(6)
            nChunks += 1
            var finalCid: String = null
            if (isFirst) {
              finalCid = writeTo(len)
            } else {
              nDups += 1
              if (flagged) {
                nFlagged += 1
                if (aware.contains(cid)) { nDenied += 1; finalCid = cid }
                else { nRewritten += 1; finalCid = writeTo(len) }
              } else finalCid = cid
            }
            // restore_aware_update with the container a restore reads
            total += len
            aware.feed(finalCid, len)
          }
          // ccf = the LRU's miss count — LruSim already counts exactly
          // the containers the simulated restore touches
          val ccf = aware.finish()
          val ocf = (total + containerBytes - 1) / containerBytes
          val cfl = math.min(1.0, ocf.toDouble / math.max(ccf, 1L))
          out += ((src, nChunks, nDups, nFlagged, nDenied, nRewritten,
            math.rint(cfl * 1e6) / 1e6))
        }
        out.result().iterator
      }
      .toDF("source", "n_chunks", "n_dups", "n_flagged", "n_denied",
        "n_rewritten", "cfl")
  }

  /** Driver query for R6 (rows-only; spec replays a hand-built stream):
    * rewrite requests = out-of-order duplicates (the stored container
    * differs from the previous chunk's — destor's fragmentation
    * trigger), filtered by the restore-aware cache. */
  def cacheAwareRewriteQuery(spark: SparkSession, dir: String): DataFrame =
    cacheAwareRewrite(flaggedRecipeFor(spark, dir),
      cacheSize = 8, containerBytes = 4096L)
      .orderBy("source")

  /** recipe() + the two decision columns cacheAwareRewrite consumes. */
  private[graft] def flaggedRecipeFor(spark: SparkSession, dir: String): DataFrame = {
    val firsts = ChunkOps.flagFirst(ChunkOps.chunkDocs(spark, dir, "fastcdc"))
    val store = ChunkOps.packFlagged(firsts, containerBytes = 4096L)
      .filter(col("is_first"))
      .select(col("fp"), col("container_id").as("cid"))
    val src = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "source")
    val ordStream = Window.partitionBy("source").orderBy(col("doc_id"), col("chunk_idx"))
    firsts.select("doc_id", "chunk_idx", "fp", "len", "is_first")
      .join(store, Seq("fp"))
      .join(src, Seq("doc_id"))
      .withColumn("flagged",
        !col("is_first") && lag(col("cid"), 1).over(ordStream) =!= col("cid"))
      .na.fill(Map("flagged" -> false))
      .select(col("source"), col("doc_id"), col("chunk_idx"), col("cid"),
        col("len").cast("long").as("len"), col("is_first"), col("flagged"))
  }
}
