package graft

import scala.collection.mutable
import scala.util.Random

import graft.ops.RestoreSim
import graft.ops.RestoreSim.{AssemblySim, BeladySim, LruSim}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Restore-cache simulations (T2/T3/T4/O5) and the cache-aware rewrite
  * filter (R6): exact oracles — DP-optimal offline paging for Belady,
  * a brute-force list LRU, hand-worked forward-assembly traces — plus
  * the paging-theory invariants and Spark-side partition invariance. */
class RestoreSimSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.core.Sessions.local(4, 8, "restore-sim-spec")

  private def lru(seq: Seq[String], k: Int): Long = {
    val s = new LruSim(k); seq.foreach(s.feed(_, 1L)); s.finish()
  }
  private def belady(seq: Seq[String], k: Int, w: Int = 1 << 20): Long = {
    val s = new BeladySim(k, w); seq.foreach(s.feed(_, 1L)); s.finish()
  }

  /** True offline-optimal fault count by exhaustive memoized search
    * over (position, cache-set) — the ground truth Belady must hit. */
  private def optimalDp(seq: IndexedSeq[String], k: Int): Long = {
    val memo = mutable.HashMap.empty[(Int, Set[String]), Long]
    def go(i: Int, cache: Set[String]): Long = {
      if (i == seq.length) 0L
      else memo.getOrElseUpdate((i, cache), {
        val c = seq(i)
        if (cache.contains(c)) go(i + 1, cache)
        else if (cache.size < k) 1L + go(i + 1, cache + c)
        else cache.iterator.map(v => 1L + go(i + 1, cache - v + c)).min
      })
    }
    go(0, Set.empty)
  }

  /** Brute LRU over a plain list — independent of LinkedHashMap. */
  private def bruteLru(seq: Seq[String], k: Int): Long = {
    var order = List.empty[String] // most recent first
    var misses = 0L
    seq.foreach { c =>
      if (order.contains(c)) order = c :: order.filterNot(_ == c)
      else {
        misses += 1
        order = (c :: order).take(k)
      }
    }
    misses
  }

  private def randSeq(seed: Int, len: Int, alphabet: Int): IndexedSeq[String] = {
    val r = new Random(seed)
    IndexedSeq.fill(len)("c" + r.nextInt(alphabet))
  }

  test("Belady with full window equals DP-optimal offline paging") {
    for (seed <- 1 to 30) {
      val seq = randSeq(seed, 14, 5)
      for (k <- 2 to 3)
        assert(belady(seq, k) === optimalDp(seq, k), s"seed=$seed k=$k seq=$seq")
    }
  }

  test("LruSim equals the brute-force list LRU") {
    for (seed <- 1 to 20) {
      val seq = randSeq(seed, 300, 12)
      for (k <- Seq(1, 4, 8))
        assert(lru(seq, k) === bruteLru(seq, k), s"seed=$seed k=$k")
    }
  }

  test("LRU stack property: misses monotone non-increasing in cache size") {
    for (seed <- 1 to 10) {
      val seq = randSeq(seed, 400, 15)
      val misses = Seq(2, 4, 8, 16, 32).map(lru(seq, _))
      assert(misses === misses.sorted.reverse, s"seed=$seed misses=$misses")
    }
  }

  test("windowed Belady: >= exact optimal, == exact when window covers the stream") {
    for (seed <- 1 to 15) {
      val seq = randSeq(seed, 200, 10)
      val exact = belady(seq, 4)
      assert(belady(seq, 4, w = seq.length + 1) === exact)
      for (w <- Seq(4, 16, 64))
        assert(belady(seq, 4, w) >= exact, s"seed=$seed w=$w")
    }
  }

  test("Belady beats or ties LRU at equal cache size") {
    for (seed <- 1 to 15) {
      val seq = randSeq(seed, 300, 12)
      for (k <- Seq(2, 4, 8))
        assert(belady(seq, k) <= lru(seq, k), s"seed=$seed k=$k")
    }
  }

  test("forward assembly: hand-worked trace with a re-read beyond the area horizon") {
    // area = (k-1)*cb = 2 containers' worth; chunk size = half container
    // stream: A A B B C C A A  (sizes 512, cb 1024, k 3 -> area 2048)
    // fills 4 chunks (2048): AABB -> read A (flush AA), refill CC ->
    // BBCC full -> read B, read C, refill AA -> read A AGAIN = 4 reads
    val s = new AssemblySim(3, 1024L)
    Seq("A", "A", "B", "B", "C", "C", "A", "A").foreach(s.feed(_, 512L))
    assert(s.finish() === 4L)
  }

  test("forward assembly: area covering the whole stream reads each container once") {
    val seq = Seq("A", "B", "A", "C", "B", "A", "C")
    val s = new AssemblySim(64, 1024L) // area 63 KiB >> stream
    seq.foreach(s.feed(_, 100L))
    assert(s.finish() === 3L)
  }

  test("cache-aware rewrite (R6): denial requires restore-cache membership") {
    import spark.implicits._
    // one stream; containerBytes large so all writes go to container s!0
    // chunks: u1(new) d1(dup of cid X, flagged, X NOT cached -> rewritten)
    //         d2(dup of s!0, flagged, s!0 IS cached -> denied)
    //         d3(dup of Y, unflagged -> plain dup)
    val rows = Seq(
      ("s", 1L, 0, "X", 10L, true, false),   // unique, writes to s!0
      ("s", 2L, 0, "X", 10L, false, true),   // dup of X: X not cached yet? X never final-cid'd... rewritten
      ("s", 3L, 0, "s!0", 10L, false, true), // dup pointing at the open container: cached -> denied
      ("s", 4L, 0, "Y", 10L, false, false)   // unflagged dup
    ).toDF("source", "doc_id", "chunk_idx", "cid", "len", "is_first", "flagged")
    val out = RestoreSim.cacheAwareRewrite(rows, cacheSize = 4, containerBytes = 1 << 20)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toList
    assert(out === List(("s", 4L, 3L, 2L, 1L, 1L)))
    // n_chunks=4, n_dups=3, n_flagged=2, n_denied=1 (the s!0 dup),
    // n_rewritten=1 (the X dup: X was never updated into the cache
    // as a FINAL cid before it -> miss -> rewrite granted)
  }

  test("cache-aware rewrite: unflagged duplicates update the restore-aware cache") {
    import spark.implicits._
    // d1 unflagged dup of X primes the cache with X; d2 flagged dup of X
    // must then be DENIED (destor: restore_aware_update runs for every
    // written-or-referenced chunk, so earlier dups protect their container)
    val rows = Seq(
      ("s", 1L, 0, "X", 10L, false, false),
      ("s", 2L, 0, "X", 10L, false, true)
    ).toDF("source", "doc_id", "chunk_idx", "cid", "len", "is_first", "flagged")
    val out = RestoreSim.cacheAwareRewrite(rows, cacheSize = 4, containerBytes = 1 << 20)
      .collect().map(r => (r.getLong(3), r.getLong(4), r.getLong(5))).toList
    assert(out === List((1L, 1L, 0L))) // flagged=1, denied=1, rewritten=0
  }

  test("Spark cacheSim: partition-count invariant and policy-complete") {
    val recipeDf = RestoreSim.recipe(spark, "/root/testdata/sf0.001")
    def run(parts: Int) = RestoreSim.cacheSim(
      recipeDf.repartition(parts),
      () => Seq(new LruSim(4), new BeladySim(4, 1 << 20), new AssemblySim(4, 4096L)))
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSet
    val a = run(2)
    val b = run(8)
    assert(a === b)
    assert(a.map(_._2) === Set("lru", "belady", "assembly"))
    // every stream present, reads within [n_distinct, n_accesses]
    assert(a.forall { case (_, _, _, reads, n, d) => reads >= d && reads <= n })
  }

  test("Spark cacheGate: constant verdict row at sf0.001") {
    val row = RestoreSim.cacheGate(spark, "/root/testdata/sf0.001").collect().head
    assert(row.getLong(1) === 1L, "opt_le_lru")
    assert(row.getLong(2) === 1L, "lru_monotone")
    assert(row.getLong(3) === 1L, "window_ge_exact")
    assert(row.getLong(4) === 1L, "ge_distinct")
    assert(row.getLong(5) === 1L, "bigcache_exact")
    assert(row.getLong(0) === 20L, "n_streams (sf0.001 has 20 sources)")
  }
}
