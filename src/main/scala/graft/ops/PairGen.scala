package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Streamed run-length candidate-pair expansion from LSH bucket
  * postings — the ONE shape every dedup family (image minhash/phash/
  * winnowing, doc minhash/simhash/ngram/substring) uses for pair
  * generation.
  *
  * Why this shape: a `groupBy(band,bucket).agg(collect_list(id))`
  * formulation materializes each bucket's full member list in a single
  * aggregation buffer — object-aggregation fallback, unbounded per-key
  * memory, and measured ~170 s at 100k rows in round 1. Here the
  * postings take ONE Tungsten sort shuffle (repartition on (band,bucket)
  * + sortWithinPartitions) and pairs stream out of a linear scan over
  * the sorted runs; the only buffer is the current bucket's member
  * array, and hot buckets emit only star pairs (destor's CAP capping,
  * reference: src/cap_rewrite.c:44-107 — bounded fan-in, connectivity
  * preserved for connected-components clustering).
  */
object PairGen {

  /** Generic run-length grouping over a partition iterator whose rows
    * arrive sorted by (band, bucket): for each maximal run of equal
    * keys, `emit(band, bucket, ids, payloads)` is invoked once with the
    * members in arrival (= sorted-id) order. The arrays passed to
    * `emit` are fresh copies, so `emit` may return a lazy iterator.
    * Buffer is bounded by the largest single bucket.
    */
  def groupRuns[I, T](
      it: Iterator[(Int, Long, I, Long)],
      emit: (Int, Long, Array[I], Array[Long]) => Iterator[T],
      minRun: Int = 2)(
      implicit ct: scala.reflect.ClassTag[I]): Iterator[T] = {
    val ids = new scala.collection.mutable.ArrayBuffer[I](64)
    val pls = new scala.collection.mutable.ArrayBuffer[Long](64)
    var curBand = 0
    var curBucket = 0L
    var open = false
    def flush(): Iterator[T] =
      if (ids.length < minRun) Iterator.empty
      else emit(curBand, curBucket, ids.toArray, pls.toArray)
    val body = it.flatMap { case (band, bucket, id, payload) =>
      if (!open || band != curBand || bucket != curBucket) {
        val out = if (open) flush() else Iterator.empty
        open = true
        curBand = band
        curBucket = bucket
        ids.clear(); pls.clear()
        ids += id; pls += payload
        out
      } else {
        ids += id; pls += payload
        Iterator.empty
      }
    }
    // trailing flush once the sorted stream is exhausted
    body ++ new Iterator[T] {
      private var tail: Iterator[T] = null
      private def t: Iterator[T] = { if (tail == null) { tail = if (open) flush() else Iterator.empty }; tail }
      def hasNext: Boolean = t.hasNext
      def next(): T = t.next()
    }
  }

  /** CAP-capped pair emission from one bucket's sorted member array:
    * all pairs for buckets <= cap, star pairs to the min member above
    * it (linear fan-in for hot buckets; the star keeps the bucket one
    * connected component, which is all clustering needs).
    */
  def capPairs[I](members: Array[I], cap: Int): Iterator[(I, I)] =
    if (members.length <= cap)
      for (i <- members.indices.iterator; j <- (i + 1) until members.length)
        yield (members(i), members(j))
    else
      (1 until members.length).iterator.map(j => (members(0), members(j)))

  /** Candidate pairs from a Long-id posting table with columns
    * (band, bucket, doc_id) — the doc/embedding-side entry point.
    * One sort shuffle + streamed expansion + cross-band pair dedup.
    * `cap` = all-pairs threshold (CAP star-pairing above); pass
    * Int.MaxValue for exact all-pairs semantics (oracled queries).
    */
  def bucketPairsLong(postings: DataFrame, cap: Int): DataFrame = {
    val spark = postings.sparkSession
    import spark.implicits._
    // ONE packed 64-bit shuffle/sort key instead of (band,bucket,id):
    // the Tungsten sort becomes a pure radix sort; member ids are
    // sorted locally per run. A key collision between two (band,bucket)
    // buckets merely merges them — candidates only gain members and
    // every caller verifies pairs exactly, so recall and correctness
    // are unaffected.
    postings
      .select(xxhash64(col("band"), col("bucket")).as("key"), col("doc_id").cast("long"))
      .repartition(col("key"))
      .sortWithinPartitions("key")
      .as[(Long, Long)]
      .mapPartitions { it =>
        groupRuns[Long, (Long, Long)](it.map(r => (0, r._1, r._2, 0L)),
          (_, _, ids, _) => { java.util.Arrays.sort(ids); capPairs(ids, cap) })
      }
      .toDF("id1", "id2")
      .distinct()
  }
}
