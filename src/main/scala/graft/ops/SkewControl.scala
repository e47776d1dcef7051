package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Adaptive skew control over LSH bucket postings — the Spark recast of
  * destor's two data-driven rewrite controllers:
  *
  *  - CBR adaptive threshold (reference: src/cbr_rewrite.c:27-55): destor
  *    keeps a 10k-bin utility histogram and re-derives the rewrite
  *    threshold so only the configured fraction of chunks is rewritten.
  *    Here the "utility" is the bucket SIZE distribution: the effective
  *    all-pairs cap is the `skewQuantile`-quantile of bucket sizes,
  *    floored at the static `bucketCap` — so when a corpus's bucket-size
  *    distribution shifts up (boilerplate captions, empty-ish images),
  *    the cap rises with it and only the top (1-q) tail gets CAP
  *    star-pairing, instead of the static cap silently star-pairing
  *    most of the corpus.
  *
  *  - HAR cross-run hot-bucket feedback (reference: src/har_rewrite.c:
  *    17-57 init_har reads the PREVIOUS backup's sparse-container list;
  *    :173-219 rewrites their chunks immediately, without waiting for
  *    this run's monitor): a run publishes its hot-bucket list; the next
  *    run routes postings of inherited hot buckets through a broadcast
  *    min-join star-pairing path that never enters the big posting sort
  *    — the known-skewed keys are split out BEFORE the shuffle instead
  *    of being discovered inside it.
  *
  * Cost model: `bucketSizes` is one map-side-combined aggregation over
  * the posting table whose result has one row per DISTINCT bucket —
  * at 10^12 rows its output is ~b·n/avg_bucket rows of 3 small columns,
  * and it shares the scan with nothing else (runs before the pair
  * shuffle). The quantile is a driver-side scalar over that aggregate.
  */
object SkewControl {

  /** Bucket-size table (band, bucket, n) from a posting table —
    * ONE partial-aggregated shuffle, tiny result. */
  def bucketSizes(postings: DataFrame): DataFrame =
    postings.groupBy("band", "bucket").agg(count(lit(1)).as("n"))

  /** CBR adaptive cap: the `skewQuantile`-quantile of bucket sizes,
    * never below `floor` (the static bucketCap). Computed EXACTLY via a
    * size histogram — `groupBy(n).count` collapses a billion buckets to
    * a few hundred distinct sizes (destor's own mechanism is a 10k-bin
    * histogram, src/cbr_rewrite.c:27-55), so the driver-side quantile
    * walk is exact and costs one tiny aggregation instead of an
    * approx_percentile sketch merge (measured: the sketch over ~1.4M
    * size values dominated the pass at 20k images). */
  def adaptiveCap(sizes: DataFrame, skewQuantile: Double, floor: Int): Int =
    math.max(floor, histogramQuantile(
      sizes.groupBy("n").count().collect()
        .map(r => (r.getLong(0), r.getLong(1))), skewQuantile))

  /** Exact quantile from a (value, count) histogram: the smallest value
    * whose cumulative count reaches q * total (0 on an empty histogram). */
  def histogramQuantile(hist: Array[(Long, Long)], q: Double): Int = {
    val sorted = hist.sortBy(_._1)
    val total = sorted.map(_._2).sum
    if (total == 0L) return 0
    val target = math.max(1L, math.ceil(q * total).toLong)
    var cum = 0L
    var i = 0
    while (i < sorted.length) {
      cum += sorted(i)._2
      if (cum >= target) return math.min(sorted(i)._1, Int.MaxValue.toLong).toInt
      i += 1
    }
    math.min(sorted.last._1, Int.MaxValue.toLong).toInt
  }

  /** HAR hot list: buckets whose size exceeds the (adaptive) cap —
    * published per run, inherited by the next (har_rewrite.c:96-101
    * writes `bv<id>.sparse`; init_har reads `bv<id-1>.sparse`). */
  def hotBuckets(sizes: DataFrame, cap: Int): DataFrame =
    sizes.filter(col("n") > cap)
}
