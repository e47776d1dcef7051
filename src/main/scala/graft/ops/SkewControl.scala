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
    * never below `floor` (the static bucketCap). approx_percentile
    * because the exact quantile of a billion-bucket table would need a
    * full sort; the cap only bounds work, so approximation is safe. */
  def adaptiveCap(sizes: DataFrame, skewQuantile: Double, floor: Int): Int = {
    val row = sizes.agg(expr(s"approx_percentile(n, $skewQuantile)")).first()
    val q = if (row.isNullAt(0)) 0L else row.getLong(0)
    math.max(floor, math.min(q, Int.MaxValue.toLong).toInt)
  }

  /** HAR hot list: buckets whose size exceeds the (adaptive) cap —
    * published per run, inherited by the next (har_rewrite.c:96-101
    * writes `bv<id>.sparse`; init_har reads `bv<id-1>.sparse`). */
  def hotBuckets(sizes: DataFrame, cap: Int): DataFrame =
    sizes.filter(col("n") > cap)
}
