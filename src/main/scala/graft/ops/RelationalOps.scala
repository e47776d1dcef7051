package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The general operator inventory from SURVEY.md §2 expressed over the
  * driver's TPC-H-ish tables, each with a DuckDB-oracle twin in
  * SparkEntry.oracleSql. Every query is pure DataFrame API — Catalyst
  * handles pushdown/pruning/join selection; `broadcast()` marks the
  * genuinely small dimension sides.
  */
object RelationalOps {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** A7 job/global stats: grouped aggregation with multiple measures
    * (the backup.log counters shape, reference src/do_backup.c:99-134). */
  def aggStats(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        count(lit(1)).as("n_rows"),
        round(sum("l_quantity"), 2).as("sum_qty"),
        // rounding rule for oracle parity: round at the decimal grain of
        // the EXACT value (revenue terms have 4 decimals, discounts 2) so
        // engine-order fp drift can never sit on a rounding half-boundary
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4).as("revenue"),
        round(sum("l_discount"), 2).as("sum_disc"))

  /** W1 write-decision predicate: filter + projection (pushed to scan). */
  def filterProject(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .filter(col("l_discount") >= 0.05 && col("l_quantity") < 10)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        // no rounding: a single IEEE multiply is bit-identical across engines
        (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("net_price"))

  /** J1 equi-join probe: orders x customer, grouped — the dedup-join
    * shape (hash equi-join), dimension side broadcast. */
  def joinAgg(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .join(broadcast(t(spark, dir, "customer")),
        col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_orders"), round(sum("o_totalprice"), 2).as("total"))

  /** J1 anti-join: the "unique chunk" partition (reference
    * src/index/index.c:200-203) — customers with no orders. */
  def antiJoin(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "customer")
      .join(t(spark, dir, "orders").filter(col("o_totalprice") > 300000),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")

  /** J1 semi-join: parts that appear in any lineitem. */
  def semiJoin(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "part")
      .join(t(spark, dir, "lineitem"), col("p_partkey") === col("l_partkey"), "left_semi")
      .select("p_partkey", "p_brand")

  /** O1/O3 + A5 (CAP top-k): rank-per-group, keep top 3 orders by
    * price per customer (reference src/cap_rewrite.c:10-35). */
  def topKPerGroup(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy(col("o_totalprice").desc, col("o_orderkey"))
    t(spark, dir, "orders")
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select("o_custkey", "o_orderkey", "rk")
  }

  /** A2/O4 (HAR running trim): running sum ordered within partition
    * (reference src/har_rewrite.c:104-150). */
  def runningSum(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(spark, dir, "events")
      .select(col("event_id"), col("user_id"),
        round(sum("value").over(w), 2).as("running_value"))
  }

  /** G1 fixed segmenting: every N rows per user = one segment
    * (reference src/index/segmenting_method.c:12-39). */
  def segmentFixed(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    t(spark, dir, "events")
      .withColumn("rn", row_number().over(w))
      .withColumn("seg", ((col("rn") - 1) / 5).cast("int"))
      .groupBy("user_id", "seg")
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("seg_value"))
  }

  /** G2 content-defined segmenting: boundary where the row content
    * satisfies a deterministic predicate; segment id = running boundary
    * count (reference src/index/segmenting_method.c:73-114). */
  def segmentContentDefined(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(spark, dir, "events")
      .withColumn("boundary", when(col("event_id") % 7 === 0, 1).otherwise(0))
      .withColumn("seg", sum("boundary").over(w))
      .groupBy("user_id", "seg")
      .agg(count(lit(1)).as("n_events"))
  }

  /** F3 random(mod) sampling: deterministic hash-mod row sampling
    * (reference src/index/sampling_method.c:174-207) — md5-based so the
    * DuckDB oracle computes the identical sample. */
  def sampleMod(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .filter(substring(md5(col("text")), 1, 1).isin("0", "1"))
      .select("doc_id", "n_chars")

  /** F4 uniform (every n-th) sampling: one feature per 32 rows in
    * scan order within each source segment (reference
    * src/index/sampling_method.c:215-239: `count % ratio == 0`). */
  def sampleUniform(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("source").orderBy("doc_id")
    t(spark, dir, "documents")
      .withColumn("pos", row_number().over(w) - 1)
      .filter(col("pos") % 32 === 0)
      .select(col("source"), col("doc_id"), md5(col("text")).as("fp"))
  }

  /** F2 optimized-min (de-correlated min) sampling, the Extreme-Binning
    * refinement (reference src/index/sampling_method.c:80-170): per
    * segment pick the `feature_num` smallest fingerprints as ANCHORS,
    * but emit as the sampled feature the fingerprint 8 positions
    * EARLIER in scan order (first row's when fewer than 8 seen) — the
    * de-correlation that keeps near-identical segments from sampling
    * the identical minimum. feature_num = round-to-nearest(n/ratio),
    * min 1 (reference :84-93), ratio = 32. */
  def sampleOptimizedMin(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("source").orderBy("doc_id")
    val d = t(spark, dir, "documents")
      .withColumn("fp", md5(col("text")))
      .withColumn("candidate", coalesce(lag(col("fp"), 8).over(w), first(col("fp")).over(w)))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("source")))
    d.withColumn("feature_num",
        when(col("n") > 32,
          floor(col("n") / 32) + when((col("n") % 32) * 2 > 32, 1).otherwise(0))
          .otherwise(1L))
      .withColumn("rk", row_number().over(Window.partitionBy("source").orderBy("fp", "doc_id")))
      .filter(col("rk") <= col("feature_num"))
      .select(col("source"), col("candidate").as("feature"))
      .distinct()
  }

  /** 2.8 set ops: distinct + except — parts referenced by lineitems
    * minus large parts (GC's invalid-set shape, reference
    * src/cma.c:83-139). */
  def setOps(spark: SparkSession, dir: String): DataFrame = {
    val referenced = t(spark, dir, "lineitem").select(col("l_partkey").as("partkey")).distinct()
    val large = t(spark, dir, "part").filter(col("p_size") > 25).select(col("p_partkey").as("partkey"))
    referenced.except(large)
  }

  /** A4 (CBR utility quantile): exact median per group — destor's
    * adaptive rewrite threshold (reference src/cbr_rewrite.c:20-55);
    * exact percentile so the oracle can reproduce it bit-for-bit. */
  def quantile(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .groupBy("o_orderpriority")
      .agg(round(expr("percentile(o_totalprice, 0.5)"), 4).as("median_price"))

  /** A6 CFL fragmentation analog: ideal vs distinct-touched containers
    * per returnflag (reference src/restore_aware.c:45-68) with exact
    * distinct counts (the HLL version is approxDistinct below). */
  def cflStats(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        countDistinct("l_suppkey").as("distinct_supp"),
        round(sum("l_quantity") / 100.0, 2).as("ideal_units"))

  /** Time-windowed aggregation over the event stream (tumbling 1h) —
    * batch twin of the Structured Streaming query in StreamingOps. */
  def eventWindows(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("v"))

  /** W2 segment reconstruction: rebuild segment groups from IN-BAND
    * control tokens (reference src/filter_phase.c:43-65 — the filter
    * phase re-assembles segments between CHUNK_SEGMENT_START/END
    * signal chunks flowing inside the data stream, src/destor.h:180-184).
    * `tokens` carries one row per stream element — kind ∈ {seg_start,
    * chunk, seg_end} — and reconstruction is a running count of start
    * tokens: no state machine, one window, scale-free. Returns the
    * chunk rows tagged with their reconstructed seg id. */
  def reconstructSegments(tokens: DataFrame, stream: String, ord: String): DataFrame = {
    val w = Window.partitionBy(stream).orderBy(ord)
    tokens
      .withColumn("seg",
        sum(when(col("kind") === "seg_start", 1).otherwise(0)).over(w))
      .filter(col("kind") === "chunk")
  }

  /** Driver query for W2: interleave explicit start/end tokens into the
    * per-user event stream (boundaries where G2's predicate fires),
    * then reconstruct the segments FROM THE TOKENS ALONE and aggregate
    * per segment. The DuckDB oracle rebuilds the identical token stream
    * and reconstruction in SQL, so the round trip hash-matches. */
  def segmentReconstruct(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    // every event emits its own token candidates in ONE pass (a union
    // spelling re-derived the scan+window subtree once per branch —
    // three exchanges of the same table); the explode keeps the
    // user_id partitioning, so the reconstruction window and the final
    // agg re-sort WITHOUT further exchanges: one shuffle end-to-end
    val ev = t(spark, dir, "events")
      .withColumn("rn", row_number().over(w))
      .withColumn("mx", max(col("rn")).over(Window.partitionBy("user_id")))
      .withColumn("is_b", col("rn") === 1 || col("event_id") % 7 === 0)
    val tokens = ev
      .select(col("user_id"), explode(array(
        struct((col("rn") * 10 - 1).as("ord"), lit("seg_end").as("kind"),
          lit(0.0).as("value"), (col("is_b") && col("rn") > 1).as("keep")),
        struct((col("rn") * 10).as("ord"), lit("seg_start").as("kind"),
          lit(0.0).as("value"), col("is_b").as("keep")),
        struct((col("rn") * 10 + 5).as("ord"), lit("chunk").as("kind"),
          col("value").as("value"), lit(true).as("keep")),
        struct((col("rn") * 10 + 9).as("ord"), lit("seg_end").as("kind"),
          lit(0.0).as("value"), (col("rn") === col("mx")).as("keep")))).as("tk"))
      .filter(col("tk.keep"))
      .select(col("user_id"), col("tk.ord").as("ord"),
        col("tk.kind").as("kind"), col("tk.value").as("value"))
    reconstructSegments(tokens, "user_id", "ord")
      .groupBy("user_id", "seg")
      .agg(count(lit(1)).as("n_chunks"), round(sum("value"), 2).as("seg_value"))
  }

  /** FIFO newest-first value lists (kv-store O6 analog, reference
    * src/index/kvstore_htable.c:49-54): per user, the event types
    * ordered newest-first. */
  def fifoLists(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .groupBy("user_id")
      .agg(expr("array_join(transform(array_sort(collect_list(struct(ts, event_id, event_type))," +
        " (a, b) -> case when a.ts > b.ts then -1 when a.ts < b.ts then 1" +
        " when a.event_id > b.event_id then -1 when a.event_id < b.event_id then 1 else 0 end)," +
        " s -> s.event_type), ',')").as("types_newest_first"))
}
