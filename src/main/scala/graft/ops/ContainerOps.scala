package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Container packing + restore-locality accounting — the CFL family
  * (reference: container store src/storage/containerstore.c, CFL monitor
  * `restore_aware_update` src/restore_aware.c:45-68, CFL selective
  * rewrite src/cfl_rewrite.c:19-93, global switch
  * src/filter_phase.c:105-117; thresholds destor.config:127-130).
  *
  * Packing recast: destor's single writer appends chunks to 4 MB
  * containers in arrival order. A distributed store necessarily shards
  * writers, so packing here is per-SHARD byte-bounded runs (shard =
  * source table partition / ingest batch), each shard packed in key
  * order by a running byte offset — one window aggregation PER SHARD
  * (`Window.partitionBy(shard)`), never a global single-partition sort.
  * A container id is (shard, ordinal): breaks at shard boundaries waste
  * at most one partial container per shard — at 4 MB x O(1000) shards
  * that is <4 GB of slack against a 100 TB store.
  *
  * CFL accounting: a restore job reads, for each restored row, the
  * container holding its content representative. Fragmentation shows up
  * as many containers each contributing few referenced bytes:
  *   utilization(container) = referenced distinct content bytes / C
  *   CFL = min(1, ideal containers / containers actually read),
  *     ideal = ceil(logical restore volume / C)  (A6, restore_aware.c)
  * R2 (selective rewrite): dup rows referencing containers whose
  * utilization is under `cflUsageThreshold` are marked for rewrite
  * (store the bytes again near the new data rather than chase a cold
  * container). R7 (switch): if the job's CFL is already >= `cflRequire`
  * the rewrite pass is skipped entirely.
  */
object ContainerOps {

  /** Pack rows into byte-bounded containers per shard: adds
    * `container_id` = shard || '#' || floor(runningOffset / containerBytes),
    * where the running offset orders by `orderCol` within the shard.
    * Equivalent ANSI SQL (the DuckDB oracle twin uses exactly this):
    * cumulative `sum(size) OVER (PARTITION BY shard ORDER BY ord)`. */
  def pack(rows: DataFrame, shard: Column, order: Column, size: Column,
      containerBytes: Long): DataFrame = {
    val w = Window.partitionBy(shard).orderBy(order)
    rows.withColumn("container_id",
      concat(shard, lit("#"),
        floor((sum(size).over(w) - size) / containerBytes).cast("string")))
  }

  /** Per-container utilization of one restore job: the fraction of the
    * container the job's DISTINCT referenced contents occupy. `refs`
    * must carry (content_id, container_id, content_bytes) one row per
    * restored item (duplicate references to one content count once —
    * the container block is read once). */
  def containerUtilization(refs: DataFrame, containerBytes: Long): DataFrame =
    refs.select("content_id", "container_id", "content_bytes").distinct()
      .groupBy("container_id")
      .agg((sum("content_bytes") / containerBytes.toDouble).as("utilization"))

  /** One-row CFL report for a restore job (A6): logical volume, ideal
    * and actual container reads, cfl = min(1, ideal/actual). */
  def cflReport(refs: DataFrame, containerBytes: Long): DataFrame =
    refs.agg(
        sum("content_bytes").as("logical_bytes"),
        countDistinct("container_id").as("containers_read"))
      .select(col("logical_bytes"), col("containers_read"),
        ceil(col("logical_bytes") / containerBytes.toDouble).as("ideal_containers"))
      .withColumn("cfl",
        least(lit(1.0), col("ideal_containers") / col("containers_read")))

  /** HAR sparse-container selection with running-ratio trim (A2 + O4,
    * reference `close_har` src/har_rewrite.c:87-168): containers whose
    * stored bytes fall below `utilThreshold` of capacity are sparse;
    * destor sorts them ascending by size and trims LARGEST-first until
    * the surviving sparse volume is within `rewriteLimit` of the total
    * container volume. Trimming the tail of an ascending sequence is
    * exactly keeping the maximal ascending prefix whose running sum
    * stays within the budget, so the recast is one running-sum window +
    * filter (the O4 running-ratio trim). Ties broken by container_id so
    * both engines (Spark and the DuckDB oracle) order identically.
    *
    * Scale note: the window is a global ordering, but its input is
    * already per-container METADATA (one row per sparse container —
    * destor's bv.sparse control file, ~25M rows per 100 TB at 4 MiB
    * containers and only the sparse subset enters the sort), not a
    * data-scale relation; the data-scale work (utilization aggregation)
    * happened in the upstream groupBy. */
  def harSparseTrim(containers: DataFrame, capacityBytes: Long,
      utilThreshold: Double, rewriteLimit: Double): DataFrame = {
    val total = containers.agg(sum("size").cast("double").as("total_size"))
    val sparse = containers
      .filter(col("size").cast("double") / capacityBytes < utilThreshold)
    val w = Window.orderBy(col("size"), col("container_id"))
    sparse.withColumn("cum", sum("size").over(w))
      .crossJoin(broadcast(total))
      .filter(col("cum").cast("double") <= lit(rewriteLimit) * col("total_size"))
      .select("container_id", "size")
  }

  /** CFL selective rewrite (R2 + R7): flag each restored row whose
    * container is out-of-order (utilization < cflUsageThreshold) AND
    * that is a dup (row id != content id — first occurrences are the
    * stored copy itself, never rewritten, cfl_rewrite.c:49). The whole
    * pass is disabled when the job's CFL is healthy (>= cflRequire) —
    * the R7 switch (filter_phase.c:105-117). Returns `refs` plus
    * (utilization, out_of_order, rewrite). */
  def selectiveRewrite(refs: DataFrame, idCol: String, containerBytes: Long,
      cflUsageThreshold: Double, cflRequire: Double): DataFrame = {
    val util = containerUtilization(refs, containerBytes)
    val cfl = cflReport(refs, containerBytes).select("cfl").first().getDouble(0)
    val enabled = cfl < cflRequire
    refs.join(util, "container_id")
      .withColumn("out_of_order",
        lit(enabled) && col("utilization") < cflUsageThreshold)
      .withColumn("rewrite", col("out_of_order") && col(idCol) =!= col("content_id"))
  }
}
