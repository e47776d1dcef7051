package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The trace-driven backup decision, shared by every consumer
  * (TraceSource.traceBackup, FslSource.fslBackup, Cli simulate): a
  * GLOBAL first-occurrence flag over the fingerprint stream in trace
  * order — destor's one shared index (J1) — plus the job's counter
  * aggregates. One definition, so the CLI and the driver queries it
  * mirrors cannot drift. */
private[graft] object TraceJobs {

  /** Tag each chunk ref with `is_first` = this is the fingerprint's
    * first occurrence across the whole job, ordered by `ord`. */
  def flagFirst(refs: DataFrame, ord: Column*): DataFrame =
    refs.withColumn("is_first",
      row_number().over(Window.partitionBy("fp").orderBy(ord: _*)) === 1)

  /** destor's backup counters over a flagged ref stream. Coalesced to
    * zero so a global aggregation over an EMPTY trace set reports
    * zeros instead of nulls (grouped aggregations never see the
    * difference — groups are non-empty by construction). */
  def backupCounters: Seq[Column] = Seq(
    count(lit(1)).as("n_chunks"),
    coalesce(sum(col("size")), lit(0L)).as("total_bytes"),
    coalesce(sum(when(col("is_first"), col("size")).otherwise(0L)), lit(0L))
      .as("stored_bytes"),
    coalesce(sum(when(col("is_first"), 1L).otherwise(0L)), lit(0L))
      .as("n_stored"))
}
