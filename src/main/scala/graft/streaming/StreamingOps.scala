package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured Streaming operators over the `events` stream schema.
  *
  * The reference has no event-time semantics (SURVEY.md §1.3 — its
  * queues are intra-job plumbing), so these are the graft's
  * forward-looking streaming surface: the same dedup/windowing
  * semantics expressed incrementally. Batch twins live in
  * RelationalOps (eventWindows) and TextOps (exactDedup), and the
  * specs assert batch/stream agreement on the same input.
  */
object StreamingOps {

  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  def readEvents(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(eventsSchema)
      .parquet(s"$dir") // directory of parquet part files

  /** Tumbling 1-hour window counts per event_type with a 2-hour
    * watermark — the streaming twin of RelationalOps.eventWindows. */
  def windowCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("win"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("v"))
      .select(col("win.start").as("hour"), col("event_type"), col("n"), col("v"))

  /** Streaming exact-dedup on event_id within the watermark horizon —
    * destor's fingerprint-index probe as incremental state
    * (reference: src/index/index.c:140-217; the watermark bounds state
    * like destor's in-flight index buffer bounds memory,
    * src/index/index.c:234-258). */
  def streamingDedup(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .dropDuplicatesWithinWatermark("event_id")

  /** Run a streaming query over a static parquet dir to completion
    * and return the result table (memory sink) — the harness for
    * batch/stream agreement tests. */
  def runToCompletion(spark: SparkSession, streamed: DataFrame, name: String,
      mode: String = "append"): DataFrame = {
    val q = streamed.writeStream
      .format("memory").queryName(name).outputMode(mode)
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table(name)
  }
}
