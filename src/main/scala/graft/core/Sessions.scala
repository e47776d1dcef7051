package graft.core

import org.apache.spark.sql.SparkSession

/** One place to build correctly-configured local sessions.
  *
  * `spark.sql.artifact.isolation.enabled=false` matters: Spark 4's
  * per-session artifact isolation gives executors an RPC-backed
  * classloader; in a forked single-JVM local run every codegen class
  * miss becomes a driver RPC and the executor can livelock on the
  * class-fetch channel (observed: heartbeat timeouts + tasks blocked on
  * ExecutorClassLoader). All our classes are on the plain classpath, so
  * isolation buys nothing here. On a real cluster (spark-submit with
  * --jars) the default is equally unnecessary.
  */
object Sessions {
  def local(cores: Int, shufflePartitions: Int, appName: String = "graft"): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.artifact.isolation.enabled", "false")
      // the bypass-merge shuffle writer creates one file per reduce
      // partition and merges them with NIO transferTo; on this kernel
      // the mmap/unmap churn serializes at high thread counts (observed:
      // 32-thread runs 3-10x slower than 8-thread on identical input,
      // all tasks RUNNABLE in FileChannelImpl.unmap). Use the sort
      // writer + stream copy instead.
      .config("spark.shuffle.sort.bypassMergeThreshold", "8")
      .config("spark.file.transferTo", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
