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
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
