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

  /** Session for spark-submit runs: master, executors, memory, and
    * local dirs come from the submit command / cluster conf — only the
    * engine-required SQL preferences are set here (each is documented
    * on the local builder below; they are deployment-appropriate, not
    * sandbox workarounds). NOTE getOrCreate semantics: if a session
    * already exists, Spark applies these builder options ONTO it (and
    * the log level is set to WARN) — call from a fresh JVM (the
    * spark-submit case) to keep an interactive session untouched. */
  def submit(appName: String = "graft"): SparkSession = {
    val spark = SparkSession.builder()
      .appName(appName)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.artifact.isolation.enabled", "false")
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.cleaner.periodicGC.interval", "45s")
      .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

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
      // AQE's post-shuffle coalescing targets max(total/parallelism,
      // minPartitionSize); the 1 MiB default floor collapses every
      // few-MB intermediate shuffle to the SAME handful of partitions
      // regardless of core count, flattening 8->32 scaling on mid-size
      // stages. 64k keeps small-stage parallelism proportional to
      // cores (at cluster data sizes the floor never binds anyway).
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
      // File-scan split size: the 128 MiB default gives a ~1 GiB input
      // table only ~8 scan partitions, so the CPU-heaviest narrow stage
      // (signatures: decode+SHA+MinHash per row) cannot use more than 8
      // cores no matter the level. 16 MiB keeps scan parallelism above
      // the core count at bench scale; at cluster data sizes the file
      // count dominates and this knob stops binding.
      .config("spark.sql.files.maxPartitionBytes", "16m")
      // Dedup joins are equi-joins on high-cardinality keys whose
      // output never needs sort order: shuffled-hash beats sort-merge
      // (SMJ's interpreted row comparator showed up as the top CPU
      // frame in task sampling). AQE's skew handling covers SHJ too.
      .config("spark.sql.join.preferSortMergeJoin", "false")
      // 10 MiB is conservative for a 24 GiB+ single-JVM heap; 64 MiB
      // lets the signature side-tables broadcast at bench scale (on a
      // real cluster executors get the same heap headroom).
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      // Runtime bloom-filter join pruning (the F7 Bloom-filter recast,
      // reference src/utils/bloom_filter.c) is deliberately OFF: each
      // injected bloom build re-executes the creation-side plan, and
      // this engine's join inputs are unpersisted shuffle subtrees
      // (candidate pairs, signature projections) — measured +44% on the
      // end-to-end pipeline at 20k images. It pays off only for joins
      // whose build side is a cheap table scan (the reference's own
      // bloom filter is equally vestigial — config knob, never called).
      .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
      // Shuffle/spill scratch on tmpfs: this kernel (6.18.x) serializes
      // concurrent shuffle-file mmap/unmap + writeback on mm locks
      // (doc/shuffle-scaling-notes.md — measured 50-85% SYSTEM time
      // during the posting shuffle on /dev/vda). tmpfs takes the block
      // layer out entirely; on a real cluster the analog is pointing
      // spark.local.dir at local NVMe, standard deployment practice.
      .config("spark.local.dir",
        sys.env.getOrElse("SPARK_GRAFT_LOCAL_DIR",
          if (new java.io.File("/dev/shm").isDirectory) "/dev/shm/spark-scratch" else "/tmp"))
      // ContextCleaner is weak-reference driven: with a large fixed
      // heap that never GCs on its own, shuffle registrations/files
      // accumulate and every SUBSEQUENT shuffle degrades (measured: the
      // same 0.4 s aggregation monotonically slowed to 27 s over 12
      // back-to-back runs; a periodic GC restores it). 45 s instead of
      // the 30 min default — the standard knob for long-running
      // drivers; a multi-batch ingest driver on a real cluster needs it
      // for exactly the same reason.
      .config("spark.cleaner.periodicGC.interval", "45s")
      // reliable RDD checkpoints (CC lineage cuts under a pipeline
      // workDir) are transient state — reclaim them as their RDDs are
      // garbage-collected instead of letting workDirs grow
      .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
      // OFF-HEAP execution memory: Tungsten page allocations (shuffle
      // sorter pages, aggregation maps) on-heap go through
      // HeapMemoryAllocator — a SYNCHRONIZED weak-ref page pool plus a
      // zeroing `new long[]` per page — which serializes all executor
      // threads at high core counts (jstack during the posting shuffle:
      // every worker RUNNABLE in allocate(); shuffle-write task time
      // inflated ~4.7x from 8 to 32 threads). Off-heap pages come from
      // Platform.allocateMemory (malloc — per-thread arenas, no lock,
      // no zeroing) and stay out of the GC's live set. Standard
      // production config for shuffle-heavy workloads; executors on a
      // real cluster want the same flag.
      .config("spark.memory.offHeap.enabled", "true")
      .config("spark.memory.offHeap.size", "16g")
      // Kryo for RDD tuple shuffles/persists: only the connected-
      // components loop runs on RDDs (everything else shuffles
      // UnsafeRows through SQL serializers, unaffected), and its
      // (String,String) label tuples serialize ~4x faster under Kryo
      // than java.io serialization — the loop is the pipeline's
      // latency tail, so per-round ser cost is wall time.
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
