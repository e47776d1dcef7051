package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Destor text-trace replay source + writer (S2, reference
  * `make_trace` src/trace_phase.c:96-141 and `read_trace_thread`
  * src/trace_phase.c:146-210). The trace grammar, per stream file:
  *
  * {{{
  * file start <namelen>
  * <filename>
  * <40-hex-fingerprint> <size>      (one line per chunk)
  * ...
  * file end
  * ...                               (more files)
  * stream end
  * }}}
  *
  * Spark recast: a trace stream is stateful line-by-line (file headers
  * scope the chunk lines that follow), so each stream is parsed
  * LINEARLY by one task — `wholetext` read, one row per stream file —
  * while streams parallelize across files, exactly destor's
  * one-reader-thread-per-job model scaled out. Trace streams are
  * chunk METADATA (~50 bytes/chunk — a 100 TB corpus at 4 KiB chunks
  * is ~1.2 TB of trace spread over many per-job files), so
  * one-task-per-stream is the right granularity; the parsed output is
  * a distributed table from the first shuffle on.
  */
object TraceSource {

  /** Parse every trace file matching `path` (glob ok) into one row per
    * chunk: (trace_name, file_name, seq, fp, size). `trace_name` is the
    * stream file's basename without ".trace"; `seq` is the chunk's
    * position in its stream (replay order, destor's queue order). */
  def read(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.option("wholetext", "true").text(path)
      .select(input_file_name().as("f"), col("value"))
      .as[(String, String)]
      .flatMap { case (f, content) =>
        val base = f.substring(f.lastIndexOf('/') + 1)
          .stripSuffix(".trace")
        parseStream(base, content)
      }
      .toDF("trace_name", "file_name", "seq", "fp", "size")
  }

  /** One stream's stateful parse (read_trace_thread's loop, minus the
    * SyncQueue): emits (trace, file, seq, fp, size) per chunk line. */
  private[graft] def parseStream(trace: String, content: String)
      : Iterator[(String, String, Long, String, Long)] = {
    var cur: String = null
    var seq = 0L
    content.linesIterator.flatMap { line =>
      if (line.startsWith("file start ")) Iterator.empty
      else if (line == "file end" || line == "stream end" || line.isEmpty) {
        if (line == "file end") cur = null
        Iterator.empty
      } else if (cur == null) { cur = line; Iterator.empty } // the filename line
      else {
        val sp = line.indexOf(' ')
        seq += 1
        Iterator.single((trace, cur, seq, line.substring(0, sp),
          line.substring(sp + 1).trim.toLong))
      }
    }
  }

  /** Write one trace stream per `source`: every doc becomes a trace
    * "file" with a single whole-item chunk (file-level chunking P7),
    * fp = sha1(text), in doc_id order — `make_trace`'s output re-done
    * as a distributed writer (each source is contiguous in exactly one
    * partition after the repartition, so each stream file has exactly
    * one writer task; on a cluster `outDir` would be a shared FS). */
  def makeTrace(docs: DataFrame, outDir: String): Unit = {
    new java.io.File(outDir).mkdirs()
    docs.select(col("source"), col("doc_id"),
        sha1(col("text").cast("binary")).as("fp"), col("n_chars"))
      .repartition(col("source"))
      .sortWithinPartitions("source", "doc_id")
      .foreachPartition { (it: Iterator[Row]) =>
        var cur: String = null
        var w: java.io.PrintWriter = null
        def close(): Unit = if (w != null) { w.print("stream end"); w.close(); w = null }
        it.foreach { r =>
          val src = r.getString(0)
          if (src != cur) {
            close(); cur = src
            w = new java.io.PrintWriter(new java.io.BufferedWriter(
              new java.io.FileWriter(new java.io.File(outDir, s"$src.trace"))))
          }
          val name = "doc_" + r.getLong(1)
          w.println(s"file start ${name.length}")
          w.println(name)
          w.println(s"${r.getString(2)} ${r.getLong(3)}")
          w.println("file end")
        }
        close()
      }
  }

  /** Driver query: round-trip the documents table through the trace
    * format (write streams → replay → per-stream dedup stats). The
    * stats are hash-oracle-able in DuckDB directly from `documents`
    * (distinct fp == distinct text — SHA-1 is collision-free here), so
    * this checks the writer AND parser end-to-end. */
  def traceReplay(spark: SparkSession, dir: String): DataFrame =
    replayDf(spark, dir)
      .groupBy(col("trace_name").as("source"))
      .agg(count(lit(1)).as("n_chunks"),
        countDistinct("fp").as("n_unique"),
        sum("size").as("total_bytes"))

  /** Planted cross-stream duplicates for [[traceBackup]]: every doc
    * with `doc_id % PlantModulus == 0` is replayed a SECOND time into
    * the alphabetically-next source's stream (cyclically), ordered
    * after that stream's native docs via the doc_id offset — the
    * whole-item analog of a file copied between backup streams. Without
    * this the text-grammar corpus is dup-degenerate (whole-item sha1
    * fps almost never repeat across streams), and a backup query whose
    * dedup branch cannot fire is a weak oracle. Both the engine and the
    * DuckDB oracle derive the SAME planted set from `documents`. */
  private[graft] val PlantModulus = 7L
  private[graft] val PlantOffset = 1L << 40

  private def plantCrossStreamDups(docs: DataFrame, sources: Seq[String]): DataFrame = {
    val nextOf = map(sources.zipWithIndex.flatMap { case (s, i) =>
      Seq(lit(s), lit(sources((i + 1) % sources.length)))
    }: _*)
    val planted = docs.filter(col("doc_id") % PlantModulus === 0)
      .withColumn("source", element_at(nextOf, col("source")))
      .withColumn("doc_id", col("doc_id") + lit(PlantOffset))
    docs.unionByName(planted)
  }

  /** Write the corpus's trace streams and parse them back: the shared
    * round-trip front half of [[traceReplay]] and [[traceBackup]].
    * `plantDups` adds the cross-stream duplicate items (backup query
    * only — the replay round trip stays a faithful corpus image). */
  private[graft] def replayDf(spark: SparkSession, dir: String,
      plantDups: Boolean = false): DataFrame = {
    val tmp = StreamFiles.scratchDir(
      if (plantDups) "graft-trace-planted" else "graft-trace", dir)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    // expected stream files, known up front (one per source; planting
    // permutes sources but never adds one); the write-check-retry
    // scaffold (StreamFiles) guards the plan-time glob below against a
    // silently-incomplete write (observed once as a transient
    // empty-glob FileNotFound in a LATER job)
    val sources = docs.select("source").distinct()
      .collect().map(_.getString(0)).sorted.toSeq
    val expected = sources.map(_ + ".trace")
    val replayed = if (plantDups) plantCrossStreamDups(docs, sources) else docs
    StreamFiles.writeChecked(tmp, expected, "traceReplay") {
      makeTrace(replayed, tmp.getPath)
    }
    read(spark, tmp.getPath + "/*.trace")
  }

  /** destor's primary benchmark workflow — a BACKUP JOB DRIVEN FROM A
    * TRACE (simulation mode: `destor <trace> -p"simulation-level all"`,
    * reference src/trace_phase.c:146-207 feeding the same dedup
    * pipeline as real reads, src/do_backup.c): no data moves, the
    * fingerprint stream alone drives the exact-dedup decision, and the
    * job reports destor's backup counters per stream. First-occurrence
    * is GLOBAL across the job in trace order (one shared index, as in
    * the reference), which is one row_number window over fp — the same
    * single data-scale shuffle a real backup pays for its index probe.
    * The trace corpus carries PLANTED cross-stream duplicate items
    * (see [[plantCrossStreamDups]]) so the dedup branch is live in the
    * hash-matched counters, not just proven by spec. Oracled: fps are
    * sha1(text) and the planted set is a deterministic function of
    * `documents`, so DuckDB reproduces the counters exactly. */
  def traceBackup(spark: SparkSession, dir: String): DataFrame = {
    val cs = TraceJobs.backupCounters
    TraceJobs.flagFirst(replayDf(spark, dir, plantDups = true),
        col("trace_name"), col("seq"))
      .groupBy(col("trace_name").as("source"))
      .agg(cs.head, cs.tail: _*)
  }
}
