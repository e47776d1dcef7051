package graft

import graft.core.DedupConfig
import graft.pipeline.{DedupPipeline, IncrementalDedup}
import graft.streaming.StreamingOps
import graft.synth.CorpusGen
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Structured-Streaming ingest: micro-batches flow through the SAME
  * IncrementalDedup path as batch ingests, so a streamed corpus ends in
  * the same store state / clusters as a one-shot run. */
class StreamingIngestSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.core.Sessions.local(4, 8, "stream-ingest-spec")
  val cfg = DedupConfig.default

  test("two micro-batches == one-shot clusters over the union") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-singest").toString
    val corpus = CorpusGen.generate(spark, 8).cache()
    val rows = corpus.collect().toSeq
    val (a, b) = rows.partition(r => r.image_id.drop(3).toLong % 2 == 0)

    val oneShot = DedupPipeline.run(corpus, cfg)
      .collect().map(r => (r.image_id, r.cluster_id)).sorted.toSeq

    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[graft.core.ImageRow]
    val q = StreamingOps.streamingIngest(ms.toDS(), dir, "s", cfg).start()
    ms.addData(a)
    q.processAllAvailable()
    ms.addData(b)
    q.processAllAvailable()
    q.stop()

    val inc = new IncrementalDedup(spark, dir, cfg)
    assert(inc.ingested == Seq("s-0", "s-1"))
    val got = inc.clusters.select("image_id", "cluster_id")
      .collect().map(r => (r.getString(0), r.getString(1))).sorted.toSeq
    assert(got == oneShot)
    corpus.unpersist()
  }
}
