package graft

import graft.multimodal.BinaryPipeline
import graft.signatures.Codec
import graft.streaming.StreamingOps
import graft.synth.CorpusGen
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MultimodalStreamingSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.core.Sessions.local(4, 8, "mm-spec")

  test("feature extraction: phash matches the stored phash column; stats sane") {
    import spark.implicits._
    val corpus = CorpusGen.generate(spark, 5).toDF()
    val feats = BinaryPipeline.extractFeatures(corpus)
    val joined = feats.toDF().withColumnRenamed("media_id", "image_id")
      .join(corpus.select(col("image_id"), col("phash").as("want")), "image_id")
    val rows = joined.collect()
    assert(rows.length == 40)
    rows.foreach { r =>
      assert(r.getAs[Long]("phash") == r.getAs[Long]("want"), s"phash mismatch for ${r.getAs[String]("image_id")}")
      val m = r.getAs[Double]("mean_r")
      assert(m >= 0 && m <= 255)
      assert(r.getAs[Double]("std_lum") >= 0)
    }
  }

  test("stub codec: unknown fmt decodes deterministically (plumbing testable without real libs)") {
    val bytes = Array[Byte](1, 2, 3, 4)
    val a = BinaryPipeline.codecFor("jpeg").decode(bytes, "jpeg", 8, 8)
    val b = BinaryPipeline.codecFor("jpeg").decode(bytes.clone(), "jpeg", 8, 8)
    assert(a.rgb.toSeq == b.rgb.toSeq)
    assert(a.rgb.length == 8 * 8 * 3)
  }

  test("resize: target dims + identity at same size") {
    import spark.implicits._
    val corpus = CorpusGen.generate(spark, 2).toDF()
    val small = BinaryPipeline.resize(corpus, 8, 8).collect()
    small.foreach { r =>
      assert(r.getAs[Int]("w") == 8 && r.getAs[Int]("h") == 8)
      assert(Codec.decode(r.getAs[Array[Byte]]("bytes"), "ppm").length == 8 * 8 * 3)
    }
    // same-size resize of a ppm row reproduces the pixels exactly
    val row = corpus.filter(col("fmt") === "ppm").limit(1).collect()(0)
    val same = BinaryPipeline.resize(corpus.filter(col("image_id") === row.getAs[String]("image_id")),
      row.getAs[Int]("w"), row.getAs[Int]("h")).collect()(0)
    assert(Codec.decode(same.getAs[Array[Byte]]("bytes"), "ppm").toSeq ==
      Codec.decode(row.getAs[Array[Byte]]("bytes"), "ppm").toSeq)
  }

  test("frame sampling: stride over concatenated frames") {
    import spark.implicits._
    val w = 4; val h = 4
    val frames = (0 until 6).map { i =>
      Codec.encodePpm(w, h, Array.fill(w * h * 3)(i.toByte))
    }
    val blob = frames.reduce(_ ++ _)
    val df = Seq(("vid0", blob)).toDF("image_id", "bytes")
    val out = BinaryPipeline.sampleFrames(df, w, h, 2).collect()
    assert(out.map(_.getAs[Int]("frame_idx")).toSeq.sorted == Seq(0, 2, 4))
    out.foreach { r =>
      val idx = r.getAs[Int]("frame_idx")
      assert(r.getAs[Array[Byte]]("bytes").toSeq == frames(idx).toSeq)
    }
  }

  test("streaming window counts == batch eventWindows") {
    val dir = "/root/testdata/sf0.001"
    // the streaming file source needs a DIRECTORY of part files
    val src = java.nio.file.Files.createTempDirectory("stream-win").toString
    spark.read.parquet(s"$dir/events.parquet").write.mode("append").parquet(src)
    val streamed = StreamingOps.windowCounts(StreamingOps.readEvents(spark, src))
    val got = StreamingOps.runToCompletion(spark, streamed, "win_counts", "complete")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3))).sortBy(_.toString)
    val want = graft.ops.RelationalOps.eventWindows(spark, dir)
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3))).sortBy(_.toString)
    assert(got.toSeq == want.toSeq)
  }

  test("streaming dedup drops re-delivered events within the watermark") {
    import spark.implicits._
    val src = java.nio.file.Files.createTempDirectory("stream-dup").toString
    val events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    events.write.mode("append").parquet(src)
    events.write.mode("append").parquet(src) // full duplicate delivery
    assert(spark.read.parquet(src).count() == 2 * events.count())
    val deduped = StreamingOps.runToCompletion(spark,
      StreamingOps.streamingDedup(StreamingOps.readEvents(spark, src)), "dedup_out")
    assert(deduped.count() == events.count())
  }
}
