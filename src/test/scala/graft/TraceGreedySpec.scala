package graft

import graft.ops.GreedySelect
import graft.sources.TraceSource
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** S2 trace replay source (round-trip + grammar) and O2 greedy top-k
  * with feature trimming (brute-force oracle + partition invariance). */
class TraceGreedySpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.core.Sessions.local(4, 8, "trace-greedy-spec")

  test("trace: destor grammar parses — multi-file streams, seq order, sizes") {
    val txt =
      """file start 5
        |alpha
        |aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa 4096
        |bbbbbbbbbbbbbbbbbbbbbbbbbbbbbbbbbbbbbbbb 512
        |file end
        |file start 4
        |beta
        |cccccccccccccccccccccccccccccccccccccccc 77
        |file end
        |stream end""".stripMargin
    val rows = TraceSource.parseStream("t1", txt).toList
    assert(rows === List(
      ("t1", "alpha", 1L, "a" * 40, 4096L),
      ("t1", "alpha", 2L, "b" * 40, 512L),
      ("t1", "beta", 3L, "c" * 40, 77L)))
  }

  test("trace: write → replay round-trip reproduces the documents table's chunk stream") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox", "en", "srcA", 19L),
      (2L, "jumped over", "en", "srcA", 11L),
      (3L, "the quick brown fox", "en", "srcB", 19L), // cross-stream dup
      (4L, "unique text here", "en", "srcB", 16L),
      (5L, "jumped over", "en", "srcB", 11L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val tmp = java.nio.file.Files.createTempDirectory("graft-trace-spec").toString
    TraceSource.makeTrace(docs, tmp)
    val back = TraceSource.read(spark, tmp + "/*.trace")
    val got = back.select("trace_name", "file_name", "fp", "size")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3))).toSet
    // fps must equal sha1(text); dup texts share fp across streams
    val fps = docs.select(col("doc_id"), sha1(col("text").cast("binary")))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val want = Set(
      ("srcA", "doc_1", fps(1L), 19L), ("srcA", "doc_2", fps(2L), 11L),
      ("srcB", "doc_3", fps(3L), 19L), ("srcB", "doc_4", fps(4L), 16L),
      ("srcB", "doc_5", fps(5L), 11L))
    assert(got === want)
    assert(fps(1L) === fps(3L) && fps(2L) === fps(5L))
    // replay order within a stream = doc_id order
    val seqs = back.filter(col("trace_name") === "srcB")
      .orderBy("seq").select("file_name").as[String].collect().toList
    assert(seqs === List("doc_3", "doc_4", "doc_5"))
  }

  test("trace-driven backup: global first-occurrence dedup counters per stream") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox", "en", "srcA", 19L),
      (2L, "jumped over", "en", "srcA", 11L),
      (3L, "the quick brown fox", "en", "srcB", 19L), // dup of srcA's doc 1
      (4L, "unique text here", "en", "srcB", 16L),
      (5L, "jumped over", "en", "srcB", 11L)          // dup of srcA's doc 2
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("graft-trace-backup").toString
    docs.write.parquet(s"$dir/documents.parquet")
    val got = TraceSource.traceBackup(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    // srcA stores both chunks (first occurrences); srcB stores only its
    // unique doc — the shared index spans the whole job, as in destor
    assert(got === Set(
      ("srcA", 2L, 30L, 30L, 2L),
      ("srcB", 3L, 46L, 16L, 1L)))
  }

  /** Independent local greedy (destor similarity_detection.c:100-121):
    * pick max-shared (tie: min id), trim its features from the rest. */
  private def localGreedy(members: Map[Long, Set[Long]], k: Int): List[(Int, Long, Int)] = {
    var rest = members
    var out = List.empty[(Int, Long, Int)]
    var rank = 1
    while (rank <= k && rest.nonEmpty) {
      val (cm, cf) = rest.toSeq.minBy { case (m, s) => (-s.size, m) }
      out :+= ((rank, cm, cf.size))
      rest = (rest - cm).map { case (m, s) => m -> (s -- cf) }
      rank += 1
    }
    out
  }

  test("greedy top-k: matches brute-force trim loop, complementary not redundant") {
    import spark.implicits._
    // doc 1 and 2 are near-copies (9 shared features); doc 3 is small but
    // complementary. Plain top-2-by-overlap would pick {1,2}; trimming
    // must pick {1,3}: after removing doc 1's features, doc 2 retains 1
    // feature, doc 3 retains 3.
    val m = Map(
      1L -> (1L to 10L).toSet,
      2L -> ((1L to 9L).toSet + 20L),
      3L -> Set(30L, 31L, 32L))
    val pairs = m.toSeq.flatMap { case (mm, fs) => fs.map(f => ("g", mm, f)) }
      .toDF("grp", "member", "feature")
    val got = GreedySelect.greedyTopK(pairs, 2)
      .collect().map(r => (r.getInt(1), r.getLong(2), r.getInt(3))).toList.sorted
    assert(got === localGreedy(m, 2).sorted)
    assert(got.map(_._2).toSet === Set(1L, 3L))
  }

  test("greedy top-k: randomized groups equal the local oracle at any partitioning") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val groups = (0 until 6).map { g =>
      s"g$g" -> (0 until (3 + rnd.nextInt(8))).map { m =>
        m.toLong -> (0 until (1 + rnd.nextInt(12))).map(_ => rnd.nextInt(25).toLong).toSet
      }.toMap
    }
    val pairs = groups.flatMap { case (g, ms) =>
      ms.toSeq.flatMap { case (m, fs) => fs.map(f => (g, m, f)) }
    }
    for (parts <- Seq(1, 7)) {
      val df = spark.createDataset(pairs).repartition(parts)
        .toDF("grp", "member", "feature")
      val got = GreedySelect.greedyTopK(df, 3)
        .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getInt(3)))
        .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3, t._4)).toList.sorted).toMap
      val want = groups.map { case (g, ms) => g -> localGreedy(ms, 3).sorted }.toMap
      assert(got === want)
    }
  }
}
