package graft

import graft.ops.SweepOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Sweep-harness golden + invariants (destor's benchmark workflow,
  * scripts/benchmark.sh + edpl.sh + ndll.sh): the committed artifact
  * pins BOTH log tables — every backup.log row per (index config, job)
  * and every restore.log row per (job, cache policy, size) — over the
  * deterministic sf0.001 corpus, so any drift in chunking, dedup
  * decisions, segment/champion selection, container packing, or the
  * cache sims shows up as a line diff. Regenerate with GRAFT_REGOLD=1
  * (review the diff — the spec fails once so the change is a conscious
  * commit, same protocol as GoldenSpec). */
class SweepSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.core.Sessions.local(8, 32, "sweep-spec")
  private val dir = "/root/testdata/sf0.001"

  private val goldenPath =
    java.nio.file.Paths.get("src/test/resources/golden-sweep.txt")

  private lazy val backup = SweepOps.backupLog(spark, dir).persist()
  private lazy val restore = SweepOps.restoreLog(spark, dir).persist()

  test("sweep tables match the committed golden") {
    val got = ("# backup.log" +: SweepOps.formatBackupLog(backup)) ++
      ("# restore.log" +: SweepOps.formatRestoreLog(restore))
    if (sys.env.get("GRAFT_REGOLD").contains("1")) {
      java.nio.file.Files.createDirectories(goldenPath.getParent)
      java.nio.file.Files.writeString(goldenPath, got.mkString("", "\n", "\n"))
      fail(s"golden file regenerated at $goldenPath — review the diff and commit")
    }
    assert(java.nio.file.Files.exists(goldenPath),
      s"missing $goldenPath — run once with GRAFT_REGOLD=1 to create it")
    val want = java.nio.file.Files.readString(goldenPath).linesIterator.toSeq
    assert(got.length == want.length,
      s"row count drifted: got ${got.length}, golden ${want.length}")
    val diffs = got.zip(want).zipWithIndex.collect {
      case ((g, w), i) if g != w => s"line ${i + 1}: got [$g] golden [$w]"
    }
    assert(diffs.isEmpty, s"${diffs.length} drifted lines:\n${diffs.take(5).mkString("\n")}")
  }

  test("exact physical index dedups at least as much as every near-exact config") {
    val byConfig = backup.groupBy("config")
      .agg(sum("stored_bytes").as("stored")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = byConfig("exact")
    for ((c, stored) <- byConfig if c != "exact")
      assert(stored >= exact, s"$c stored $stored < exact $exact — " +
        "a sampled/logical index cannot find MORE duplicates than the full index")
  }

  test("sparse sampling ratio trades index size against dedup") {
    def row(c: String) = backup.filter(col("config") === c)
      .agg(sum("stored_bytes"), max("index_entries")).head()
    for (m <- Seq("random", "min", "uniform")) {
      val lo = row(s"sparse:$m:32"); val hi = row(s"sparse:$m:128")
      assert(lo.getLong(1) >= hi.getLong(1),
        s"$m: ratio 32 must index at least as many features as 128")
      assert(lo.getLong(0) <= hi.getLong(0),
        s"$m: more features (ratio 32) must never dedup LESS than ratio 128")
    }
  }

  test("every config stores every byte exactly once across the job chain") {
    // cum_stored at the last job == sum of per-job stored; data volume
    // identical across configs (same chunk scan)
    val rows = backup.groupBy("config").agg(
      sum("data_bytes").as("data"), sum("stored_bytes").as("stored"),
      max("cum_stored_bytes").as("cum")).collect()
    val data = rows.head.getLong(1)
    rows.foreach { r =>
      assert(r.getLong(1) == data, s"${r.getString(0)}: data volume drifted")
      assert(r.getLong(3) == r.getLong(2), s"${r.getString(0)}: cumulative != sum of jobs")
    }
  }

  test("restore sweep: optimal reads fewest, LRU monotone in cache size") {
    val r = restore.collect().map(x => (x.getString(0), x.getString(1),
      x.getInt(2), x.getLong(4))).toSeq
    val bySrc = r.groupBy(_._1)
    bySrc.foreach { case (src, rows) =>
      val lru = rows.filter(_._2 == "lru").sortBy(_._3).map(_._4)
      assert(lru.sliding(2).forall(p => p.length < 2 || p(1) <= p.head),
        s"$src: LRU reads must be monotone non-increasing in cache size")
      val lru16 = rows.find(x => x._2 == "lru" && x._3 == 16).get._4
      val opt16 = rows.find(x => x._2 == "belady" && x._3 == 16).get._4
      assert(opt16 <= lru16, s"$src: Belady must not read more than LRU at equal size")
    }
  }
}
