package graft

import graft.core.DedupConfig
import graft.pipeline.DedupPipeline
import graft.synth.CorpusGen
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Golden-file regression over the sf-tiny corpus (FIXTURES.md §5 —
  * the analog of replaying a destor trace at SIMULATION_ALL,
  * reference src/destor.h:55-59, src/trace_phase.c:146-207): the
  * committed artifact pins one sorted line per image —
  * `image_id sha[0,12) simhash phash cluster_id` — for the default
  * config over the deterministic 120-row corpus. Any change to
  * shingling, MinHash seeds, banding, phash combos, verification
  * thresholds, clustering, or the corpus generator shows up as a
  * diff here, NOT as a silent drift in recall measured against a
  * moving oracle.
  *
  * Regeneration (only after an INTENTIONAL algorithm/config change —
  * review the diff line by line): run this suite with
  * `GRAFT_REGOLD=1` in the environment; the spec rewrites
  * src/test/resources/golden-sftiny.txt and fails once so the change
  * is always a conscious commit.
  */
class GoldenSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.core.Sessions.local(4, 8, "golden-spec")

  private val goldenPath =
    java.nio.file.Paths.get("src/test/resources/golden-sftiny.txt")

  private def currentLines(): Seq[String] = {
    val cfg = DedupConfig.default
    val images = CorpusGen.generate(spark, 15)
    val sigs = DedupPipeline.signatures(images, cfg)
      .collect().map(s => s.image_id -> s).toMap
    DedupPipeline.run(images, cfg)
      .collect().sortBy(_.image_id)
      .map { c =>
        val s = sigs(c.image_id)
        s"${c.image_id} ${s.sha.substring(0, 12)} ${s.simhash} ${s.phash} ${c.cluster_id}"
      }
      .toSeq
  }

  private def checkGolden(path: java.nio.file.Path, got: Seq[String]): Unit = {
    if (sys.env.get("GRAFT_REGOLD").contains("1")) {
      java.nio.file.Files.createDirectories(path.getParent)
      java.nio.file.Files.writeString(path, got.mkString("", "\n", "\n"))
      fail(s"golden file regenerated at $path — review the diff and commit")
    }
    assert(java.nio.file.Files.exists(path),
      s"missing $path — run once with GRAFT_REGOLD=1 to create it")
    val want = java.nio.file.Files.readString(path).linesIterator.toSeq
    assert(got.length == want.length,
      s"row count drifted: got ${got.length}, golden ${want.length}")
    val diffs = got.zip(want).zipWithIndex.collect {
      case ((g, w), i) if g != w => s"line ${i + 1}: got [$g] golden [$w]"
    }
    assert(diffs.isEmpty,
      s"${diffs.length} drifted lines (first 5):\n${diffs.take(5).mkString("\n")}")
  }

  test("sf-tiny pipeline output matches the committed golden file") {
    checkGolden(goldenPath, currentLines())
  }

  /** The restore-cache sweep is rows-only at the driver (LRU/Belady/
    * assembly aren't SQL), so this pin is its cross-round regression
    * net: any drift in the chunker, the pack parameterization, or a
    * cache policy shows up as a line diff. */
  test("restore-cache policy sweep matches the committed golden file") {
    val got = graft.ops.RestoreSim.restoreCacheQuery(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => s"${r.getString(0)} ${r.getString(1)} ${r.getInt(2)} " +
        s"${r.getLong(3)} ${r.getLong(4)} ${r.getLong(5)}")
      .sorted.toSeq
    checkGolden(
      java.nio.file.Paths.get("src/test/resources/golden-restorecache.txt"), got)
  }
}
