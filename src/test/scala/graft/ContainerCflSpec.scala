package graft

import graft.core.DedupConfig
import graft.ops.ContainerOps
import graft.signatures.Sig
import graft.text.TextOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** CFL restore-locality family (R2/R7/W3) + the MinHash merge UDAF
  * (U2): local reference computations against the Spark operators. */
class ContainerCflSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.core.Sessions.local(4, 8, "container-spec")
  val dir = "/root/testdata/sf0.001"
  val cfg = DedupConfig.default

  test("pack: per-shard byte-bounded containers match a local scan") {
    import spark.implicits._
    val rows = Seq(
      ("a", 1L, 100L), ("a", 2L, 900L), ("a", 3L, 600L), ("a", 4L, 50L),
      ("b", 10L, 1500L), ("b", 11L, 10L)).toDF("shard", "id", "sz")
    val got = ContainerOps.pack(rows, col("shard"), col("id"), col("sz"), 1000L)
      .select("shard", "id", "container_id").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getString(2)).toMap
    // local reference: running offset per shard, container = offset / C
    val want = Seq(("a", 1L, 100L), ("a", 2L, 900L), ("a", 3L, 600L), ("a", 4L, 50L),
      ("b", 10L, 1500L), ("b", 11L, 10L))
      .groupBy(_._1).flatMap { case (s, rs) =>
        var off = 0L
        rs.sortBy(_._2).map { case (_, id, sz) =>
          val c = off / 1000L; off += sz; (s, id) -> s"$s#$c"
        }
      }.toMap
    assert(got === want)
  }

  test("har sparse trim: threshold filter + ascending running-ratio trim match a local greedy") {
    import spark.implicits._
    // capacity 1000; utilization threshold 0.5 -> sparse iff size < 500;
    // limit 0.10 of total volume. Local reference implements destor's
    // actual loop (sort asc, remove LARGEST while over budget) — the
    // Spark side is the prefix formulation; the test proves equivalence.
    val sizes = Seq(950L, 120L, 480L, 60L, 700L, 450L, 30L, 499L, 500L, 10L)
    val containers = sizes.zipWithIndex
      .map { case (sz, i) => (f"c$i%02d", sz) }.toDF("container_id", "size")
    val got = ContainerOps.harSparseTrim(containers, 1000L, 0.5, 0.10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val total = sizes.sum
    var sparse = sizes.zipWithIndex.map { case (sz, i) => (f"c$i%02d", sz) }
      .filter(_._2 < 500L).sortBy(t => (t._2, t._1))
    while (sparse.map(_._2).sum.toDouble > 0.10 * total)
      sparse = sparse.init // destor: trim the largest remaining
    assert(got === sparse.toSet)
    assert(got.nonEmpty && got.size < sizes.count(_ < 500L)) // trim actually ran
  }

  test("selective rewrite: cold containers flagged, reps exempt, R7 switch disables") {
    import spark.implicits._
    // 10 contents of 100B, each alone in a 1000B container (util 0.1 if
    // referenced). Restore job: contents 0 and 1 referenced, content 0
    // by its own rep row plus 4 dups, content 1 by one dup.
    val store = (0L until 10L).map(i => (i.toString, s"s#$i", 100L))
      .toDF("content_id", "container_id", "content_bytes")
    val refs = (Seq(("0", "0")) ++ Seq.tabulate(4)(i => (s"dup$i", "0")) ++ Seq(("dup4", "1")))
      .toDF("image_id", "content_id")
      .join(store, "content_id")
    // CFL = ceil(600/1000)/2 = 0.5 < require 0.6 -> rewriting enabled;
    // both containers utilized 0.1 < 0.5 -> out-of-order; every dup row
    // rewritten, the rep row (image_id == content_id) exempt
    val out = ContainerOps.selectiveRewrite(refs, "image_id", 1000L, 0.5, 0.6)
      .select("image_id", "out_of_order", "rewrite").collect()
      .map(r => r.getString(0) -> (r.getBoolean(1), r.getBoolean(2))).toMap
    assert(out.values.forall(_._1), "all touched containers are cold")
    assert(out("0") === ((true, false)), "rep row exempt from rewrite")
    assert(Seq("dup0", "dup1", "dup2", "dup3", "dup4").forall(out(_)._2))
    // R7 switch: cflRequire 0.0 makes any CFL healthy -> pass disabled
    val healthy = ContainerOps.selectiveRewrite(refs, "image_id", 1000L, 0.5, 0.0)
    assert(healthy.filter(col("rewrite") || col("out_of_order")).count() === 0L)
  }

  test("cfl report: ideal/actual on a planted fragmented job") {
    import spark.implicits._
    // 4 contents of 250B in 4 distinct containers, C=1000:
    // logical = 1000, ideal = 1, actual = 4 -> cfl 0.25
    val refs = (0L until 4L).map(i => (s"r$i", i, s"s#$i", 250L))
      .toDF("image_id", "content_id", "container_id", "content_bytes")
    val rep = ContainerOps.cflReport(refs, 1000L).collect()(0)
    assert(rep.getAs[Long]("ideal_containers") === 1L)
    assert(rep.getAs[Long]("containers_read") === 4L)
    assert(rep.getAs[Double]("cfl") === 0.25)
  }

  test("cflRewrite query: deterministic, rewrite implies out-of-order implies dup") {
    val a = TextOps.cflRewrite(spark, dir).collect().sortBy(_.getLong(0))
    val b = TextOps.cflRewrite(spark, dir).collect().sortBy(_.getLong(0))
    assert(a.map(_.toString).mkString === b.map(_.toString).mkString)
    assert(a.nonEmpty)
    a.foreach { r =>
      val (ooo, rw) = (r.getAs[Int]("ooo"), r.getAs[Int]("rewrite"))
      if (rw == 1) assert(ooo == 1)
      if (rw == 1) assert(r.getLong(0) != r.getLong(1)) // dup rows only
    }
  }

  test("minhash merge UDAF == signature of the concatenated text (union property)") {
    import spark.implicits._
    val texts = Seq(
      (1L, "g1", "the quick brown fox jumps over the lazy dog"),
      (2L, "g1", "pack my box with five dozen liquor jugs"),
      (3L, "g1", "how vexingly quick daft zebras jump"),
      (4L, "g2", "sphinx of black quartz judge my vow"),
      (5L, "g2", "the five boxing wizards jump quickly"))
    val sigUdf = udf((t: String) => Sig.minhash(Sig.shingleHashes(t, cfg.shingleSize), cfg))
    val merged = texts.toDF("id", "g", "text")
      .select(col("g"), sigUdf(col("text")).as("sig"))
      .groupBy("g")
      .agg(graft.signatures.MinHashMerge.column(cfg.minhashK, col("sig")).as("sig"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toArray).toMap
    for ((g, members) <- texts.groupBy(_._2)) {
      val unionShingles = members.sortBy(_._1).flatMap(m => Sig.shingleHashes(m._3, cfg.shingleSize)).toArray
      val want = Sig.minhash(unionShingles, cfg)
      assert(merged(g).sameElements(want), s"group $g")
    }
  }

  test("source minhash query: one row per source, K-long signatures") {
    val rows = TextOps.sourceMinhash(spark, dir, cfg).collect()
    val nSources = spark.read.parquet(s"$dir/documents.parquet")
      .select("source").distinct().count()
    assert(rows.length.toLong === nSources)
    rows.foreach(r => assert(r.getSeq[Long](2).length === cfg.minhashK))
  }
}
