package graft

import graft.core.DedupConfig
import graft.text.{SuffixArrays, TextOps}
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Exact oracles for the generalized-suffix-array pass: the SA and
  * LCP builders against brute-force suffix sorting, containment pairs
  * against a nested-loop `contains`, and the Spark operator against a
  * local brute force of the identical semantics (plus the guarantee
  * that exactness dominates the df-pruned winnowing path). */
class SuffixArraySpec extends AnyFunSuite {
  lazy val spark = graft.core.Sessions.local(4, 8, "sa-spec")
  val dir = "/root/testdata/sf0.001"
  val cfg = DedupConfig.default

  private def bruteSa(s: Array[Int]): Array[Int] = {
    implicit val ord: Ordering[Array[Int]] =
      (a, b) => {
        val m = math.min(a.length, b.length)
        var i = 0
        while (i < m && a(i) == b(i)) i += 1
        if (i < m) Integer.compare(a(i), b(i))
        else Integer.compare(a.length, b.length)
      }
    Array.range(0, s.length).sortBy(i => s.drop(i))
  }

  private def bruteLcp(s: Array[Int], sa: Array[Int]): Array[Int] = {
    val lcp = new Array[Int](s.length)
    for (i <- 1 until s.length) {
      val a = sa(i - 1); val b = sa(i)
      var h = 0
      while (a + h < s.length && b + h < s.length && s(a + h) == s(b + h)) h += 1
      lcp(i) = h
    }
    lcp
  }

  test("suffix array + LCP match brute force on random strings (incl. degenerate alphabets)") {
    val rnd = new Random(42)
    val cases =
      Seq(Array.emptyIntArray, Array(7), Array.fill(50)(3)) ++ // empty, single, all-equal
      (1 to 150).map { t =>
        val n = 1 + rnd.nextInt(200)
        val alpha = 1 + rnd.nextInt(if (t % 3 == 0) 2 else 26)
        Array.fill(n)(rnd.nextInt(alpha) + 1)
      }
    for (s <- cases) {
      val sa = SuffixArrays.suffixArray(s)
      assert(sa.toSeq == bruteSa(s).toSeq, s"sa mismatch on ${s.take(30).mkString(",")}")
      assert(SuffixArrays.lcpArray(s, sa).toSeq == bruteLcp(s, sa).toSeq,
        s"lcp mismatch on ${s.take(30).mkString(",")}")
    }
  }

  private def bruteContain(texts: Array[String]): Set[(Int, Int)] =
    (for {
      i <- texts.indices
      j <- texts.indices
      if i != j && texts(i) != texts(j) && texts(j).contains(texts(i))
    } yield (i, j)).toSet

  test("containment pairs match nested-loop contains on random planted corpora") {
    val rnd = new Random(7)
    for (_ <- 1 to 60) {
      val base = Array.fill(3 + rnd.nextInt(5))(
        Array.fill(5 + rnd.nextInt(40))(('a' + rnd.nextInt(3)).toChar).mkString)
      // plant substrings, duplicates, and unrelated docs
      val docs = (base ++ base.flatMap { t =>
        val cut = if (t.length > 2) t.substring(rnd.nextInt(t.length / 2), t.length / 2 + 1) else t
        Seq(cut, t) // a substring and an exact duplicate
      } ++ Array.fill(3)(Array.fill(4 + rnd.nextInt(10))(('x' + rnd.nextInt(3)).toChar).mkString))
        .filter(_.nonEmpty)
      assert(SuffixArrays.containmentPairs(docs) == bruteContain(docs),
        s"mismatch on ${docs.mkString("|")}")
    }
  }

  test("duplicate-heavy shard: distinct-text GSA expands pairs across copy groups exactly") {
    import spark.implicits._
    // 4 copies of a short text, 3 copies of a long container, 2 inert
    // docs; every (short-copy, long-copy) pair must appear, no
    // (copy, copy) pairs. Texts must clear substrMinChars (39).
    val short = "the quick brown fox jumps over the lazy dog today"
    val long = "prefix padding then " + short + " and a tail that makes it longer"
    val rows = (1L to 4L).map(i => (i, short, "en", "s1", short.length.toLong)) ++
      (11L to 13L).map(i => (i, long, "en", "s1", long.length.toLong)) ++
      Seq((21L, "a completely unrelated caption of sufficient length here", "en", "s1", 57L))
    val dir = java.nio.file.Files.createTempDirectory("sa-dup").toString
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TextOps.substrDedupSA(spark, dir, cfg).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = (for (a <- 1L to 4L; b <- 11L to 13L) yield (a, b)).toSet
    assert(got == want, s"got=$got")
  }

  test("mega-source re-shard: block-partitioned group pairs emit identical pairs under a tiny shard cap") {
    import spark.implicits._
    // one dominant source whose total chars exceed the cap many times
    // over — the round-3 shape that would have grown a single GSA shard
    // unboundedly. Deterministic corpus with planted containments that
    // must cross arbitrary hash groups: 30 base docs, 12 contained
    // substrings of them, 4 exact duplicate copies, plus a second small
    // source as a control.
    val rnd = new Random(13)
    def word() = Array.fill(4 + rnd.nextInt(4))(('a' + rnd.nextInt(6)).toChar).mkString
    def doc(n: Int) = Array.fill(n)(word()).mkString(" ")
    val base = (0 until 30).map(i => (100L + i, doc(20 + rnd.nextInt(30))))
    val contained = (0 until 12).map { i =>
      val (bid, bt) = base(rnd.nextInt(base.length))
      // a >=substrMinChars-length slice of a base doc
      val start = rnd.nextInt(math.max(1, bt.length - cfg.substrMinChars - 1))
      (500L + i, bt.substring(start, math.min(bt.length, start + cfg.substrMinChars + 20 + rnd.nextInt(40))))
    }
    val copies = (0 until 4).map(i => (800L + i, base(i)._2))
    val control = Seq((900L, doc(30)), (901L, doc(25)))
    val rows =
      (base ++ contained ++ copies).map { case (id, t) => (id, t, "en", "mega", t.length.toLong) } ++
      control.map { case (id, t) => (id, t, "en", "ctl", t.length.toLong) }
    val dirT = java.nio.file.Files.createTempDirectory("sa-mega").toString
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dirT/documents.parquet")
    val totalChars = rows.filter(_._4 == "mega").map(_._2.length).sum
    // tiny cap forces G >= 5 groups -> >= 15 block shards
    val capSmall = totalChars / 5
    val gotSharded = TextOps.substrDedupSA(spark, dirT,
      cfg.copy(saShardMaxChars = capSmall)).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    // no duplicate emissions (each text pair meets in exactly one shard)
    assert(gotSharded.distinct.size == gotSharded.size,
      s"duplicate pairs from overlapping shards: ${gotSharded.groupBy(identity).filter(_._2.size > 1).keys.take(5)}")
    val gotSingle = TextOps.substrDedupSA(spark, dirT, cfg).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val local = rows.map { case (id, t, _, src, _) => (id, src, t.toLowerCase) }
      .filter(_._3.length >= cfg.substrMinChars)
    val want = (for {
      a <- local.iterator
      b <- local
      if a._1 < b._1 && a._2 == b._2 && a._3 != b._3 &&
        (a._3.contains(b._3) || b._3.contains(a._3))
    } yield (a._1, b._1)).toSet
    assert(want.nonEmpty, "planted corpus must contain containment pairs")
    assert(gotSingle == want, s"single-shard missed=${(want -- gotSingle).take(5)}")
    assert(gotSharded.toSet == want,
      s"re-shard missed=${(want -- gotSharded.toSet).take(5)} extra=${(gotSharded.toSet -- want).take(5)}")
  }

  test("substrDedupSA == local brute force on sf0.001; superset of the df-pruned winnowing path") {
    val local = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2).toLowerCase))
      .filter(_._3.length >= cfg.substrMinChars)
    val want = (for {
      a <- local.iterator
      b <- local
      if a._1 < b._1 && a._2 == b._2 && a._3 != b._3 &&
        (a._3.contains(b._3) || b._3.contains(a._3))
    } yield (a._1, b._1)).toSet

    val got = TextOps.substrDedupSA(spark, dir, cfg).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want, s"missed=${(want -- got).take(5)} extra=${(got -- want).take(5)}")

    val winnowed = TextOps.substrDedup(spark, dir, cfg).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(winnowed.subsetOf(got),
      s"winnowing found pairs SA missed: ${(winnowed -- got).take(5)}")
  }
}
