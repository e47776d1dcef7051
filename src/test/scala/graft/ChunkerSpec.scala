package graft

import graft.signatures.Chunker
import org.scalatest.funsuite.AnyFunSuite

/** Byte-level properties of the CDC chunker family (P2-P6) that the
  * SQL-facing q_chunk_cover invariants can't see: exact tiling on
  * adversarial inputs, clamp behavior, determinism, and the
  * edit-locality property that makes content-defined chunking
  * dedup-friendly (boundaries re-synchronize after an insert).
  */
class ChunkerSpec extends AnyFunSuite {

  private val p = Chunker.Params(64, 256, 1024)

  /** Deterministic pseudo-random bytes (splitmix stream). */
  private def randBytes(n: Int, seed: Long): Array[Byte] = {
    val b = new Array[Byte](n)
    var i = 0
    while (i < n) {
      b(i) = (graft.signatures.Sig.mix64(seed + i) & 0xff).toByte
      i += 1
    }
    b
  }

  private def assertTiling(algo: String, b: Array[Byte], prm: Chunker.Params): Unit = {
    val ends = Chunker.boundaries(algo, b, prm)
    if (b.isEmpty) { assert(ends.isEmpty); return }
    assert(ends.last == b.length, s"$algo: last boundary must be n")
    var prev = 0
    ends.zipWithIndex.foreach { case (e, i) =>
      val len = e - prev
      assert(len > 0, s"$algo: non-positive chunk at $i")
      assert(len <= prm.max, s"$algo: max clamp violated ($len > ${prm.max})")
      if (i < ends.length - 1)
        assert(len >= prm.min, s"$algo: min clamp violated on non-final chunk ($len)")
      prev = e
    }
  }

  test("every algorithm tiles random, constant, and tiny inputs exactly") {
    val inputs = Seq(
      randBytes(64 * 1024, 7L),
      Array.fill[Byte](8192)(0),          // degenerate constant input
      randBytes(1, 1L), randBytes(63, 2L), // below min
      randBytes(p.max, 3L), randBytes(p.max + 1, 4L),
      Array.emptyByteArray)
    for (algo <- Chunker.algos; in <- inputs) assertTiling(algo, in, p)
  }

  test("chunking is deterministic") {
    val b = randBytes(32 * 1024, 11L)
    for (algo <- Chunker.algos)
      assert(Chunker.boundaries(algo, b, p).toSeq == Chunker.boundaries(algo, b, p).toSeq)
  }

  test("average chunk size lands near avg for random input") {
    val b = randBytes(1024 * 1024, 13L)
    for (algo <- Chunker.algos) {
      val n = Chunker.boundaries(algo, b, p).length
      val mean = b.length.toDouble / n
      // CDC size distributions are wide; assert the right order of magnitude
      assert(mean > p.avg / 4.0 && mean < p.max,
        s"$algo mean chunk $mean outside (${p.avg / 4.0}, ${p.max})")
    }
  }

  test("edit locality: boundaries re-synchronize after a front insert") {
    val b = randBytes(256 * 1024, 17L)
    val shifted = new Array[Byte](b.length + 1)
    shifted(0) = 42
    System.arraycopy(b, 0, shifted, 1, b.length)
    for (algo <- Chunker.algos) {
      val orig = Chunker.boundaries(algo, b, p).map(_ + 1).toSet
      val edit = Chunker.boundaries(algo, shifted, p)
      // beyond the first few chunks the cut points must realign (+1);
      // fixed-size chunking would share ~0 of them
      val tail = edit.drop(4)
      val shared = tail.count(orig.contains)
      assert(tail.nonEmpty && shared.toDouble / tail.length >= 0.8,
        s"$algo resync ${shared}/${tail.length}")
    }
  }

  test("chunk fingerprints identify equal content at any offset") {
    val chunk = randBytes(500, 19L)
    val a = chunk ++ randBytes(100, 20L)
    val b = randBytes(77, 21L) ++ chunk
    assert(Chunker.rangeFp(a, 0, 500) == Chunker.rangeFp(b, 77, 500))
    assert(Chunker.rangeFp(a, 0, 500) != Chunker.rangeFp(a, 1, 500))
  }

  test("tttd falls back to the backup divisor before the max clamp") {
    // over many random inputs, tttd's forced cuts (exactly at max) must
    // be rarer than plain rabin's, because the backup divisor usually
    // fires first — that is the whole point of the second threshold
    val b = randBytes(512 * 1024, 23L)
    def forced(algo: String): Int = {
      val ends = Chunker.boundaries(algo, b, p)
      var prev = 0
      ends.count { e => val l = e - prev; prev = e; l == p.max }
    }
    assert(forced("tttd") <= forced("rabin"))
  }
}
