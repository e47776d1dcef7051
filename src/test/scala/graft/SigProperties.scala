package graft

import graft.core.DedupConfig
import graft.signatures.{Chunker, Sig}
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.{forAll, propBoolean}

/** Property-based checks (the SURVEY §5 plan's ScalaCheck tier) of the
  * signature/LSH/chunking math — the statistical and pigeonhole
  * guarantees the deterministic specs can only spot-check:
  * MinHash ≈ Jaccard, the hamming-LSH candidate guarantees, the
  * winnowing window guarantee, and chunker tiling on arbitrary input.
  */
object SigProperties extends Properties("Sig") {

  private val cfg = DedupConfig.default

  /** n distinct pseudo-random longs from a seed (sorted — the shape
    * Sig.jaccard expects). */
  private def set(seed: Long, n: Int): Array[Long] = {
    val a = Array.tabulate(n)(i => Sig.mix64(seed * 0x9e3779b97f4a7c15L + i))
    java.util.Arrays.sort(a)
    a
  }

  private val setPair = for {
    seed <- Gen.choose(1L, Long.MaxValue / 2)
    nShared <- Gen.choose(0, 200)
    nA <- Gen.choose(0, 150)
    nB <- Gen.choose(0, 150)
  } yield {
    val shared = set(seed, nShared)
    val a = (shared ++ set(seed + 1, nA)).distinct.sorted
    val b = (shared ++ set(seed + 2, nB)).distinct.sorted
    (a, b)
  }

  property("minhash similarity estimates exact jaccard (5-sigma at K=" +
    cfg.minhashK + ")") = forAll(setPair) { case (a, b) =>
    (a.nonEmpty && b.nonEmpty) ==> {
      val est = Sig.minhashSimilarity(Sig.minhash(a, cfg), Sig.minhash(b, cfg))
      val exact = Sig.jaccard(a, b)
      math.abs(est - exact) <= 5.0 * math.sqrt(0.25 / cfg.minhashK) + 1e-9
    }
  }

  property("minhash is exact at the extremes: identical=1, disjoint~0") =
    forAll(Gen.choose(1L, Long.MaxValue / 2), Gen.choose(1, 300)) { (seed, n) =>
      val a = set(seed, n)
      val b = set(seed + 7777, n)
      val sa = Sig.minhash(a, cfg)
      Sig.minhashSimilarity(sa, Sig.minhash(a, cfg)) == 1.0 &&
        Sig.minhashSimilarity(sa, Sig.minhash(b, cfg)) <= 0.2
    }

  /** Flip exactly k distinct random bits of a 64-bit word. */
  private def flip(bits: Long, seed: Long, k: Int): Long = {
    var out = bits
    var flipped = 0
    var i = 0
    while (flipped < k) {
      val pos = (Sig.mix64(seed + i) & 63).toInt
      if (((out ^ bits) >>> pos & 1L) == 0L) { out ^= (1L << pos); flipped += 1 }
      i += 1
    }
    out
  }

  property("hammingBandKeys pigeonhole: < bands flips always share a key") =
    forAll(Gen.choose(Long.MinValue, Long.MaxValue), Gen.choose(0, 7),
      Gen.choose(1L, Long.MaxValue / 2)) { (bits, k, seed) =>
      val other = flip(bits, seed, k) // k < 8 = bands
      val ka = Sig.hammingBandKeys(bits, 8).toSet
      Sig.hammingBandKeys(other, 8).exists(ka.contains)
    }

  property("hammingComboKeys pigeonhole: <= blocks-combo flips always share a key") =
    forAll(Gen.choose(Long.MinValue, Long.MaxValue), Gen.choose(0, 6),
      Gen.choose(1L, Long.MaxValue / 2)) { (bits, k, seed) =>
      val other = flip(bits, seed, k) // k <= 9 - 3
      val ka = Sig.hammingComboKeys(bits).toSet
      Sig.hammingComboKeys(other).exists(ka.contains)
    }

  property("simhash is invariant to feature order") =
    forAll(Gen.choose(1L, Long.MaxValue / 2), Gen.choose(1, 100),
      Gen.choose(1L, Long.MaxValue / 2)) { (seed, n, shuf) =>
      val f = Array.tabulate(n)(i => Sig.mix64(seed + i))
      val perm = f.zipWithIndex
        .sortBy { case (_, i) => Sig.mix64(shuf + i) }.map(_._1)
      Sig.simhash64(f, null) == Sig.simhash64(perm, null)
    }

  property("winnow guarantee: every w-window of grams contains a selected value") =
    forAll(Gen.choose(1L, Long.MaxValue / 2), Gen.choose(1, 400),
      Gen.choose(2, 30)) { (seed, n, w) =>
      // distinct values (collision odds negligible) so value-membership
      // identifies window membership
      val grams = Array.tabulate(n)(i => Sig.mix64(seed * 31 + i))
      val sel = Sig.winnow(grams, w).toSet
      grams.sliding(math.min(w, n)).forall(_.exists(sel.contains))
    }

  private val byteArrays = for {
    seed <- Gen.choose(1L, Long.MaxValue / 2)
    n <- Gen.oneOf(Gen.choose(0, 70), Gen.choose(0, 5000))
  } yield {
    val nn = n
    Array.tabulate[Byte](nn)(i => (Sig.mix64(seed + i) & 0xff).toByte)
  }

  property("every chunker tiles arbitrary input within clamps") =
    forAll(byteArrays) { b =>
      val p = Chunker.Params(16, 64, 256)
      Chunker.algos.forall { algo =>
        val ends = Chunker.boundaries(algo, b, p)
        if (b.isEmpty) ends.isEmpty
        else {
          var prev = 0
          var ok = ends.last == b.length
          for ((e, i) <- ends.zipWithIndex) {
            val len = e - prev
            ok &&= len > 0 && len <= p.max &&
              (i == ends.length - 1 || len >= p.min)
            prev = e
          }
          ok
        }
      }
    }

  property("jaccard is a similarity: symmetric, 1 on self, 0 on disjoint") =
    forAll(setPair) { case (a, b) =>
      Sig.jaccard(a, b) == Sig.jaccard(b, a) &&
        Sig.jaccard(a, a) == (if (a.isEmpty) 1.0 else 1.0) &&
        (a.isEmpty || Sig.jaccard(a, Array.emptyLongArray) == 0.0)
    }
}
