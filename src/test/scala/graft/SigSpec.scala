package graft

import graft.core.DedupConfig
import graft.signatures.{Codec, Sig}
import org.scalatest.funsuite.AnyFunSuite

class SigSpec extends AnyFunSuite {
  val cfg = DedupConfig.default

  test("hash64 is deterministic and spreads") {
    assert(Sig.hash64("abc") == Sig.hash64("abc"))
    assert(Sig.hash64("abc") != Sig.hash64("abd"))
    val hs = (0 until 1000).map(i => Sig.hash64(s"w$i")).toSet
    assert(hs.size == 1000)
  }

  test("word shingles") {
    assert(Sig.wordShingles("a b c d", 3).toSeq == Seq("a b c", "b c d"))
    assert(Sig.wordShingles("a b", 3).toSeq == Seq("a b"))
    assert(Sig.wordShingles("", 3).toSeq == Seq(""))
    assert(Sig.wordShingles("Hello, World!", 3).toSeq == Seq("hello world"))
  }

  test("jaccard exact on sorted hash sets") {
    val a = Sig.shingleHashes("the quick brown fox jumps over the lazy dog", 3)
    val b = Sig.shingleHashes("the quick brown fox jumps over the lazy dog", 3)
    assert(Sig.jaccard(a, b) == 1.0)
    val c = Sig.shingleHashes("completely different words here now really", 3)
    assert(Sig.jaccard(a, c) == 0.0)
  }

  test("minhash similarity approximates jaccard (K=128)") {
    val capA = (1 to 30).map(i => s"word$i").mkString(" ")
    val capB = (1 to 30).map(i => s"word$i").mkString(" ") + " extra tail"
    val sa = Sig.shingleHashes(capA, 3)
    val sb = Sig.shingleHashes(capB, 3)
    val trueJ = Sig.jaccard(sa, sb)
    val est = Sig.minhashSimilarity(Sig.minhash(sa, cfg), Sig.minhash(sb, cfg))
    assert(math.abs(trueJ - est) < 0.15, s"true=$trueJ est=$est")
  }

  test("minhash of identical sets is identical; of disjoint sets differs") {
    val a = Sig.shingleHashes("one two three four five six seven", 3)
    assert(Sig.minhash(a, cfg).toSeq == Sig.minhash(a.clone(), cfg).toSeq)
  }

  test("band keys: equal signatures share all bands; combo (8,2) pigeonhole for hamming <= 6") {
    val sig = Array.tabulate(cfg.minhashK)(i => Sig.mix64(i))
    assert(Sig.bandKeys(sig, cfg).toSeq == Sig.bandKeys(sig.clone(), cfg).toSeq)
    // any 6 bit flips: 8 blocks choose 2 must still share a combo key
    val rng = new java.util.Random(3)
    (0 until 500).foreach { _ =>
      val x = rng.nextLong()
      var flipped = x
      val nf = 1 + rng.nextInt(6)
      (0 until nf).foreach(_ => flipped ^= (1L << rng.nextInt(64)))
      val bx = Sig.hammingComboKeys(x, cfg.phashBlocks, cfg.phashCombo).toSet
      val bf = Sig.hammingComboKeys(flipped, cfg.phashBlocks, cfg.phashCombo).toSet
      assert(bx.intersect(bf).nonEmpty, f"x=$x%x flips=$nf")
      assert(bx.size == 28) // C(phashBlocks=8, phashCombo=2) distinct keys
    }
  }

  test("winnowing guarantee: shared substring >= w+k-1 chars shares a fingerprint") {
    (0 until 200).foreach { seed =>
      val rng = new java.util.Random(seed)
      def word() = (1 to (3 + rng.nextInt(5))).map(_ => ('a' + rng.nextInt(26)).toChar).mkString
      var shared = word()
      while (shared.length < cfg.substrMinChars + 5) shared += " " + word()
      val a = word() + " " + shared
      val b = shared + " " + word() + " " + word()
      val fa = Sig.captionFingerprints(a, cfg.substrGram, cfg.substrWindow).toSet
      val fb = Sig.captionFingerprints(b, cfg.substrGram, cfg.substrWindow).toSet
      assert(fa.intersect(fb).nonEmpty, s"seed=$seed")
    }
  }

  test("simhash: identical features -> identical hash; hamming grows with divergence") {
    val f = Array.tabulate(40)(i => Sig.mix64(i * 7L))
    assert(Sig.simhash64(f, null) == Sig.simhash64(f.clone(), null))
    val g = f.clone(); g(0) = Sig.mix64(999L)
    assert(Sig.hamming(Sig.simhash64(f, null), Sig.simhash64(g, null)) <= 16)
  }

  test("codec round-trip + PSNR bounds") {
    val rng = new java.util.Random(7)
    val rgb = Array.fill(24 * 24 * 3)(rng.nextInt(256).toByte)
    val ppm = Codec.encodePpm(24, 24, rgb)
    assert(Codec.decode(ppm, "ppm").toSeq == rgb.toSeq)
    val qnt = Codec.encodeQnt(24, 24, rgb)
    val dq = Codec.decode(qnt, "qnt")
    val p = Codec.psnr(rgb, dq)
    assert(p >= 38.0 && p < 1e9, s"psnr=$p") // 6-bit quantization stays near 40 dB
    assert(Codec.psnr(rgb, rgb) == 1e9)
  }

  test("phash: stable under small jitter, differs across random images") {
    val rng = new java.util.Random(11)
    def smooth(): Array[Byte] = {
      val gx = rng.nextDouble() * 8 - 4; val gy = rng.nextDouble() * 8 - 4
      val base = 80 + rng.nextInt(80)
      Array.tabulate(24 * 24 * 3) { i =>
        val p = i / 3; val x = p % 24; val y = p / 24
        math.max(0, math.min(255, (base + gx * x + gy * y).toInt)).toByte
      }
    }
    val a = smooth()
    val jit = a.clone()
    (1 to a.length / 50).foreach { _ =>
      val p = rng.nextInt(a.length)
      jit(p) = math.max(0, math.min(255, (jit(p) & 0xff) + rng.nextInt(5) - 2)).toByte
    }
    assert(Sig.hamming(Codec.phash(24, 24, a), Codec.phash(24, 24, jit)) <= 6)
    val hs = (1 to 20).map(_ => Codec.phash(24, 24, smooth())).toSet
    assert(hs.size >= 15) // distinct random gradients get distinct hashes
  }
}
