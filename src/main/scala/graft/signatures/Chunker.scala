package graft.signatures

import scala.collection.mutable.ArrayBuilder

/** Byte-level content-defined chunking family — the reference's chunk
  * phase recast (reference `src/chunking/rabin_chunking.c`,
  * `ae_chunking.c`, `fascdc_chunking.c`, dispatch `src/chunk_phase.c`),
  * implemented from the published algorithm descriptions (Rabin–Karp
  * rolling fingerprints; TTTD, HP Labs HPL-2005-30R1; AE, Zhang et al.
  * INFOCOM'15; FastCDC, Xia et al. USENIX ATC'16) — not translated
  * from the C.
  *
  * Every chunker returns the END offset of each chunk, strictly
  * ascending, with the last element equal to `bytes.length`; an empty
  * input yields an empty array (the zero-chunk guard P9 handles those
  * upstream). Cut-point invariants shared by the family:
  *   - no cut before `min` bytes (a final chunk may be shorter),
  *   - a forced cut at `max` bytes,
  *   - boundaries depend only on local window content, so an edit
  *     re-synchronizes after O(window) bytes (the property that makes
  *     CDC dedup-friendly; asserted in ChunkerSpec).
  *
  * These are pure per-row functions: in the engine they run inside a
  * narrow typed flatMap (no shuffle, no state), so the stage is
  * embarrassingly parallel at any scale.
  */
object Chunker {

  /** min/avg/max chunk size in bytes; avg must be a power of two. */
  final case class Params(min: Int, avg: Int, max: Int) {
    require(min > 0 && min <= avg && avg <= max, s"bad chunk params $this")
    require((avg & (avg - 1)) == 0, s"avg must be a power of two: $avg")
    val avgBits: Int = java.lang.Long.numberOfTrailingZeros(avg.toLong)
  }

  /** Docs-scale default: several chunks per few-hundred-byte document. */
  val docParams: Params = Params(16, 64, 256)

  /** Deterministic byte-substitution table (gear table): 256 values
    * drawn from the splitmix64 stream — the FastCDC construction. */
  private val GEAR: Array[Long] = Array.tabulate(256)(i => Sig.mix64(0x67656172L + i))

  private def mask(bits: Int): Long = (1L << math.max(1, math.min(62, bits))) - 1

  // --- Rabin–Karp rolling fingerprint over a 48-byte window ----------
  // Multiplicative rolling hash mod 2^64 (Rabin–Karp): h covers exactly
  // the last W bytes; O(1) slide via precomputed A^W.
  private final val W = 48
  private final val A = 6364136223846793005L // public LCG multiplier
  private final val APowW: Long = {
    var p = 1L; var i = 0
    while (i < W) { p *= A; i += 1 }
    p
  }

  /** P2: Rabin-style CDC — cut when the windowed fingerprint matches a
    * fixed residue under the avg-size mask, with min/max clamps. */
  def rabin(b: Array[Byte], p: Params): Array[Int] =
    rollingCut(b, p, (h, _, m1, _) => (h & m1) == (0x78L & m1),
      mask(p.avgBits), 0L)

  /** P3: normalized Rabin — a stricter mask before the average point
    * and a looser one after, pulling the size distribution toward avg. */
  def rabinNormalized(b: Array[Byte], p: Params): Array[Int] =
    rollingCut(b, p,
      (h, len, mS, mL) => {
        val m = if (len < p.avg) mS else mL
        (h & m) == (0x78L & m)
      },
      mask(p.avgBits + 1), mask(p.avgBits - 1))

  /** P4: TTTD (two thresholds, two divisors) — main divisor `avg`,
    * backup divisor `avg/2`; if no main cut arrives by `max`, fall back
    * to the last backup-divisor match, else cut at `max`. */
  def tttd(b: Array[Byte], p: Params): Array[Int] = {
    val n = b.length
    if (n == 0) return Array.emptyIntArray
    val mMain = mask(p.avgBits)
    val mBack = mask(p.avgBits - 1)
    val out = ArrayBuilder.make[Int]
    var start = 0
    val win = new Array[Long](W)
    while (start < n) {
      val end = math.min(start + p.max, n)
      var h = 0L
      var i = start
      var cut = -1
      var backup = -1
      while (i < end && cut < 0) {
        val in = GEAR(b(i) & 0xff)
        val slot = (i - start) % W
        if (i - start >= W) h -= APowW * win(slot)
        h = h * A + in
        win(slot) = in
        i += 1
        if (i - start >= p.min && i - start >= W) {
          if ((h & mMain) == mMain) cut = i
          else if ((h & mBack) == mBack) backup = i
        }
      }
      val c = if (cut > 0) cut else if (backup > 0 && end < n) backup else end
      out += c
      start = c
    }
    out.result()
  }

  /** P5: AE (asymmetric extremum) — cut `w = avg/(e-1)` bytes after a
    * local maximum of the substituted byte values; no fingerprint mask,
    * min/max clamps applied. */
  def ae(b: Array[Byte], p: Params): Array[Int] = {
    val n = b.length
    if (n == 0) return Array.emptyIntArray
    val w = math.max(1, (p.avg / (math.E - 1)).toInt)
    val out = ArrayBuilder.make[Int]
    var start = 0
    while (start < n) {
      val end = math.min(start + p.max, n)
      var maxPos = start
      var maxVal = GEAR(b(start) & 0xff)
      var i = start + 1
      var cut = -1
      while (i < end && cut < 0) {
        val v = GEAR(b(i) & 0xff)
        if (v > maxVal) { maxVal = v; maxPos = i }
        else if (i == maxPos + w && i + 1 - start >= p.min) cut = i + 1
        i += 1
      }
      val c = if (cut > 0) math.min(cut, end) else end
      out += c
      start = c
    }
    out.result()
  }

  /** P6: FastCDC — gear rolling hash `h = (h << 1) + gear(byte)` with
    * normalized masks (stricter before avg, looser after) and cut-point
    * skipping to `min`. The gear window is 64 shifts deep, so hashing
    * warms up 64 bytes before the first legal cut point. */
  def fastcdc(b: Array[Byte], p: Params): Array[Int] = {
    val n = b.length
    if (n == 0) return Array.emptyIntArray
    val mS = mask(p.avgBits + 2)
    val mL = mask(p.avgBits - 2)
    val out = ArrayBuilder.make[Int]
    var start = 0
    while (start < n) {
      val end = math.min(start + p.max, n)
      var i = math.min(start + p.min, end)
      var h = 0L
      var j = math.max(start, i - 64) // warm the 64-deep gear window
      while (j < i) { h = (h << 1) + GEAR(b(j) & 0xff); j += 1 }
      var cut = -1
      while (i < end && cut < 0) {
        h = (h << 1) + GEAR(b(i) & 0xff)
        i += 1
        val m = if (i - start <= p.avg) mS else mL
        if ((h & m) == 0L) cut = i
      }
      val c = if (cut > 0) cut else end
      out += c
      start = c
    }
    out.result()
  }

  /** Shared windowed-fingerprint cut loop for the Rabin variants. */
  private def rollingCut(b: Array[Byte], p: Params,
                         isCut: (Long, Int, Long, Long) => Boolean,
                         m1: Long, m2: Long): Array[Int] = {
    val n = b.length
    if (n == 0) return Array.emptyIntArray
    val out = ArrayBuilder.make[Int]
    var start = 0
    val win = new Array[Long](W)
    while (start < n) {
      val end = math.min(start + p.max, n)
      var h = 0L
      var i = start
      var cut = -1
      while (i < end && cut < 0) {
        val in = GEAR(b(i) & 0xff)
        val slot = (i - start) % W
        if (i - start >= W) h -= APowW * win(slot)
        h = h * A + in
        win(slot) = in
        i += 1
        if (i - start >= p.min && i - start >= W && isCut(h, i - start, m1, m2))
          cut = i
      }
      val c = if (cut > 0) cut else end
      out += c
      start = c
    }
    out.result()
  }

  /** Dispatch by algorithm name (the reference's config-bound function
    * pointer, `src/chunk_phase.c:117-193`). */
  def boundaries(algo: String, b: Array[Byte], p: Params): Array[Int] = algo match {
    case "rabin"      => rabin(b, p)
    case "rabin_norm" => rabinNormalized(b, p)
    case "tttd"       => tttd(b, p)
    case "ae"         => ae(b, p)
    case "fastcdc"    => fastcdc(b, p)
    case other        => throw new IllegalArgumentException(s"unknown chunker: $other")
  }

  val algos: Seq[String] = Seq("ae", "fastcdc", "rabin", "rabin_norm", "tttd")

  /** FNV-1a/mix64 fingerprint of a byte range — chunk identity without
    * materializing the slice. */
  def rangeFp(b: Array[Byte], off: Int, len: Int): Long = {
    var h = 0xcbf29ce484222325L
    var i = off
    val end = off + len
    while (i < end) {
      h = (h ^ (b(i) & 0xffL)) * 0x100000001b3L
      i += 1
    }
    Sig.mix64(h)
  }
}
