package graft.synth

import graft.core.{DedupConfig, ImageRow}
import graft.signatures.{Codec, Sig}
import org.apache.spark.sql.{Dataset, SparkSession}

/** Deterministic seeded synthetic image+caption corpus with planted
  * duplicate structure — the analog of destor's replayable chunk traces
  * (reference: src/trace_phase.c:96-207, the de-facto golden fixtures).
  *
  * Rows are generated in GROUPS of 8 from a group index, purely from
  * `mix64(seed ^ groupIdx)` — so the corpus is identical across runs,
  * partitionings, and parallelism levels, and generation distributes as
  * `spark.range(nGroups).flatMap(genGroup)` (no driver-side data).
  *
  * Group patterns (cycle of 5) plant every dup class from FIXTURES.md §2:
  *   0 unique       — 8 singletons
  *   1 exact+reenc  — base, byte-identical copy, 6-bit re-encode ("qnt")
  *   2 jitter+edit  — base, <=2% pixel-jitter copy, caption-append edit
  *   3 substr+chain — base, caption-superstring, edit of that (A~B~C chain)
  *   4 skew+neg     — 4 rows sharing one boilerplate caption (hot LSH
  *                    bucket) + 1 near-miss negative below threshold
  */
object CorpusGen {

  val GroupSize = 8
  private val W = 24
  private val H = 24

  /** Deterministic vocabulary: 4096 CV-syllable words. Size matters for
    * realism: a 512-word Zipf^2 vocabulary made exact 3-word runs repeat
    * so often that winnowed substring fingerprints produced ~17M
    * false candidate pairs at 750k captions — natural-language caption
    * corpora share exact 16-char runs orders of magnitude less. */
  val vocab: Array[String] = {
    val cons = "bcdfgklmnprstvz"
    val vow = "aeiou"
    val out = new Array[String](4096)
    var i = 0
    while (i < 4096) {
      val r = Sig.mix64(0x5eedL ^ i)
      val sb = new StringBuilder
      val syll = 2 + (((r >>> 8) % 2).toInt + 2) % 2
      var s = 0
      var rr = r
      while (s <= syll) {
        sb.append(cons(((rr & 0x7fff) % cons.length).toInt))
        rr >>>= 7
        sb.append(vow(((rr & 0x7fff) % vow.length).toInt))
        rr >>>= 7
        if (rr == 0) rr = Sig.mix64(r + s)
        s += 1
      }
      out(i) = sb.toString
      i += 1
    }
    out
  }

  private val boilerplate =
    "stock photo no description available copyright watermark image placeholder thumbnail preview"

  /** Zipf-ish word pick (power 1.5 over 4096 words). */
  private def pickWord(rng: java.util.Random): String =
    vocab((vocab.length * math.pow(rng.nextDouble(), 1.5)).toInt.min(vocab.length - 1))

  private def genCaption(rng: java.util.Random, nWords: Int): String =
    Array.fill(nWords)(pickWord(rng)).mkString(" ")

  /** Deterministic pixel field: random gradients + sines + PER-IMAGE
    * random 8x8 block offsets + mild noise. The block offsets matter:
    * without them, smooth gradients make average-hash block means
    * heavily correlated ACROSS images (~0.1% of all pairs landed within
    * hamming 6 — pathological candidate density no real DCT-phash
    * corpus has). Offsets of +-60 put each block far from the phash
    * threshold, so the hash is image-specific yet stable under the
    * <=2% pixel jitter of the planted dup class.
    */
  private def genPixels(rng: java.util.Random): Array[Byte] = {
    val gx = rng.nextDouble() * 4 - 2
    val gy = rng.nextDouble() * 4 - 2
    val fx = 0.1 + rng.nextDouble() * 0.6
    val fy = 0.1 + rng.nextDouble() * 0.6
    val ph = rng.nextDouble() * math.Pi * 2
    val base = 80 + rng.nextInt(90)
    val blockOff = Array.fill(64)(rng.nextInt(161) - 80)
    val rgb = new Array[Byte](W * H * 3)
    var y = 0
    while (y < H) {
      val by = math.min(7, y * 8 / H)
      var x = 0
      while (x < W) {
        val bx = math.min(7, x * 8 / W)
        val v = base + gx * x + gy * y +
          30 * math.sin(fx * x + ph) + 30 * math.cos(fy * y + ph) +
          blockOff(by * 8 + bx)
        var c = 0
        while (c < 3) {
          val chan = v + c * 17 + rng.nextInt(5)
          rgb((y * W + x) * 3 + c) = math.max(0, math.min(255, chan.toInt)).toByte
          c += 1
        }
        x += 1
      }
      y += 1
    }
    rgb
  }

  private def jitter(rgb: Array[Byte], rng: java.util.Random): Array[Byte] = {
    val out = rgb.clone()
    val n = math.max(1, rgb.length / 50) // 2% of bytes
    var i = 0
    while (i < n) {
      val p = rng.nextInt(rgb.length)
      val d = rng.nextInt(5) - 2
      out(p) = math.max(0, math.min(255, (out(p) & 0xff) + d)).toByte
      i += 1
    }
    out
  }

  private def row(id: Long, rgb: Array[Byte], fmt: String, caption: String): ImageRow = {
    val bytes = if (fmt == "qnt") Codec.encodeQnt(W, H, rgb) else Codec.encodePpm(W, H, rgb)
    val decoded = Codec.decode(bytes, fmt) // phash of the *stored* pixels
    ImageRow(f"img$id%010d", bytes, W, H, fmt, caption, Codec.phash(W, H, decoded))
  }

  /** The 8 rows of group k — pure function of (seed, k). */
  def genGroup(seed: Long, k: Long): Seq[ImageRow] = {
    val rng = new java.util.Random(Sig.mix64(seed ^ k))
    val idBase = k * GroupSize
    val pattern = (k % 5).toInt
    val rows = scala.collection.mutable.ArrayBuffer.empty[ImageRow]

    def uniqueRow(t: Int): ImageRow =
      row(idBase + t, genPixels(rng), "ppm", genCaption(rng, 10 + rng.nextInt(14)))

    pattern match {
      case 0 =>
        var t = 0
        while (t < 8) { rows += uniqueRow(t); t += 1 }
      case 1 => // exact + reenc
        val pix = genPixels(rng)
        val cap = genCaption(rng, 12 + rng.nextInt(10))
        rows += row(idBase + 0, pix, "ppm", cap)
        rows += row(idBase + 1, pix, "ppm", cap) // exact (same bytes+caption)
        rows += row(idBase + 2, pix, "qnt", cap) // lossy re-encode
        var t = 3
        while (t < 8) { rows += uniqueRow(t); t += 1 }
      case 2 => // pixel-jitter + caption-append edit
        val pix = genPixels(rng)
        val cap = genCaption(rng, 14 + rng.nextInt(8))
        rows += row(idBase + 0, pix, "ppm", cap)
        rows += row(idBase + 1, jitter(pix, rng), "ppm", genCaption(rng, 11)) // pixel dup
        rows += row(idBase + 2, genPixels(rng), "ppm", cap + " " + pickWord(rng)) // caption dup
        var t = 3
        while (t < 8) { rows += uniqueRow(t); t += 1 }
      case 3 => // substring + chain
        val capA = genCaption(rng, 10 + rng.nextInt(6))
        val capB = pickWord(rng) + " " + capA + " " + pickWord(rng) + " " + pickWord(rng)
        rows += row(idBase + 0, genPixels(rng), "ppm", capA)
        rows += row(idBase + 1, genPixels(rng), "ppm", capB) // A substring-of B
        rows += row(idBase + 2, genPixels(rng), "ppm", capB + " " + pickWord(rng)) // B~C edit
        var t = 3
        while (t < 8) { rows += uniqueRow(t); t += 1 }
      case 4 => // skew (hot bucket) + negative near-miss
        var t = 0
        while (t < 4) { rows += row(idBase + t, genPixels(rng), "ppm", boilerplate); t += 1 }
        // negative: shares ~half the boilerplate words — Jaccard(shingles)
        // well below 0.8, must NOT cluster
        val neg = "stock photo no description " + genCaption(rng, 8)
        rows += row(idBase + 4, genPixels(rng), "ppm", neg)
        t = 5
        while (t < 8) { rows += uniqueRow(t); t += 1 }
    }
    rows.toSeq
  }

  /** Distributed deterministic corpus of `nGroups*8` rows. */
  def generate(spark: SparkSession, nGroups: Long, seed: Long = 42L): Dataset[ImageRow] = {
    import spark.implicits._
    spark.range(nGroups).flatMap(k => genGroup(seed, k))
  }
}
