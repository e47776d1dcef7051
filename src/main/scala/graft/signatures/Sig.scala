package graft.signatures

import graft.core.DedupConfig

/** Pure signature math — deterministic, allocation-light, usable both
  * inside Dataset typed maps (executor-side, embarrassingly parallel —
  * no shuffle) and in the brute-force oracle.
  *
  * This recasts destor's fingerprint stack:
  *   - `hash64` / `hashSeeded`: the rolling/gear hash family
  *     (reference: src/chunking/fascdc_chunking.c:65-95 builds a seeded
  *     random table; we use splitmix64 finalization, a public-domain
  *     mixer, instead of MD5-seeded tables).
  *   - `minhash`: K-permutation MinHash — the proper form of destor's
  *     min-sampling feature selection (src/index/sampling_method.c:12-75,
  *     Extreme Binning / SiLo).
  *   - `simhash64`: bit-vote sketch over weighted features (pixel side).
  *   - `bandKeys`: LSH banding — the analog of feature→segment postings
  *     in the kv index (src/index/kvstore_htable.c:11-53) with
  *     `index_key_size`-style key truncation (band hash = truncated key).
  *   - `winnow`: winnowing fingerprints (Schleimer et al., SIGMOD'03)
  *     for the exact-substring caption pass — guarantee: two strings
  *     sharing a substring of length >= windowSize + gramSize - 1 share
  *     at least one selected fingerprint.
  */
object Sig {

  /** splitmix64 finalizer — public-domain mixing function. */
  @inline def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** FNV-1a 64 over UTF-8 bytes, then mixed — deterministic string hash. */
  def hash64(s: String): Long = {
    var h = 0xcbf29ce484222325L
    val bytes = s.getBytes("UTF-8")
    var i = 0
    while (i < bytes.length) {
      h = (h ^ (bytes(i) & 0xffL)) * 0x100000001b3L
      i += 1
    }
    mix64(h)
  }

  def hash64(b: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < b.length) {
      h = (h ^ (b(i) & 0xffL)) * 0x100000001b3L
      i += 1
    }
    mix64(h)
  }

  /** i-th hash permutation of a base hash: h_i(x) = mix(base ^ seed_i). */
  @inline def permute(base: Long, i: Int, seed1: Long, seed2: Long): Long =
    mix64(base ^ (seed1 * (i + 1) + seed2))

  // ---------------- shingling ----------------

  /** Lower-cased word tokens (whitespace split, punctuation stripped). */
  def tokens(text: String): Array[String] =
    text.toLowerCase.split("[^\\p{L}\\p{N}]+").filter(_.nonEmpty)

  /** k-word shingles as joined strings; captions shorter than k words
    * yield one shingle = the whole caption (empty-segment sentinel
    * analog, src/index/sampling_method.c:67-72).
    */
  def wordShingles(text: String, k: Int): Array[String] = {
    val t = tokens(text)
    if (t.length == 0) Array("")
    else if (t.length <= k) Array(t.mkString(" "))
    else Array.tabulate(t.length - k + 1)(i => t.slice(i, i + k).mkString(" "))
  }

  /** Hashed shingle set (distinct) — what MinHash and exact Jaccard see. */
  def shingleHashes(text: String, k: Int): Array[Long] = {
    val sh = wordShingles(text, k)
    val set = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < sh.length) { set.add(hash64(sh(i))); i += 1 }
    val out = new Array[Long](set.size)
    val it = set.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    out
  }

  // ---------------- MinHash ----------------

  /** K-permutation MinHash signature over a hashed shingle set. */
  def minhash(shingles: Array[Long], cfg: DedupConfig): Array[Long] = {
    val K = cfg.minhashK
    val sig = Array.fill(K)(Long.MaxValue)
    var s = 0
    while (s < shingles.length) {
      val base = shingles(s)
      var i = 0
      while (i < K) {
        val h = permute(base, i, cfg.minhashSeed1, cfg.minhashSeed2)
        if (h < sig(i)) sig(i) = h
        i += 1
      }
      s += 1
    }
    sig
  }

  /** Estimated Jaccard from two MinHash signatures. */
  def minhashSimilarity(a: Array[Long], b: Array[Long]): Double = {
    var eq = 0
    var i = 0
    while (i < a.length) { if (a(i) == b(i)) eq += 1; i += 1 }
    eq.toDouble / a.length
  }

  /** Exact Jaccard of two hashed shingle sets (oracle + verify stage). */
  def jaccard(a: Array[Long], b: Array[Long]): Double = {
    if (a.isEmpty && b.isEmpty) return 1.0
    var i = 0; var j = 0; var inter = 0
    while (i < a.length && j < b.length) {
      if (a(i) == b(j)) { inter += 1; i += 1; j += 1 }
      else if (a(i) < b(j)) i += 1
      else j += 1
    }
    val union = a.length + b.length - inter
    if (union == 0) 1.0 else inter.toDouble / union
  }

  // ---------------- LSH banding ----------------

  /** b band keys from a MinHash signature: hash of each r-row slice.
    * Band key packs the band index in the high bits so keys from
    * different bands never collide (one flat join key space).
    */
  def bandKeys(sig: Array[Long], cfg: DedupConfig): Array[Long] = {
    val out = new Array[Long](cfg.bands)
    var b = 0
    while (b < cfg.bands) {
      var h = 0xcbf29ce484222325L ^ b
      var r = 0
      while (r < cfg.rowsPerBand) {
        h = (h ^ sig(b * cfg.rowsPerBand + r)) * 0x100000001b3L
        r += 1
      }
      out(b) = mix64(h)
      b += 1
    }
    out
  }

  /** Hamming-LSH band keys for a 64-bit hash: split into `bands` equal
    * bit-slices; two hashes within hamming distance < bands share at
    * least one slice (pigeonhole) — guaranteed candidate generation for
    * the phash/simhash side.
    */
  def hammingBandKeys(bits: Long, bands: Int): Array[Long] = {
    val width = 64 / bands
    val mask = if (width == 64) -1L else (1L << width) - 1
    Array.tabulate(bands) { b =>
      val slice = (bits >>> (b * width)) & mask
      // pack band id so slices from different bands never join
      mix64(slice ^ (0x51ed2701L * (b + 1)))
    }
  }

  @inline def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  // ---------------- SimHash ----------------

  /** 64-bit SimHash over weighted feature hashes: per-bit vote. */
  def simhash64(features: Array[Long], weights: Array[Int]): Long = {
    val votes = new Array[Int](64)
    var i = 0
    while (i < features.length) {
      val f = features(i)
      val w = if (weights == null) 1 else weights(i)
      var bit = 0
      while (bit < 64) {
        if (((f >>> bit) & 1L) == 1L) votes(bit) += w else votes(bit) -= w
        bit += 1
      }
      i += 1
    }
    var out = 0L
    var bit = 0
    while (bit < 64) { if (votes(bit) > 0) out |= (1L << bit); bit += 1 }
    out
  }

  // ---------------- winnowing (substring pass) ----------------

  /** Rolling char k-gram hashes of a normalized string. */
  def charGramHashes(text: String, k: Int): Array[Long] = {
    val s = text.toLowerCase
    if (s.length < k) return Array.empty
    Array.tabulate(s.length - k + 1)(i => hash64(s.substring(i, i + k)))
  }

  /** Winnowing: minimum hash of every sliding window of `w` consecutive
    * k-gram hashes; rightmost minimum on ties (standard winnowing).
    * Returns the DISTINCT selected fingerprints.
    */
  def winnow(grams: Array[Long], w: Int): Array[Long] = {
    if (grams.isEmpty) return Array.empty
    if (grams.length <= w) return Array(grams.min)
    val sel = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i + w <= grams.length) {
      var m = grams(i)
      var j = i + 1
      while (j < i + w) { if (grams(j) <= m) m = grams(j); j += 1 }
      sel.add(m)
      i += 1
    }
    val out = new Array[Long](sel.size)
    val it = sel.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    out
  }

  /** Winnowed fingerprints of a caption: selected min-hashes of char
    * `gram`-grams over windows of `w`. Two captions sharing a substring
    * of length >= w + gram - 1 chars are guaranteed to share one.
    */
  def captionFingerprints(text: String, gram: Int, w: Int): Array[Long] =
    winnow(charGramHashes(text, gram), w)
}
