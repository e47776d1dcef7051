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

  /** Per-token 64-bit hashes: single pass over the chars (lowercased,
    * letter/digit runs = tokens) — no regex, no String allocation.
    * The hot path of the whole dedup engine: called twice per verified
    * pair; the regex/TreeSet formulation cost ~70us/call (131s for
    * 1M pairs at 100k-image scale), this is ~1-2us. */
  def tokenHashes(text: String): Array[Long] = {
    val n = text.length
    var out = new Array[Long](math.max(4, n / 5))
    var m = 0
    var i = 0
    while (i < n) {
      while (i < n && !Character.isLetterOrDigit(text.charAt(i))) i += 1
      if (i < n) {
        var h = 0xcbf29ce484222325L
        while (i < n && Character.isLetterOrDigit(text.charAt(i))) {
          h = (h ^ Character.toLowerCase(text.charAt(i)).toLong) * 0x100000001b3L
          i += 1
        }
        if (m == out.length) out = java.util.Arrays.copyOf(out, m * 2)
        out(m) = mix64(h)
        m += 1
      }
    }
    java.util.Arrays.copyOf(out, m)
  }

  /** Hashed k-shingle set (distinct, sorted) — what MinHash and exact
    * Jaccard see. Shingle hash = chained mix of k consecutive token
    * hashes (order-sensitive); captions shorter than k tokens yield one
    * whole-caption shingle (empty-segment sentinel analog,
    * src/index/sampling_method.c:67-72). */
  def shingleHashes(text: String, k: Int): Array[Long] = {
    val t = tokenHashes(text)
    if (t.length == 0) return Array(hash64(""))
    val nsh = if (t.length <= k) 1 else t.length - k + 1
    val win = math.min(k, t.length)
    val sh = new Array[Long](nsh)
    var i = 0
    while (i < nsh) {
      var h = 0xcbf29ce484222325L
      var j = 0
      while (j < win) { h = (h ^ t(i + j)) * 0x100000001b3L; j += 1 }
      sh(i) = mix64(h)
      i += 1
    }
    java.util.Arrays.sort(sh)
    // dedupe in place
    var m = 0
    i = 0
    while (i < nsh) {
      if (m == 0 || sh(m - 1) != sh(i)) { sh(m) = sh(i); m += 1 }
      i += 1
    }
    java.util.Arrays.copyOf(sh, m)
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

  /** Block-combination hamming LSH: split the 64-bit hash into `blocks`
    * equal slices and emit one key per `combo`-subset of slices.
    * Pigeonhole: h flipped bits dirty at most h blocks, so for
    * h <= blocks - combo at least one emitted subset is clean on both
    * sides — guaranteed candidate generation for hamming <= blocks-combo
    * with keys of combo*width bits (selective buckets at scale, unlike
    * single-slice banding whose 64/bands-bit keys saturate).
    * Defaults (9,3) guarantee hamming <= 6 with 21-bit keys.
    */
  // flattened combination-index table per (blocks, combo), built once —
  // the per-call recursive enumeration allocated an ArrayBuffer + combo
  // frames per image (28-84 combos x 800k images of churn)
  private val comboTables =
    new java.util.concurrent.ConcurrentHashMap[Long, Array[Int]]()

  private def comboTable(blocks: Int, combo: Int): Array[Int] =
    comboTables.computeIfAbsent((blocks.toLong << 32) | combo, _ => {
      val out = scala.collection.mutable.ArrayBuffer.empty[Int]
      val idx = new Array[Int](combo)
      def rec(start: Int, d: Int): Unit =
        if (d == combo) out ++= idx
        else {
          var s = start
          while (s <= blocks - (combo - d)) { idx(d) = s; rec(s + 1, d + 1); s += 1 }
        }
      rec(0, 0)
      out.toArray
    })

  def hammingComboKeys(bits0: Long, blocks: Int = 9, combo: Int = 3): Array[Long] = {
    // fixed bit permutation j -> (23*j) mod 64 BEFORE slicing: perceptual
    // hashes have spatially-correlated neighboring bits, so slices of
    // consecutive bits concentrate on few values (measured: 10M+
    // all-pairs candidates at 100k rows); spreading decorrelates slice
    // values. A fixed permutation preserves the pigeonhole guarantee.
    var bits = 0L
    var j = 0
    while (j < 64) {
      if (((bits0 >>> ((j * 23) & 63)) & 1L) == 1L) bits |= (1L << j)
      j += 1
    }
    val width = 64 / blocks
    val mask = (1L << width) - 1
    val slices = new Array[Long](blocks)
    var b = 0
    while (b < blocks) { slices(b) = (bits >>> (b * width)) & mask; b += 1 }
    val tab = comboTable(blocks, combo)
    val n = tab.length / combo
    val out = new Array[Long](n)
    var c = 0
    while (c < n) {
      var h = 0xcbf29ce484222325L
      var i = 0
      while (i < combo) {
        val ix = tab(c * combo + i)
        h = (h ^ ix) * 0x100000001b3L
        h = (h ^ slices(ix)) * 0x100000001b3L
        i += 1
      }
      out(c) = mix64(h)
      c += 1
    }
    out
  }

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

  /** Char k-gram hashes of a string: FNV-1a over the k (lowercased)
    * chars of each gram, one char pass, ZERO allocation per gram. The
    * previous substring+getBytes form allocated ~2 objects per gram —
    * ~200M allocations per 800k-image posting stage, the stage's top
    * GC source at high thread counts. Char-wise lowering instead of
    * String.toLowerCase: equivalent for ASCII, deterministic for all
    * inputs, and every consumer (engine, oracles, specs) goes through
    * this one function, so internal consistency is what matters. */
  def charGramHashes(text: String, k: Int): Array[Long] = {
    val n = text.length
    if (n < k) return Array.empty
    val out = new Array[Long](n - k + 1)
    var i = 0
    while (i + k <= n) {
      var h = 0xcbf29ce484222325L
      var j = i
      val e = i + k
      while (j < e) {
        h = (h ^ Character.toLowerCase(text.charAt(j)).toLong) * 0x100000001b3L
        j += 1
      }
      out(i) = mix64(h)
      i += 1
    }
    out
  }

  /** Winnowing: minimum hash of every sliding window of `w` consecutive
    * k-gram hashes; rightmost minimum on ties (standard winnowing).
    * Returns the DISTINCT selected fingerprints, sorted.
    *
    * Sliding-window minimum via a monotonic index deque — O(n) total,
    * primitive arrays only (the TreeSet form boxed every candidate:
    * O(n*w) compares + ~one allocation per window). The selected VALUE
    * per window is identical to the scan form (a window's minimum value
    * is position-independent), so fingerprint sets are unchanged. */
  def winnow(grams: Array[Long], w: Int): Array[Long] = {
    if (grams.isEmpty) return Array.empty
    if (grams.length <= w) {
      var m = grams(0)
      var i = 1
      while (i < grams.length) { if (grams(i) < m) m = grams(i); i += 1 }
      return Array(m)
    }
    val sel = new Array[Long](grams.length - w + 1)
    var ns = 0
    val dq = new Array[Int](grams.length) // indices, values increasing head->tail
    var head = 0
    var tail = 0
    var i = 0
    while (i < grams.length) {
      while (tail > head && grams(dq(tail - 1)) >= grams(i)) tail -= 1
      dq(tail) = i
      tail += 1
      if (dq(head) <= i - w) head += 1
      if (i >= w - 1) {
        val m = grams(dq(head))
        if (ns == 0 || sel(ns - 1) != m) { sel(ns) = m; ns += 1 }
      }
      i += 1
    }
    val out = java.util.Arrays.copyOf(sel, ns)
    java.util.Arrays.sort(out)
    var m2 = 0
    var j = 0
    while (j < out.length) {
      if (m2 == 0 || out(m2 - 1) != out(j)) { out(m2) = out(j); m2 += 1 }
      j += 1
    }
    java.util.Arrays.copyOf(out, m2)
  }

  /** Winnowed fingerprints of a caption: selected min-hashes of char
    * `gram`-grams over windows of `w`. Two captions sharing a substring
    * of length >= w + gram - 1 chars are guaranteed to share one.
    */
  def captionFingerprints(text: String, gram: Int, w: Int): Array[Long] =
    winnow(charGramHashes(text, gram), w)
}
