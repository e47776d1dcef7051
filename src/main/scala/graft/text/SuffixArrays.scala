package graft.text

import scala.collection.mutable

/** Generalized suffix arrays for the EXACT substring-containment pass
  * the north rule names alongside MinHash/SimHash. The winnowing path
  * (`TextOps.substrDedup`) is the bounded LSH-style scale path; this is
  * its exact in-memory twin: per text shard, build one generalized
  * suffix array over the concatenated texts and read every
  * containment pair straight off the LCP array — no fingerprints, no
  * df-prune recall loss, O(shard log shard) build.
  *
  * Algorithms are public knowledge: suffix array by prefix doubling
  * (Manber & Myers, SIAM J. Comput. 1993) with counting-sort rounds,
  * LCP by Kasai et al. (CPM 2001). destor analog: the candidate-verify
  * discipline (reference src/index/index.c:181-204 probes, then the
  * filter phase confirms exactly) — here "exact" is at substring
  * granularity (SURVEY.md §7.4 risk 4: keep the generalized-SA pass
  * shard-scoped so memory stays bounded).
  */
object SuffixArrays extends Serializable {

  /** Suffix array of `s` over a non-negative Int alphabet: the
    * permutation of 0..n-1 ordering suffixes lexicographically.
    * Prefix doubling with two counting-sort passes per round —
    * O(n log n) time, O(n) extra space, no boxing.
    */
  def suffixArray(s: Array[Int]): Array[Int] = {
    val n = s.length
    if (n == 0) return Array.emptyIntArray
    if (n == 1) return Array(0)
    // compact the alphabet so counting arrays are O(n)
    val sorted = s.clone(); java.util.Arrays.sort(sorted)
    var distinct = 1
    var i = 1
    while (i < n) { if (sorted(i) != sorted(i - 1)) distinct += 1; i += 1 }
    val compact = new mutable.HashMap[Int, Int]()
    i = 0
    var next = 0
    while (i < n) {
      val c = sorted(i)
      if (!compact.contains(c)) { compact(c) = next; next += 1 }
      i += 1
    }
    var rank = new Array[Int](n)
    i = 0
    while (i < n) { rank(i) = compact(s(i)); i += 1 }

    var sa = new Array[Int](n)
    var tmp = new Array[Int](n)
    val cnt = new Array[Int](math.max(distinct, n) + 1)

    // initial sort by single symbol (counting sort on rank)
    java.util.Arrays.fill(cnt, 0, distinct + 1, 0)
    i = 0
    while (i < n) { cnt(rank(i) + 1) += 1; i += 1 }
    i = 1
    while (i <= distinct) { cnt(i) += cnt(i - 1); i += 1 }
    i = 0
    while (i < n) { sa(cnt(rank(i))) = i; cnt(rank(i)) += 1; i += 1 }

    var classes = distinct
    var k = 1
    val newRank = new Array[Int](n)
    while (classes < n && k < n) {
      // sort by second key: suffixes whose second half starts at
      // position >= n (i.e. i + k >= n) come first (empty < anything);
      // a stable pass over the previous order achieves this by listing
      // the tail positions first, then sa shifted left by k
      var p = 0
      i = n - k
      while (i < n) { tmp(p) = i; p += 1; i += 1 }
      i = 0
      while (i < n) {
        if (sa(i) >= k) { tmp(p) = sa(i) - k; p += 1 }
        i += 1
      }
      // stable counting sort by first key (rank)
      java.util.Arrays.fill(cnt, 0, classes + 1, 0)
      i = 0
      while (i < n) { cnt(rank(i) + 1) += 1; i += 1 }
      i = 1
      while (i <= classes) { cnt(i) += cnt(i - 1); i += 1 }
      i = 0
      while (i < n) {
        val v = tmp(i)
        sa(cnt(rank(v))) = v
        cnt(rank(v)) += 1
        i += 1
      }
      // re-rank: equal iff both (rank, rank+k) keys equal
      newRank(sa(0)) = 0
      classes = 1
      i = 1
      while (i < n) {
        val a = sa(i); val b = sa(i - 1)
        val ra2 = if (a + k < n) rank(a + k) else -1
        val rb2 = if (b + k < n) rank(b + k) else -1
        if (rank(a) != rank(b) || ra2 != rb2) classes += 1
        newRank(a) = classes - 1
        i += 1
      }
      System.arraycopy(newRank, 0, rank, 0, n)
      k <<= 1
    }
    sa
  }

  /** LCP array (Kasai et al.): lcp(i) = longest common prefix of the
    * suffixes at sa(i-1) and sa(i); lcp(0) = 0. */
  def lcpArray(s: Array[Int], sa: Array[Int]): Array[Int] = {
    val n = s.length
    val lcp = new Array[Int](n)
    if (n == 0) return lcp
    val rank = new Array[Int](n)
    var i = 0
    while (i < n) { rank(sa(i)) = i; i += 1 }
    var h = 0
    i = 0
    while (i < n) {
      if (rank(i) > 0) {
        val j = sa(rank(i) - 1)
        while (i + h < n && j + h < n && s(i + h) == s(j + h)) h += 1
        lcp(rank(i)) = h
        if (h > 0) h -= 1
      } else h = 0
      i += 1
    }
    lcp
  }

  /** All containment pairs within one shard: (i, j) doc-index pairs
    * where texts(i) is a substring of texts(j) and texts(i) !=
    * texts(j). Exact — every occurrence is found via the generalized
    * SA: text i is contained in text j iff some suffix of the
    * concatenation starting inside j shares a prefix of length
    * len(i) with the suffix at i's start, i.e. sits in the LCP >=
    * len(i) interval around i's start suffix. Unique per-doc
    * sentinels make cross-doc run-ons impossible.
    *
    * Memory: ~20 bytes per concatenated char (symbol + sa + lcp +
    * rank + doc-of arrays) — the caller bounds the shard.
    */
  def containmentPairs(texts: Array[String]): Set[(Int, Int)] = {
    val nd = texts.length
    if (nd < 2) return Set.empty
    val total = texts.iterator.map(_.length.toLong + 1L).sum
    require(total <= Int.MaxValue / 2,
      s"shard too large for one generalized SA: $total symbols")
    val n = total.toInt
    // symbols: char + nd + 1 (so every char outranks every sentinel);
    // sentinel for doc d = d + 1 (unique, > 0)
    val s = new Array[Int](n)
    val docOf = new Array[Int](n)
    val docStart = new Array[Int](nd)
    var p = 0
    var d = 0
    while (d < nd) {
      docStart(d) = p
      val t = texts(d)
      var q = 0
      while (q < t.length) { s(p) = t.charAt(q) + nd + 1; docOf(p) = d; p += 1; q += 1 }
      s(p) = d + 1; docOf(p) = d; p += 1
      d += 1
    }
    val sa = suffixArray(s)
    val lcp = lcpArray(s, sa)
    val rankOf = new Array[Int](n)
    var i = 0
    while (i < n) { rankOf(sa(i)) = i; i += 1 }

    val out = mutable.HashSet.empty[(Int, Int)]
    d = 0
    while (d < nd) {
      val len = texts(d).length
      if (len > 0) {
        val r = rankOf(docStart(d))
        // walk the LCP >= len interval around rank r in both directions
        var up = r
        while (up > 0 && lcp(up) >= len) {
          up -= 1
          val j = docOf(sa(up))
          if (j != d && texts(j).length > len) out += ((d, j))
        }
        var dn = r + 1
        while (dn < n && lcp(dn) >= len) {
          val j = docOf(sa(dn))
          if (j != d && texts(j).length > len) out += ((d, j))
          dn += 1
        }
      }
      d += 1
    }
    out.toSet
  }
}
