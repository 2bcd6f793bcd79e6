package graft.functions

/** Deterministic text hashing/sketching primitives for the LLM-pipeline
  * operators (dedup, near-dup, fingerprinting). Pure JVM — used inside
  * Spark UDFs where no built-in expression expresses the semantics
  * (SURVEY.md §2.6 `q_minhash_dedup`; the aggregator-framework extension
  * point of SURVEY.md §2.2).
  *
  * All constants are fixed so signatures are reproducible across runs,
  * partitions, and executors.
  */
object TextHash extends Serializable {

  /** FNV-1a 64-bit — tiny, allocation-free, stable across JVMs. */
  def fnv1a(s: String): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) {
      h ^= s.charAt(i).toLong
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  val MinHashPerms = 32
  val ShingleSize = 3
  val Bands = 8
  val RowsPerBand: Int = MinHashPerms / Bands

  // Deterministic permutation multipliers (odd) and offsets, seed 42.
  private val perms: Array[(Long, Long)] = {
    val r = new scala.util.Random(42)
    Array.fill(MinHashPerms)((r.nextLong() | 1L, r.nextLong()))
  }

  /** Word shingles of size [[ShingleSize]] (whole text if shorter). */
  def shingles(text: String): Array[String] = {
    val words = text.split(' ')
    if (words.length <= ShingleSize) Array(words.mkString(" "))
    else words.sliding(ShingleSize).map(_.mkString(" ")).toArray
  }

  /** fnv1a of the space-joined words `ws(from until from+n)` without
    * materializing the joined string — BIT-IDENTICAL to
    * `fnv1a(ws.slice(from, from+n).mkString(" "))` (asserted in
    * TextHashSpec): fnv1a is a left-to-right char fold, so walking the
    * word chars with a literal ' ' between words is the same fold. */
  private[functions] def fnv1aJoined(ws: Array[String], from: Int, n: Int): Long = {
    var h = 0xcbf29ce484222325L
    var wi = from
    while (wi < from + n) {
      if (wi > from) { h ^= ' '.toLong; h *= 0x100000001b3L }
      val w = ws(wi)
      var i = 0
      while (i < w.length) {
        h ^= w.charAt(i).toLong
        h *= 0x100000001b3L
        i += 1
      }
      wi += 1
    }
    h
  }

  /** MinHash signature: per permutation, min over shingle hashes.
    * Round 17: shingle hashes are computed by [[fnv1aJoined]] straight
    * off the word array — the old `shingles(text).map(fnv1a)` built a
    * fresh String + iterator per shingle (the dominant allocation of the
    * minhash UDF, run once per document in q_minhash_dedup /
    * q_dedup_clusters); values are unchanged (TextHashSpec parity). */
  def minHashSignature(text: String): Array[Long] = {
    val words = text.split(' ')
    val base: Array[Long] =
      if (words.length <= ShingleSize) Array(fnv1aJoined(words, 0, words.length))
      else Array.tabulate(words.length - ShingleSize + 1)(
        i => fnv1aJoined(words, i, ShingleSize))
    perms.map { case (a, b) =>
      var m = Long.MaxValue
      var i = 0
      while (i < base.length) {
        val v = a * base(i) + b
        if (v < m) m = v
        i += 1
      }
      m
    }
  }

  /** LSH band keys: hash of each [[RowsPerBand]]-slot signature chunk.
    * Two docs sharing any band key are candidate near-duplicates. */
  def bandKeys(sig: Array[Long]): Array[Long] = {
    Array.tabulate(Bands) { b =>
      var h = 0xcbf29ce484222325L ^ b.toLong
      var i = b * RowsPerBand
      while (i < (b + 1) * RowsPerBand) {
        h ^= sig(i)
        h *= 0x100000001b3L
        i += 1
      }
      h
    }
  }

  /** Exact word-shingle Jaccard (test oracle for the MinHash estimate). */
  def jaccard(a: String, b: String): Double = {
    val sa = shingles(a).toSet
    val sb = shingles(b).toSet
    if (sa.isEmpty && sb.isEmpty) 1.0
    else sa.intersect(sb).size.toDouble / sa.union(sb).size.toDouble
  }

  /** 64-bit SimHash over word hashes (bit-vote).
    *
    * Round 17: bit-sliced vote counting — the ±1 vote loop cost
    * 64 branchy ops per word (the dominant per-row work of
    * q_simhash_dedup at sf1); a ripple-carry add of each whole 64-bit
    * hash into per-position counter BITPLANES counts all 64 positions
    * at once in amortized ~2 bitwise ops per word. Votes(i) > 0 ⟺
    * 2·setCount(i) > n, so the emitted hash is BIT-IDENTICAL to the
    * vote loop (parity-asserted in TextHashSpec against the old
    * spelling, ties included). */
  def simHash(text: String): Long = {
    val words = text.split(' ')
    val n = words.length
    // planes(j) bit i = j-th bit of the count of set bit-i across all
    // word hashes; counts ≤ n < 2^31 so the ripple never passes j = 31
    val planes = new Array[Long](33)
    var wi = 0
    while (wi < n) {
      var carry = fnv1a(words(wi))
      var j = 0
      while (carry != 0L) {
        val t = planes(j) & carry
        planes(j) ^= carry
        carry = t
        j += 1
      }
      wi += 1
    }
    var out = 0L
    var i = 0
    while (i < 64) {
      var cnt = 0L
      var j = 0
      while (j < 33) {
        cnt |= ((planes(j) >>> i) & 1L) << j
        j += 1
      }
      if (2L * cnt > n.toLong) out |= 1L << i // votes(i) > 0 ⟺ 2·set > n
      i += 1
    }
    out
  }

  /** 16-bit chunks of a simhash — pigeonhole banding: hamming distance
    * ≤ 3 ⇒ at least one of the 4 chunks is identical. */
  def simHashChunks(h: Long): Array[Long] =
    Array.tabulate(4)(i => ((h >>> (i * 16)) & 0xffffL) | (i.toLong << 32))

  // Winnowing (rolling-hash document fingerprinting, Schleimer/Wilkerson/
  // Aiken "Winnowing: Local Algorithms for Document Fingerprinting",
  // SIGMOD 2003 — public algorithm): k-gram Rabin-Karp rolling hashes,
  // one fingerprint per w-window (rightmost minimum). Guarantee: any
  // shared substring of length ≥ w + k - 1 contributes at least one
  // shared fingerprint, so near-identical documents overlap heavily.
  val WinnowK = 8
  val WinnowW = 6
  private val RkBase = 1000003L
  private val RkBasePowK: Long = {
    var p = 1L
    (1 until WinnowK).foreach(_ => p *= RkBase)
    p
  }

  /** Rolling Rabin-Karp hashes of all k-grams (mod 2⁶⁴), O(n). */
  def rollingHashes(s: String, k: Int = WinnowK): Array[Long] = {
    if (s == null || s.length < k) return Array.empty
    val out = new Array[Long](s.length - k + 1)
    var h = 0L
    var i = 0
    while (i < k) { h = h * RkBase + s.charAt(i); i += 1 }
    out(0) = h
    while (i < s.length) {
      h = (h - s.charAt(i - k) * RkBasePowK) * RkBase + s.charAt(i)
      out(i - k + 1) = h
      i += 1
    }
    out
  }

  /** Winnowed fingerprint set: per sliding window of [[WinnowW]] hashes,
    * the RIGHTMOST minimum (the paper's robust-winnowing tie rule);
    * consecutive duplicate picks collapse. Sorted distinct output so the
    * set is canonical. */
  def winnow(s: String, k: Int = WinnowK, w: Int = WinnowW): Array[Long] = {
    val hs = rollingHashes(s, k)
    if (hs.isEmpty) return Array.empty
    if (hs.length <= w) return Array(hs.min).distinct
    val picks = scala.collection.mutable.LinkedHashSet.empty[Long]
    var start = 0
    while (start + w <= hs.length) {
      var best = start
      var i = start
      while (i < start + w) {
        // unsigned compare; >= keeps the rightmost minimum
        if (java.lang.Long.compareUnsigned(hs(i), hs(best)) <= 0) best = i
        i += 1
      }
      picks += hs(best)
      start += 1
    }
    picks.toArray.sorted
  }
}
