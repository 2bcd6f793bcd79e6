package graft.functions

/** Deterministic corpus-trained byte-pair encoding (round 14, VERDICT
  * r13 #6): the classic Sennrich et al. 2016 algorithm — train merge
  * rules on word frequencies, encode by applying merges in rank order —
  * so the pipeline family's token budgets (`q_data_mixture`,
  * `q_pack_sequences`) can count SUBWORD tokens instead of the
  * whitespace/regex approximation.
  *
  * Scale split: the WORD-FREQUENCY table is the distributed part (one
  * groupBy over the corpus — at 100 TB that is the same shuffle any
  * vocab build pays); training then runs on the DRIVER over the top-K
  * words only (capped input, O(merges × vocab) with a small constant),
  * and the learned ranks broadcast to executors for the encode scan.
  * Everything is deterministic: ties in pair frequency break
  * lexicographically, the top-K word cut breaks (count desc, word asc),
  * so two runs over the same corpus learn byte-identical merge tables.
  *
  * Tokens are lowercase word chunks; each word ends with the [[Eow]]
  * marker symbol (word-final merges learn distinct units, e.g. `ing</w>`
  * vs `ing`). A trailing UNMERGED marker carries no text and does not
  * count toward token counts. */
object Bpe {

  val Eow = "</w>"

  /** FROZEN merge table (round 15, VERDICT r14 #5): trained ONCE by
    * [[train]] over the sf0.001 `documents` word frequencies (top-2000
    * cut, 60-merge budget — the same deterministic recipe as
    * `q_bpe_tokens`) and committed as a versioned artifact, the way a
    * production pipeline freezes its tokenizer instead of retraining
    * per batch. `q_pack_bpe` budgets its packing on counts under these
    * ranks, and the DuckDB oracle inlines the SAME 60 pairs to replay
    * the encode — which is what makes subword-count arithmetic
    * oracle-checkable at all. */
  val FrozenMerges: Seq[(String, String)] = Seq(
    ("e", "r"), ("e", "</w>"), ("n", "</w>"), ("o", "r"), ("t", "</w>"),
    ("er", "</w>"), ("o", "w"), ("ow", "</w>"), ("l", "u"), ("i", "n"),
    ("y", "</w>"), ("a", "r"), ("p", "ar"), ("g", "</w>"), ("a", "s"),
    ("h", "</w>"), ("a", "</w>"), ("s", "t"), ("a", "t"), ("a", "n</w>"),
    ("c", "an</w>"), ("s", "can</w>"), ("c", "o"), ("co", "lu"),
    ("colu", "m"), ("colum", "n</w>"), ("d", "ow</w>"), ("in", "dow</w>"),
    ("w", "indow</w>"), ("d", "er</w>"), ("or", "der</w>"), ("or", "t</w>"),
    ("s", "ort</w>"), ("p", "</w>"), ("par", "t</w>"), ("u", "p</w>"),
    ("a", "g"), ("ag", "g</w>"), ("a", "lu"), ("alu", "e</w>"),
    ("v", "alue</w>"), ("in", "e</w>"), ("l", "ine</w>"), ("e", "y</w>"),
    ("k", "ey</w>"), ("i", "n</w>"), ("j", "o"), ("jo", "in</w>"),
    ("er", "g"), ("erg", "e</w>"), ("m", "erge</w>"), ("er", "y</w>"),
    ("g", "r"), ("gr", "o"), ("gro", "up</w>"), ("q", "u"),
    ("qu", "ery</w>"), ("c", "t"), ("ct", "or"), ("ctor", "</w>"))

  /** One training word: its symbol sequence and corpus count. */
  private def symbols(word: String): Vector[String] =
    word.map(_.toString).toVector :+ Eow

  /** Replace every adjacent (a, b) occurrence with the merged symbol —
    * left-to-right, non-overlapping (the standard BPE merge step). */
  private def mergeOnce(syms: Vector[String], a: String, b: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += a + b
        i += 2
      } else {
        out += syms(i)
        i += 1
      }
    }
    out.result()
  }

  /** Learn up to `numMerges` merge rules from (word, count) frequencies.
    * Stops early when no pair occurs at least twice (merging a
    * singleton pair memorizes noise). Deterministic: the best pair is
    * max by (count, then LEXICOGRAPHICALLY SMALLEST (a, b)). */
  def train(wordCounts: Seq[(String, Long)], numMerges: Int): Seq[(String, String)] = {
    var words: Vector[(Vector[String], Long)] =
      wordCounts.toVector.map { case (w, c) => (symbols(w), c) }
    val merges = Seq.newBuilder[(String, String)]
    var done = false
    var n = 0
    while (n < numMerges && !done) {
      val pairCounts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, c) =>
        var i = 0
        while (i + 1 < syms.length) {
          val p = (syms(i), syms(i + 1))
          pairCounts.update(p, pairCounts.getOrElse(p, 0L) + c)
          i += 1
        }
      }
      val best = pairCounts.foldLeft(Option.empty[((String, String), Long)]) {
        case (acc, (p, c)) => acc match {
          case Some((bp, bc)) if bc > c ||
            (bc == c && orderPair(bp, p) <= 0) => acc
          case _ => Some((p, c))
        }
      }
      best match {
        case Some(((a, b), c)) if c >= 2L =>
          merges += ((a, b))
          words = words.map { case (syms, cnt) => (mergeOnce(syms, a, b), cnt) }
          n += 1
        case _ => done = true
      }
    }
    merges.result()
  }

  private def orderPair(x: (String, String), y: (String, String)): Int = {
    val c = x._1.compareTo(y._1)
    if (c != 0) c else x._2.compareTo(y._2)
  }

  /** Encode one word by applying the learned merges in RANK order
    * (lowest rank first) until none applies — the standard BPE encode.
    * Returns the symbol sequence, marker included when unmerged. */
  def encode(word: String, ranks: Map[(String, String), Int]): Vector[String] = {
    var syms = symbols(word)
    var continue = syms.length > 1
    while (continue) {
      var bestRank = Int.MaxValue
      var bestIdx = -1
      var i = 0
      while (i + 1 < syms.length) {
        ranks.get((syms(i), syms(i + 1))).foreach { r =>
          if (r < bestRank) { bestRank = r; bestIdx = i }
        }
        i += 1
      }
      if (bestIdx < 0) continue = false
      else syms = mergeOnce(syms, syms(bestIdx), syms(bestIdx + 1))
      if (syms.length < 2) continue = false
    }
    syms
  }

  /** Subword token count of a whitespace-split, lowercased text under
    * the learned ranks. A word's trailing standalone [[Eow]] marker
    * carries no text and is not counted. Per-partition word memoization
    * belongs to the CALLER (the same word repeats constantly in prose). */
  def countWordTokens(word: String, ranks: Map[(String, String), Int]): Int = {
    val syms = encode(word, ranks)
    if (syms.nonEmpty && syms.last == Eow) syms.length - 1 else syms.length
  }
}

/** Executor-side token counter over BROADCAST ranks with a bounded
  * per-executor word memo (prose repeats the same words constantly; the
  * broadcast value is shared by every task on the executor, so the memo
  * amortizes across the whole scan). Ship via
  * `sparkContext.broadcast(new BpeCounter(ranks))`. */
final class BpeCounter(ranks: Map[(String, String), Int]) extends Serializable {
  @transient private lazy val memo =
    new java.util.concurrent.ConcurrentHashMap[String, Integer]()
  private val MemoCap = 1 << 17

  def tokens(text: String): Long = {
    if (text == null) return 0L
    var total = 0L
    val words = text.toLowerCase(java.util.Locale.ROOT).split("\\s+")
    var i = 0
    while (i < words.length) {
      val w = words(i)
      if (w.nonEmpty) {
        var n = memo.get(w)
        if (n == null) {
          n = Bpe.countWordTokens(w, ranks)
          if (memo.size < MemoCap) memo.put(w, n)
        }
        total += n.intValue()
      }
      i += 1
    }
    total
  }
}
