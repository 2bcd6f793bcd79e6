package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Round 17 (optimization): the allocation-free shingle-hash walk inside
  * [[TextHash.minHashSignature]] must be BIT-IDENTICAL to hashing the
  * materialized shingle strings — signatures feed LSH band keys, so one
  * changed bit re-buckets documents and changes q_minhash_dedup /
  * q_dedup_clusters output. */
class TextHashSpec extends AnyFunSuite {

  private val cases = Seq(
    "the quick brown fox jumps over the lazy dog",
    "a b c",            // exactly ShingleSize words
    "a b",              // fewer than ShingleSize words
    "single",           // one word
    "",                 // empty text (one empty word)
    "double  space ok", // split(' ') yields an empty word
    " leading and trailing ",
    "unicode é世 words mixed in text"
  )

  test("fnv1aJoined equals fnv1a over the materialized joined string") {
    cases.foreach { text =>
      val words = text.split(' ')
      // whole-text join (the short-text branch)
      assert(TextHash.fnv1aJoined(words, 0, words.length) ==
        TextHash.fnv1a(words.mkString(" ")), s"whole-text diverged: '$text'")
      // every ShingleSize window (the sliding branch)
      if (words.length > TextHash.ShingleSize) {
        (0 to words.length - TextHash.ShingleSize).foreach { i =>
          val joined = words.slice(i, i + TextHash.ShingleSize).mkString(" ")
          assert(TextHash.fnv1aJoined(words, i, TextHash.ShingleSize) ==
            TextHash.fnv1a(joined), s"window $i diverged: '$text'")
        }
      }
    }
  }

  test("signature base matches the shingles+fnv1a spelling end-to-end") {
    cases.foreach { text =>
      val words = text.split(' ')
      val optimized: Seq[Long] =
        if (words.length <= TextHash.ShingleSize)
          Seq(TextHash.fnv1aJoined(words, 0, words.length))
        else (0 to words.length - TextHash.ShingleSize)
          .map(i => TextHash.fnv1aJoined(words, i, TextHash.ShingleSize))
      val viaStrings = TextHash.shingles(text).map(TextHash.fnv1a).toSeq
      assert(optimized == viaStrings, s"shingle hash base diverged: '$text'")
    }
  }

  /** The pre-round-17 vote-loop spelling, kept as the parity oracle for
    * the bit-sliced simHash. */
  private def simHashViaVotes(text: String): Long = {
    val votes = new Array[Int](64)
    text.split(' ').foreach { w =>
      val h = TextHash.fnv1a(w)
      var i = 0
      while (i < 64) {
        if (((h >>> i) & 1L) == 1L) votes(i) += 1 else votes(i) -= 1
        i += 1
      }
    }
    var out = 0L
    var i = 0
    while (i < 64) {
      if (votes(i) > 0) out |= 1L << i
      i += 1
    }
    out
  }

  test("bit-sliced simHash equals the vote-loop spelling (ties included)") {
    // the fixed cases plus generated texts with EVEN word counts (vote
    // ties land on exactly 2·set == n, the boundary the strict > must
    // preserve) and repeated words (deep carry ripples)
    val gen = (1 to 40).map(k => (1 to k).map(i => s"w${i % 7}").mkString(" "))
    (cases ++ gen).foreach { text =>
      assert(TextHash.simHash(text) == simHashViaVotes(text),
        s"simhash diverged for: '$text'")
    }
  }

  test("signatures and band keys are deterministic and well-shaped") {
    val text = "pack my box with five dozen liquor jugs pack my box"
    val sig = TextHash.minHashSignature(text)
    assert(sig.sameElements(TextHash.minHashSignature(text)))
    assert(sig.length == TextHash.MinHashPerms)
    assert(TextHash.bandKeys(sig).length == TextHash.Bands)
  }
}
