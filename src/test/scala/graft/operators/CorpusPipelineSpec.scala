package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.queries.Q

class CorpusPipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("gates fire in order and the ledger adds up on synthetic docs") {
    import spark.implicits._
    val docs = Seq(
      (0L, "one two three four five six", "en"),   // kept
      (1L, "too short", "en"),                     // too_short
      (2L, "one two three four five six", "en"),   // exact dup of 0
      (3L, "uno dos tres cuatro cinco seis", "es"),// lang_filtered
      (4L, "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaa bbbbbbbbbbbbbbbbbbbbbbbbbb " +
        "cccccccccccccccccccccccccc dddddddddddddddddddddddddd " +
        "eeeeeeeeeeeeeeeeeeeeeeeeee", "en"))       // gibberish_word_len
      .toDF("doc_id", "text", "lang")
    val cfg = CorpusPipeline.Config(minWords = 5, maxAvgWordLen = 20.0,
      langs = Set("en"))
    val annotated = CorpusPipeline.annotate(docs, cfg)
    val fates = annotated.orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> Option(r.getString(3)).getOrElse("kept")).toMap
    assert(fates == Map(0L -> "kept", 1L -> "too_short", 2L -> "exact_duplicate",
      3L -> "lang_filtered", 4L -> "gibberish_word_len"))
    val ledger = CorpusPipeline.stats(annotated).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(ledger.values.sum == 5L)
    assert(ledger("kept") == 1L)
    val cleaned = CorpusPipeline.clean(docs, cfg)
    assert(cleaned.columns.toSeq == Seq("doc_id", "text", "lang"))
    assert(cleaned.collect().map(_.getLong(0)).toSeq == Seq(0L))
  }

  test("decontamination flags shingle overlap without disturbing earlier fates") {
    import spark.implicits._
    val docs = Seq(
      (0L, "alpha beta gamma delta epsilon zeta", "en"),  // contaminated (shares 4-shingle)
      (1L, "one two three four five six", "en"),          // kept
      (2L, "tiny", "en"),                                 // too_short (higher priority)
      (3L, "a b", "en"))                                  // too_short; < k tokens, must not crash
      .toDF("doc_id", "text", "lang")
    val testSet = Seq((100L, "xx alpha beta gamma delta yy", "en"))
      .toDF("doc_id", "text", "lang")
    val annotated = CorpusPipeline.annotate(docs,
      CorpusPipeline.Config(minWords = 5))
    val out = CorpusPipeline.decontaminate(annotated, testSet, k = 4)
    val fates = out.orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> Option(r.getString(3)).getOrElse("kept")).toMap
    assert(fates == Map(0L -> "contaminated", 1L -> "kept",
      2L -> "too_short", 3L -> "too_short"))
  }

  test("on the fixture corpus: every doc gets exactly one fate; dedup keeps min id") {
    val docs = Q.t(spark, TestSpark.Sf01, "documents")
    val annotated = CorpusPipeline.annotate(docs)
    assert(annotated.count() == docs.count())
    // duplicates: for every content hash, exactly one survivor = min doc_id
    val dupes = docs.groupBy(md5(col("text")).as("h"))
      .agg(min(col("doc_id")).as("keeper"), count(lit(1)).as("n"))
      .filter(col("n") > 1)
    assert(dupes.count() > 0) // sf0.1 has exact dups
    val dropped = annotated.filter(col("drop_reason") === "exact_duplicate")
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    dupes.collect().foreach { r =>
      assert(!dropped.contains(r.getLong(1)), "the canonical doc must survive dedup")
    }
  }
}
