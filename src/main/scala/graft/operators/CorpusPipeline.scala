package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end corpus cleaning — the composition a real training-data
  * pipeline runs over raw documents, built entirely from the operators
  * this library already exposes piecewise (quality scoring, exact
  * dedup, language filtering, decontamination):
  *
  *   1. structural quality gates (word count, average word length);
  *   2. language allowlist;
  *   3. exact dedup keeping the lowest doc_id per content hash;
  *   4. (optional) test-set decontamination — drop docs sharing any
  *      K-token shingle with a held-out set.
  *
  * Each document gets a single `drop_reason` (null = kept, first
  * failing gate wins, in the order above), so the output is an
  * auditable ledger rather than a silent filter; [[stats]] aggregates
  * it into the per-reason counts every pipeline run should log.
  *
  * Scale posture: gates are codegen expressions (one pass); dedup is a
  * window rank over the content hash — one hash-shuffle, no driver
  * state, no collect. */
object CorpusPipeline {

  final case class Config(
      minWords: Int = 5,
      maxAvgWordLen: Double = 20.0,
      langs: Set[String] = Set.empty) // empty = all languages pass

  /** Annotate every document with its fate; keeps all input columns.
    *
    * Dedup keeper selection is a min-aggregate + join, NOT a window
    * rank: a mega-duplicate (a million copies of one boilerplate text)
    * hits the aggregate as map-side-combined partials across all tasks,
    * where a `row_number` window would sort the whole hot hash in a
    * single task. */
  def annotate(docs: DataFrame, cfg: Config = Config()): DataFrame = {
    val nWords = size(split(col("text"), " ")).cast("long")
    val avgWlen = length(regexp_replace(col("text"), " ", "")).cast("double") / nWords
    val langOk =
      if (cfg.langs.isEmpty) lit(true)
      else col("lang").isin(cfg.langs.toSeq.sorted: _*)
    val hashed = docs.withColumn("__hash", md5(col("text")))
    val keepers = hashed.groupBy(col("__hash"))
      .agg(min(col("doc_id")).as("__keeper"))
    hashed.join(keepers, "__hash")
      .withColumn("drop_reason",
        when(nWords < cfg.minWords, "too_short")
          .when(avgWlen > cfg.maxAvgWordLen, "gibberish_word_len")
          .when(!langOk, "lang_filtered")
          .when(col("doc_id") =!= col("__keeper"), "exact_duplicate")
          .otherwise(lit(null).cast("string")))
      .drop("__hash", "__keeper")
      .select(docs.columns.map(col) :+ col("drop_reason"): _*)
  }

  /** Only the surviving documents (original schema). */
  def clean(docs: DataFrame, cfg: Config = Config()): DataFrame =
    annotate(docs, cfg).filter(col("drop_reason").isNull).drop("drop_reason")

  /** Decontamination gate: annotate docs sharing any `k`-token shingle
    * with `testSet` as `"contaminated"` (docs already carrying a
    * drop_reason keep their earlier, higher-priority reason). Shingle
    * explode on both sides + ONE left-semi-shaped join — linear, no
    * doc-pair work, the same shape as the declared `q_contamination`. */
  def decontaminate(annotated: DataFrame, testSet: DataFrame, k: Int = 8): DataFrame = {
    def shingled(df: DataFrame) = {
      val toks = split(col("text"), " ")
      df.filter(size(toks) >= k)
        .select(col("doc_id"), explode(transform(
          sequence(lit(1), size(toks) - (k - 1)),
          i => concat_ws(" ", slice(toks, i, lit(k))))).as("__sh"))
    }
    val testShingles = shingled(testSet).select(col("__sh")).distinct()
    val contaminated = shingled(annotated)
      .join(testShingles, "__sh")
      .select(col("doc_id")).distinct()
      .withColumn("__contam", lit(true))
    annotated.join(contaminated, Seq("doc_id"), "left")
      .withColumn("drop_reason",
        coalesce(col("drop_reason"),
          when(col("__contam"), "contaminated").cast("string")))
      .drop("__contam")
  }

  /** Per-reason ledger: (reason, n) with `kept` for survivors. */
  def stats(annotated: DataFrame): DataFrame =
    annotated
      .groupBy(coalesce(col("drop_reason"), lit("kept")).as("reason"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("reason"))
}
