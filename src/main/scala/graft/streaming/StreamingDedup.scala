package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming exact deduplication — the streaming face of the batch
  * `q_dedup_exact` operator (LLM-pipeline ingest: drop exact-duplicate
  * documents as they arrive, not in a nightly batch).
  *
  * Built on `dropDuplicatesWithinWatermark`: state holds one entry per
  * distinct content hash seen within the watermark horizon and is
  * evicted as event time advances — bounded state, unlike a global
  * `dropDuplicates` whose state grows forever on an unbounded stream.
  * The hash (not the full text) is the dedup key, so state rows are
  * small and fixed-width regardless of document size. */
object StreamingDedup {

  /** First occurrence of each distinct `textCol` value within the
    * watermark window survives; later exact duplicates are dropped. */
  def dedup(docs: DataFrame, tsCol: String, textCol: String,
      watermarkDelay: String = "10 minutes"): DataFrame =
    docs
      .withColumn("__graft_hash", md5(col(textCol)))
      .withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark("__graft_hash")
      .drop("__graft_hash")
}
