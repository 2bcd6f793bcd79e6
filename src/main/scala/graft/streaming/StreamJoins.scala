package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming join surface (SURVEY.md §2.5): the two join shapes
  * Structured Streaming supports natively, wrapped with the watermark
  * discipline that keeps their state bounded.
  *
  *  - stream⋈static: per-micro-batch hash join against a (broadcastable)
  *    dimension — no state at all, the enrichment shape;
  *  - stream⋈stream interval join: both sides watermarked and the join
  *    condition bounded by an event-time interval, so each side's state
  *    evicts as the watermark passes — without the interval bound the
  *    state would grow forever. */
object StreamJoins {

  /** Enrich a stream with a static dimension (broadcast if small). */
  def enrichWithStatic(stream: DataFrame, dim: DataFrame, key: String): DataFrame =
    stream.join(broadcast(dim), key)

  /** Stream-stream inner join on `key` where the right event's time is
    * within `[left.time, left.time + withinMs]` — the bounded-state
    * interval join (e.g. click ⋈ subsequent purchase within an hour). */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, withinMs: Long,
      watermarkDelay: String = "10 minutes"): DataFrame = {
    val l = left.withWatermark(leftTs, watermarkDelay)
    val r = right.withWatermark(rightTs, watermarkDelay)
    l.join(r,
      l(key) === r(key) &&
        r(rightTs) >= l(leftTs) &&
        r(rightTs) <= l(leftTs) + expr(s"INTERVAL ${withinMs / 1000} SECONDS"))
  }
}
