package graft.wheel

import java.util.concurrent.ConcurrentHashMap
import org.apache.spark.sql.DataFrame

/** Process-wide cache of built [[WheelIndex]]es. Mirrors the reference's
  * build-once / query-many lifecycle (/root/reference/src/main.rs:48–68):
  * the wheel is built one time, then serves thousands of range queries at
  * microsecond latency with no further Spark jobs. */
object WheelCatalog {
  private val cache = new ConcurrentHashMap[(String, String, String), WheelIndex]()

  /** Build (or return the cached) index for a logical source key. The
    * source DataFrame thunk is only evaluated on a cache miss. */
  def cached(key: String, tsCol: String = "ts", valueCol: String = "value")(
      events: => DataFrame): WheelIndex =
    cache.computeIfAbsent((key, tsCol, valueCol),
      _ => WheelIndex.build(events, tsCol, valueCol))

  def clear(): Unit = { cache.clear(); distinctCache.clear() }

  private val distinctCache = new ConcurrentHashMap[(String, String, String), DistinctWheel]()

  /** Build-once cache for the HLL [[DistinctWheel]], same lifecycle. */
  def cachedDistinct(key: String, tsCol: String = "ts", keyCol: String = "user_id")(
      events: => DataFrame): DistinctWheel =
    distinctCache.computeIfAbsent((key, tsCol, keyCol),
      _ => DistinctWheel.build(events, tsCol, keyCol))
}
