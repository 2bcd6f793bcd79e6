package graft.wheel

import java.util.concurrent.{ConcurrentHashMap, CopyOnWriteArrayList}
import org.apache.spark.SparkContext
import org.apache.spark.scheduler.{SparkListener, SparkListenerApplicationEnd}
import org.apache.spark.sql.SparkSession

/** Runs registered cache sweeps when a tracked session stops, so
  * session-keyed caches (WheelCatalog, Similarity's normalized-embedding
  * cache) release a stopped session's pinned DataFrames immediately
  * instead of on the next cache call that happens to run a sweep
  * (ADVICE r4: entries were retained indefinitely if no further calls
  * occurred).
  *
  * One listener per SparkContext; the tracking entry removes itself when
  * the listener fires so this map never retains stopped contexts. */
object SessionSweeper {

  private val sweeps = new CopyOnWriteArrayList[Runnable]()
  private val tracked = new ConcurrentHashMap[SparkContext, java.lang.Boolean]()

  /** Register a sweep callback (idempotent drop of stopped-session
    * entries). Called once per cache at class-init time. */
  def addSweep(sweep: Runnable): Unit = sweeps.add(sweep)

  /** Ensure `spark`'s context triggers the sweeps when it stops.
    * Cheap no-op after the first call per context. */
  def track(spark: SparkSession): Unit = {
    val sc = spark.sparkContext
    tracked.computeIfAbsent(sc, _ => {
      sc.addSparkListener(new SparkListener {
        override def onApplicationEnd(e: SparkListenerApplicationEnd): Unit = {
          // isStopped is already true here (SparkContext.stop() flips it
          // before posting ApplicationEnd), so the sweeps see the
          // stopped state; drop our own entry too.
          tracked.remove(sc)
          sweeps.forEach(_.run())
        }
      })
      java.lang.Boolean.TRUE
    })
    ()
  }
}
