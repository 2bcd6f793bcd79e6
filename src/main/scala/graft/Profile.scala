package graft

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Noise-free per-query profiling harness (optimization rounds): runs the
  * named queries to the noop sink and reports SCHEDULER FACTS — job count,
  * task count, input bytes, shuffle write records/bytes — which are
  * identical on every run regardless of host CPU steal (the same
  * rationale as [[graft.wheel.JobMetrics]], extended to shuffle volume).
  * Wall-clock rides along for orientation only.
  *
  * Usage: runMain graft.Profile <sfDir> q_a,q_b,...   Not part of the
  * driver contract.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").map(_.trim).filter(_.nonEmpty)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def profiled(f: => Unit): (Int, Int, Long, Long, Long, Long) = {
      val jobs = new AtomicInteger()
      val tasks = new AtomicInteger()
      val input = new AtomicLong()
      val swBytes = new AtomicLong()
      val swRecs = new AtomicLong()
      val srBytes = new AtomicLong()
      val listener = new SparkListener {
        override def onJobStart(j: SparkListenerJobStart): Unit =
          jobs.incrementAndGet()
        override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
          tasks.incrementAndGet()
          if (t.taskMetrics != null) {
            input.addAndGet(t.taskMetrics.inputMetrics.bytesRead)
            swBytes.addAndGet(t.taskMetrics.shuffleWriteMetrics.bytesWritten)
            swRecs.addAndGet(t.taskMetrics.shuffleWriteMetrics.recordsWritten)
            srBytes.addAndGet(t.taskMetrics.shuffleReadMetrics.totalBytesRead)
          }
        }
      }
      spark.sparkContext.addSparkListener(listener)
      try {
        f
        var last = (-1, -1L); var stable = 0; var waited = 0
        while (stable < 3 && waited < 100) {
          Thread.sleep(50)
          val now = (tasks.get(), swRecs.get() + input.get())
          if (now == last) stable += 1 else stable = 0
          last = now; waited += 1
        }
        (jobs.get(), tasks.get(), input.get(), swBytes.get(), swRecs.get(),
          srBytes.get())
      } finally spark.sparkContext.removeSparkListener(listener)
    }

    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      (1 to 2).foreach { i =>
        graft.plans.WheelAcceleration.clear()
        val t0 = System.nanoTime()
        val (jobs, tasks, in, swB, swR, srB) = profiled {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        }
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"[profile] $n run$i: jobs=$jobs tasks=$tasks " +
          f"input=${in / 1024}%dKB shufW=${swB / 1024}%dKB " +
          f"shufRecs=$swR shufR=${srB / 1024}%dKB wall=$sec%.2fs")
      }
    }
    spark.stop()
  }
}
