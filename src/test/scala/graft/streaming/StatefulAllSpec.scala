package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Custom per-key state via mapGroupsWithState: running partials update
  * across micro-batches exactly like repeated wheel inserts. */
class StatefulAllSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("per-key running All aggregate accumulates across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, Double)]
    val q = StatefulAll.perKeyRunningAll(mem.toDS())
      .writeStream.outputMode(StatefulAll.RequiredOutputMode)
      .format("memory").queryName("stateful_all_sink").start()
    try {
      mem.addData(Seq((1L, 2.0), (1L, 4.0), (2L, 10.0)))
      q.processAllAvailable()
      mem.addData(Seq((1L, 9.0)))
      q.processAllAvailable()
      // update mode: the sink keeps every emitted update; the LAST row
      // per key is the current state
      val rows = spark.table("stateful_all_sink").collect()
        .map(r => (r.getLong(0), (r.getDouble(1), r.getLong(2), r.getDouble(3), r.getDouble(4))))
      val latest = rows.zipWithIndex.groupBy(_._1._1).view
        .mapValues(_.maxBy(_._2)._1._2).toMap
      assert(latest(1L) == ((15.0, 3L, 2.0, 9.0)))
      assert(latest(2L) == ((10.0, 1L, 10.0, 10.0)))
    } finally q.stop()
  }
}
