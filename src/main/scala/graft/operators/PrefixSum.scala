package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global prefix sum (round 16, VERDICT r15 "what's wrong"
  * #1) — the scale-safe spelling of `SUM(v) OVER (ORDER BY id ROWS
  * UNBOUNDED PRECEDING)`, which Spark plans as an `Exchange
  * SinglePartition` + one-task total sort: THE driver-era bottleneck
  * once the input is a corpus rather than a handful of rollup rows.
  *
  * The classic two-phase decomposition instead:
  *
  *  1. range-partition by `idCol` (parallel sort — partition i holds
  *     strictly smaller ids than partition i+1, Spark's own
  *     `RangePartitioning` contract, the same exchange `ORDER BY`
  *     plans);
  *  2. a LOCAL running sum per range partition
  *     (`Window.partitionBy(pid).orderBy(id)` — every partition sorts
  *     independently, full cluster parallelism);
  *  3. per-partition subtotals → cumulative partition offsets. The
  *     offsets side is ≤ `spark.sql.shuffle.partitions` rows, so ITS
  *     global-order window is the "window over ~30 rows, not raw
  *     events" layering (cf. q_moving_avg), and it broadcast-joins
  *     back onto the local sums.
  *
  * One range shuffle + one pid shuffle, both full-width; no single
  * task ever sees more than one partition of data. The range exchange
  * is computed once (both branches read the identical subplan →
  * `ReusedExchange`), so an expensive upstream (e.g. the BPE token
  * counter) runs one pass. Result: the input columns plus `outCol` =
  * the INCLUSIVE running sum of `tokCol` in global `idCol` order —
  * bit-identical to the single-window spelling because integer
  * addition reassociates exactly. */
object PrefixSum {

  def runningSum(df: DataFrame, idCol: String, tokCol: String,
      outCol: String): DataFrame = {
    val parts = df.sparkSession.sessionState.conf.numShufflePartitions
    val ranged = df
      .repartitionByRange(parts, col(idCol))
      .withColumn("__graft_pid", spark_partition_id())
    val wLocal = Window.partitionBy(col("__graft_pid")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = ranged.withColumn("__graft_local", sum(col(tokCol)).over(wLocal))
    // offsets: ≤ `parts` rows — the tiny side of the layering
    val wOff = Window.orderBy(col("__graft_pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = ranged
      .groupBy(col("__graft_pid"))
      .agg(sum(col(tokCol)).as("__graft_psum"))
      .select(col("__graft_pid"),
        coalesce(sum(col("__graft_psum")).over(wOff), lit(0L)).as("__graft_off"))
    local.join(broadcast(offsets), "__graft_pid")
      .withColumn(outCol, col("__graft_local") + col("__graft_off"))
      .drop("__graft_pid", "__graft_local")
  }
}
