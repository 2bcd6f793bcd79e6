package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Predicate, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.LongType
import org.apache.spark.util.sketch.BloomFilter

/** Native codegen Bloom-membership predicate over a LONG key column.
  *
  * The `udf((k: Long) => bloom.mightContainLong(k))` formulation boxes
  * every key and breaks whole-stage codegen exactly where it matters —
  * on every fact row BEFORE the shuffle the bloom exists to shrink
  * (ADVICE/VERDICT r5 on q_join_bloom). This expression stays inside
  * codegen: the deserialized filter rides the plan as a reference
  * object and each row costs one primitive `mightContainLong` call,
  * so the pre-filter costs what a filter costs. Same extension
  * rationale as [[DotProduct]] (SURVEY.md §2.3 UDF-surface row).
  *
  * The filter object is bounded (~1.2 MB at 1M keys / 1% fpp) and ships
  * to executors once per task broadcast, not per row. */
case class BloomMightContain(child: Expression, bloom: BloomFilter)
    extends UnaryExpression with Predicate {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_bloom_contains expects a bigint key, got ${child.dataType.simpleString}")

  override def prettyName: String = "graft_bloom_contains"

  override def nullSafeEval(k: Any): Any =
    bloom.mightContainLong(k.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloom", bloom, classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, k => s"${ev.value} = $ref.mightContainLong($k);")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}

object BloomMightContain {
  private val FnPrefix = "graft_bloom_contains"
  private val nextId = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Column API: registers a builder capturing `bloom` on the session's
    * function registry (the filter is a runtime object, not SQL text),
    * then plans the codegen expression via `call_function`.
    *
    * The registered name is UNIQUE PER CALL: a fixed shared name would
    * let two bloom joins built concurrently on one session race the
    * registry slot and silently plan one join with the other's filter
    * (it only worked because Dataset analysis is eager and
    * single-threaded). Registry growth is bounded by the number of
    * bloom joins built on the session — one tiny builder entry each. */
  def mightContain(spark: SparkSession, bloom: BloomFilter, key: Column): Column = {
    val fnName = s"${FnPrefix}_${nextId.incrementAndGet()}"
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      fnName, exprs => BloomMightContain(exprs.head, bloom), "scala_udf")
    org.apache.spark.sql.functions.call_function(fnName, key)
  }
}
