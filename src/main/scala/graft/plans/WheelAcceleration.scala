package graft.plans

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types._

import graft.wheel.{AllAggregate, WheelIndex}

/** Transparent wheel-index acceleration for SQL/DataFrame queries — the
  * v2 stretch of SURVEY.md §4.2: where the reference picks its index path
  * by hand (two separate bench functions,
  * /root/reference/src/main.rs:67–68), this injects a Catalyst
  * `Rule[LogicalPlan]` that pattern-matches
  *
  * {{{ Aggregate(no grouping, [sum/min/max/count/avg(value)...],
  *       Filter(ts >= a AND ts < b, ...Scan(path))) }}}
  *
  * over a source with a registered [[WheelIndex]] and replaces the whole
  * subtree with a one-row [[LocalRelation]] computed from the index at
  * plan-optimization time (µs-scale, driver-local, no job, no scan —
  * the µWheel `combine_range_and_lower` fast path,
  * /root/reference/src/main.rs:212, behind an unchanged SQL interface).
  *
  * Semantics guarded before rewriting (bail = leave the plan untouched):
  *  - the filter is EXACTLY a half-open `[a, b)` minute-aligned range on
  *    the registered timestamp column — extra conjuncts disqualify;
  *  - every aggregate is non-distinct sum/min/max/count/avg over the
  *    registered (never-null) measure column, or count(*)/count(1);
  *  - the plan between filter and leaf is projection-only, and the leaf
  *    is the registered file source.
  *
  * Registration contract: the index must be built from the same reading
  * pipeline the queries use (same ts/measure derivation) — enforced by
  * registering through [[WheelAcceleration.register]], which builds the
  * index from the caller's DataFrame.
  */
object WheelAcceleration {

  private final case class Reg(tsCol: String, valueCol: String,
      idx: WheelIndex, fingerprint: String, hadoopConf: org.apache.hadoop.conf.Configuration)

  /** Registered indexes keyed by the source file's URI path. */
  private val registry = new ConcurrentHashMap[String, Reg]()

  /** Source-data fingerprint: sorted (name, length, mtime) of every file
    * under `path`. Captured at registration; [[WheelSumRewrite]] bails on
    * any mismatch, so an overwritten/appended source silently falls back
    * to the (correct) scan path instead of serving stale index constants. */
  private def fingerprint(path: String, conf: org.apache.hadoop.conf.Configuration): String = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) "absent"
    else {
      val it = fs.listFiles(p, true)
      val parts = scala.collection.mutable.ArrayBuffer.empty[String]
      while (it.hasNext) {
        val f = it.next()
        parts += s"${f.getPath.getName}:${f.getLen}:${f.getModificationTime}"
      }
      parts.sorted.mkString("|")
    }
  }

  /** Build (via [[graft.wheel.WheelCatalog]]-style one-time work) and
    * register an index for `path`, and enable the rewrite rule on the
    * session. `events` must be the same reading pipeline queries use.
    *
    * The registration captures the source files' fingerprint; if the
    * data at `path` later changes, the rewrite rule stops firing (scan
    * path, still correct). Re-`register` after a data change to rebuild
    * — or `unregister(path)` to drop acceleration explicitly. */
  def register(spark: SparkSession, path: String, events: => DataFrame,
      tsCol: String = "ts", valueCol: String = "value"): WheelIndex = {
    val conf = spark.sessionState.newHadoopConf()
    val fp = fingerprint(path, conf)
    // The catalog key embeds the fingerprint, so re-registering after a
    // data change rebuilds instead of serving the stale cached index.
    val reg = registry.compute(normalize(path), (_, old) =>
      if (old != null && old.fingerprint == fp) old
      else Reg(tsCol, valueCol,
        graft.wheel.WheelCatalog.cached(s"$path@$fp", tsCol, valueCol)(events),
        fp, conf))
    enable(spark)
    reg.idx
  }

  /** Drop the registered index for `path` (the rewrite rule stops firing
    * for it; queries fall back to the scan path). */
  def unregister(path: String): Unit = registry.remove(normalize(path))

  def clear(): Unit = registry.clear()

  /** Idempotently add the rule to an already-built session (the
    * config-time path is `spark.sql.extensions=graft.plans.GraftExtensions`). */
  def enable(spark: SparkSession): Unit = {
    val existing = spark.experimental.extraOptimizations
    if (!existing.exists(_.isInstanceOf[WheelSumRewrite]))
      spark.experimental.extraOptimizations = existing :+ WheelSumRewrite()
  }

  private def normalize(p: String): String =
    new java.net.URI(p).getPath match { case null => p; case s => s }

  /** Registration for `path`, validated against the CURRENT source
    * fingerprint — None (rule bails, scan path) if the files changed
    * since registration. The staleness check is one FS metadata listing
    * per candidate plan, driver-side. */
  private[plans] def lookup(path: String): Option[(String, String, WheelIndex)] =
    Option(registry.get(normalize(path))).flatMap { r =>
      if (fingerprint(path, r.hadoopConf) == r.fingerprint)
        Some((r.tsCol, r.valueCol, r.idx))
      else {
        System.err.println(s"[graft] wheel index for $path is stale (source " +
          "files changed); skipping rewrite — re-register to rebuild")
        None
      }
    }
}

/** Config-time injection: `--conf spark.sql.extensions=graft.plans.GraftExtensions`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    e.injectOptimizerRule(_ => WheelSumRewrite())
}

case class WheelSumRewrite() extends Rule[LogicalPlan] {

  private val MinuteMs = 60000L

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case agg @ Aggregate(groupings, aggExprs, child, _) if groupings.isEmpty =>
      rewrite(agg, aggExprs, child).getOrElse(agg)
  }

  private def rewrite(
      agg: Aggregate,
      aggExprs: Seq[NamedExpression],
      child: LogicalPlan): Option[LogicalPlan] = for {
    (cond, below) <- findFilter(child)
    path <- sourcePath(below)
    (tsCol, valueCol, idx) <- WheelAcceleration.lookup(path)
    (a, b) <- rangeMs(cond, tsCol)
    if a % MinuteMs == 0 && b % MinuteMs == 0 && a <= b
    all = idx.query(a, b)
    rewritten <- foldAggregates(aggExprs, valueCol, all)
  } yield LocalRelation(agg.output, Seq(InternalRow.fromSeq(rewritten)))

  /** The single Filter under the aggregate, reachable through
    * projection-only nodes (column pruning inserts Projects between the
    * aggregate and the pushed-down filter). */
  private def findFilter(p: LogicalPlan): Option[(Expression, LogicalPlan)] =
    p match {
      case Filter(c, ch) => Some((c, ch))
      case Project(_, ch) => findFilter(ch)
      case SubqueryAlias(_, ch) => findFilter(ch)
      case _ => None
    }

  /** Leaf file-source path, requiring a projection-only path down to a
    * single file relation. */
  private def sourcePath(plan: LogicalPlan): Option[String] = plan match {
    case Project(_, c) => sourcePath(c)
    case SubqueryAlias(_, c) => sourcePath(c)
    case LogicalRelation(fs: HadoopFsRelation, _, _, _, _) =>
      fs.location.rootPaths.toList match {
        case single :: Nil => Some(single.toUri.getPath)
        case _ => None
      }
    case _ => None
  }

  /** Extract the half-open `[a, b)` epoch-ms range if the filter is
    * exactly a lower + an upper bound on the registered ts column (plus
    * any IsNotNull(ts) conjuncts the optimizer infers from them).
    *
    * The epoch-ms expression is accepted in the shapes our read pipeline
    * produces after predicate pushdown: `unix_millis(ts)` over a
    * timestamp column, `unix_millis(timestamp_micros(ts div 1000))` over
    * a raw nanos-long column (graft.queries.Q.t's TIMESTAMP(NANOS)
    * rebuild), or a bare ts column compared to a µs timestamp literal. */
  private def rangeMs(cond: Expression, tsCol: String): Option[(Long, Long)] = {
    def isTsMs(e: Expression): Boolean = e match {
      case UnixMillis(a: AttributeReference) => a.name == tsCol
      case UnixMillis(MicrosToTimestamp(d: IntegralDivide)) =>
        (d.left, d.right) match {
          case (a: AttributeReference, Literal(1000L, LongType)) => a.name == tsCol
          case (a: AttributeReference, Literal(1000, IntegerType)) => a.name == tsCol
          case _ => false
        }
      case _ => false
    }
    def msLit(e: Expression): Option[Long] = e match {
      case Literal(v: Long, LongType) => Some(v)
      case Literal(v: Int, IntegerType) => Some(v.toLong)
      case _ => None
    }
    def usLit(e: Expression): Option[Long] = e match {
      case Literal(v: Long, TimestampType) if v % 1000 == 0 => Some(v / 1000)
      case _ => None
    }
    def lower(e: Expression): Option[Long] = e match {
      case GreaterThanOrEqual(l, r) if isTsMs(l) => msLit(r)
      case GreaterThanOrEqual(a: AttributeReference, r) if a.name == tsCol => usLit(r)
      case LessThanOrEqual(r, l) if isTsMs(l) => msLit(r)
      case _ => None
    }
    def upper(e: Expression): Option[Long] = e match {
      case LessThan(l, r) if isTsMs(l) => msLit(r)
      case LessThan(a: AttributeReference, r) if a.name == tsCol => usLit(r)
      case GreaterThan(r, l) if isTsMs(l) => msLit(r)
      case _ => None
    }
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(x, y) => conjuncts(x) ++ conjuncts(y)
      case other => Seq(other)
    }
    val cs = conjuncts(cond).filterNot {
      case IsNotNull(a: AttributeReference) => a.name == tsCol
      case _ => false
    }
    val lowers = cs.flatMap(c => lower(c))
    val uppers = cs.flatMap(c => upper(c))
    if (lowers.size == 1 && uppers.size == 1 && cs.size == 2)
      Some((lowers.head, uppers.head))
    else None
  }

  /** Replace every aggregate call with its index-computed literal, then
    * constant-fold whatever scalar expression wrapped it (ROUND, casts,
    * arithmetic). Returns None if ANY aggregate is outside the supported
    * family — the plan is then left for normal execution. */
  private def foldAggregates(
      aggExprs: Seq[NamedExpression],
      valueCol: String,
      all: AllAggregate): Option[Seq[Any]] = {
    val empty = all.count == 0L
    def isValue(e: Expression): Boolean = e match {
      case a: AttributeReference => a.name == valueCol
      case _ => false
    }
    var supported = true
    def lit(e: AggregateExpression): Expression = {
      if (e.isDistinct || e.filter.nonEmpty) { supported = false; return e }
      e.aggregateFunction match {
        case Sum(c, _) if isValue(c) =>
          Literal(if (empty) null else all.sum, DoubleType)
        case Min(c) if isValue(c) =>
          Literal(if (empty) null else all.min, DoubleType)
        case Max(c) if isValue(c) =>
          Literal(if (empty) null else all.max, DoubleType)
        case Average(c, _) if isValue(c) =>
          Literal(if (empty) null else all.avg, DoubleType)
        case Count(cs) if cs.forall(c => isValue(c) || c.foldable) =>
          Literal(all.count, LongType)
        case _ => supported = false; e
      }
    }
    val folded = aggExprs.map { ne =>
      val replaced = ne.transform { case e: AggregateExpression => lit(e) }
      if (!supported) return None
      if (replaced.exists(_.isInstanceOf[Attribute])) return None
      replaced.asInstanceOf[Expression].eval(InternalRow.empty)
    }
    Some(folded)
  }
}
