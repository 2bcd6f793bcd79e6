package graft.queries

import org.apache.spark.sql.functions._
import Q._

/** Subquery surface (SURVEY.md §2.3 "Subqueries" row: DataFusion 37
  * supports scalar + IN/EXISTS subqueries with decorrelation via
  * `ctx.sql`, /root/reference/src/main.rs:266; Catalyst's
  * RewriteCorrelatedScalarSubquery / RewritePredicateSubquery planes the
  * same shapes into joins — no hand-written decorrelation here).
  *
  * Scale posture: every subquery decorrelates to a hash join —
  * uncorrelated scalars become a broadcast one-row join, IN/EXISTS
  * become left-semi/anti joins, the correlated scalar becomes an
  * aggregate + equi-join on the correlation key. Asserted by the queries
  * running at all (Spark refuses non-decorrelatable shapes) and by the
  * no-cartesian audit in PlanAuditSpec.
  *
  * Determinism: thresholds against a computed average use
  * `SUM(CAST(.. AS DECIMAL)) / COUNT` — an exact integer-domain sum and
  * ONE double division, bit-identical across engines regardless of
  * partial-aggregation order (SURVEY.md §5.3).
  */
object Subqueries {

  val queries: Map[String, Fn] = Map(
    // Uncorrelated scalar subquery → broadcast one-row join: orders
    // above 1.5× the global average price.
    "q_subquery_scalar" -> ((s, dir) => {
      t(s, dir, "orders").createOrReplaceTempView("orders_sq")
      s.sql(
        """SELECT o_orderkey, o_custkey, o_totalprice FROM orders_sq
          |WHERE o_totalprice > (
          |  SELECT 1.5 * CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
          |         / COUNT(1) FROM orders_sq)
          |ORDER BY o_orderkey""".stripMargin)
    }),

    // IN subquery → left-semi join: customers holding at least one
    // high-value order.
    "q_subquery_in" -> ((s, dir) => {
      t(s, dir, "orders").createOrReplaceTempView("orders_sq")
      t(s, dir, "customer").createOrReplaceTempView("customer_sq")
      s.sql(
        """SELECT c_custkey, c_mktsegment FROM customer_sq
          |WHERE c_custkey IN
          |  (SELECT o_custkey FROM orders_sq WHERE o_totalprice > 400000.0)
          |ORDER BY c_custkey""".stripMargin)
    }),

    // Correlated NOT EXISTS → left-anti join: customers with no
    // finished ('F') order.
    "q_subquery_exists" -> ((s, dir) => {
      t(s, dir, "orders").createOrReplaceTempView("orders_sq")
      t(s, dir, "customer").createOrReplaceTempView("customer_sq")
      s.sql(
        """SELECT c_custkey, c_mktsegment FROM customer_sq c
          |WHERE NOT EXISTS (SELECT 1 FROM orders_sq o
          |                  WHERE o.o_custkey = c.c_custkey
          |                    AND o.o_orderstatus = 'F')
          |ORDER BY c_custkey""".stripMargin)
    }),

    // Correlated scalar subquery: lineitems above their own order's
    // average quantity. Round 17 re-plan — the decorrelated
    // aggregate+join form scanned lineitem twice, exchanged the
    // aggregate, broadcast a |orders|-row hash relation, and then paid
    // the ORDER BY's range exchange; the same relation computes with ONE
    // scan and ONE exchange as a window over the correlation key:
    // range-partition by l_orderkey (satisfies the window's clustering
    // AND pre-positions the final order), per-order SUM/COUNT as
    // unbounded window aggregates, filter, and a partition-local sort.
    // Equivalence is exact, not approximate: quantities are small exact
    // doubles (integral 1..50), so the per-order sum is the same value
    // under ANY summation order, and SUM/COUNT over the full partition
    // equals the correlated subquery's aggregate row-for-row (each row's
    // group is its own order; groups are never empty). The driver's
    // oracle re-hash confirms bit-identity at every SF.
    "q_subquery_corr" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("l_orderkey"))
      t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
        .repartitionByRange(col("l_orderkey"))
        .withColumn("__avg",
          sum(col("l_quantity")).over(w) / count(lit(1)).over(w))
        .filter(col("l_quantity") > col("__avg"))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
        .sortWithinPartitions(
          col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
    }))

  val oracle: Map[String, String] = Map(
    "q_subquery_scalar" ->
      ("SELECT o_orderkey, o_custkey, o_totalprice FROM orders " +
        "WHERE o_totalprice > (" +
        "SELECT 1.5 * CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) " +
        "/ COUNT(1) FROM orders) ORDER BY o_orderkey"),
    "q_subquery_in" ->
      ("SELECT c_custkey, c_mktsegment FROM customer " +
        "WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 400000.0) " +
        "ORDER BY c_custkey"),
    "q_subquery_exists" ->
      ("SELECT c_custkey, c_mktsegment FROM customer c " +
        "WHERE NOT EXISTS (SELECT 1 FROM orders o " +
        "WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F') " +
        "ORDER BY c_custkey"),
    "q_subquery_corr" ->
      ("SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem l " +
        "WHERE l_quantity > (" +
        "SELECT SUM(l2.l_quantity) / COUNT(1) FROM lineitem l2 " +
        "WHERE l2.l_orderkey = l.l_orderkey) " +
        "ORDER BY l_orderkey, l_linenumber, l_quantity"))
}
