package graft.queries

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

    // Correlated scalar subquery → per-key aggregate + equi-join:
    // lineitems above their own order's average quantity. Quantities
    // are small exact doubles: the per-order sum and single division
    // are exact, so the comparison is engine-deterministic.
    "q_subquery_corr" -> ((s, dir) => {
      t(s, dir, "lineitem").createOrReplaceTempView("lineitem_sq")
      s.sql(
        """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem_sq l
          |WHERE l_quantity > (
          |  SELECT SUM(l2.l_quantity) / COUNT(1) FROM lineitem_sq l2
          |  WHERE l2.l_orderkey = l.l_orderkey)
          |ORDER BY l_orderkey, l_linenumber, l_quantity""".stripMargin)
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
