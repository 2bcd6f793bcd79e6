package graft.queries

import org.apache.spark.sql.functions._
import Q._

/** Set-operation surface (SURVEY.md §2.3 "Set ops" row): UNION ALL (bag),
  * INTERSECT and EXCEPT (set semantics in both Spark and DuckDB). */
object SetOps {

  val queries: Map[String, Fn] = Map(
    "q_union" -> ((s, dir) => {
      val o = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_orderpriority"))
      o.filter(col("o_orderstatus") === "F")
        .union(o.filter(col("o_orderpriority") === "1-URGENT"))
        .orderBy(col("o_orderkey"), col("o_orderstatus"), col("o_orderpriority"))
    }),

    "q_intersect" -> ((s, dir) => {
      val auto = t(s, dir, "customer")
        .filter(col("c_mktsegment") === "AUTOMOBILE")
        .select(col("c_custkey").as("custkey"))
      val open = t(s, dir, "orders")
        .filter(col("o_orderstatus") === "O")
        .select(col("o_custkey").as("custkey"))
      auto.intersect(open).orderBy(col("custkey"))
    }),

    // Except against the F-status slice so the result is non-empty (every
    // customer has SOME order in this data).
    "q_except" -> ((s, dir) => {
      val all = t(s, dir, "customer").select(col("c_custkey").as("custkey"))
      val withF = t(s, dir, "orders").filter(col("o_orderstatus") === "F")
        .select(col("o_custkey").as("custkey"))
      all.except(withF).orderBy(col("custkey"))
    }),

    // BAG semantics (round 3): EXCEPT ALL keeps multiplicity — per user,
    // max(0, #clicks − #views) rows survive. Identical rows are
    // interchangeable, so the single-column ORDER BY is total.
    "q_except_all" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val clicks = ev.filter(col("event_type") === "click").select(col("user_id"))
      val views = ev.filter(col("event_type") === "view").select(col("user_id"))
      clicks.exceptAll(views).orderBy(col("user_id"))
    }))

  val oracle: Map[String, String] = Map(
    "q_union" ->
      ("SELECT o_orderkey, o_orderstatus, o_orderpriority FROM orders WHERE o_orderstatus = 'F' " +
        "UNION ALL " +
        "SELECT o_orderkey, o_orderstatus, o_orderpriority FROM orders WHERE o_orderpriority = '1-URGENT' " +
        "ORDER BY o_orderkey, o_orderstatus, o_orderpriority"),
    "q_intersect" ->
      ("SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE' " +
        "INTERSECT " +
        "SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O' " +
        "ORDER BY custkey"),
    "q_except" ->
      ("SELECT c_custkey AS custkey FROM customer " +
        "EXCEPT " +
        "SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F' " +
        "ORDER BY custkey"),
    "q_except_all" ->
      ("SELECT user_id FROM events WHERE event_type = 'click' " +
        "EXCEPT ALL " +
        "SELECT user_id FROM events WHERE event_type = 'view' " +
        "ORDER BY user_id"))
}
