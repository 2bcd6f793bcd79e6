package graft.queries

import org.apache.spark.sql.functions._
import Q._

/** Scalar-function surface (SURVEY.md §2.3 "Scalar functions" row):
  * string, date, math, JSON-extraction and array operations — all
  * codegen'd Spark built-ins, no UDFs.
  *
  * Oracle parity notes: integer-ish results are cast BIGINT on both
  * sides (Spark `length`/`year` are INT, DuckDB's are BIGINT); libm-ish
  * functions (sqrt/ln) are rounded to 4 decimals. */
object Scalars {

  private val base: Map[String, Fn] = Map(
    "q_scalar_string" -> ((s, dir) =>
      t(s, dir, "part").select(
        col("p_partkey"),
        upper(col("p_name")).as("up_name"),
        substring(col("p_name"), 1, 5).as("pfx"),
        concat(col("p_brand"), lit("-"), col("p_type")).as("brandtype"),
        length(col("p_name")).cast("long").as("len"))
        .orderBy(col("p_partkey"))),

    "q_scalar_date" -> ((s, dir) =>
      t(s, dir, "orders").select(
        col("o_orderkey"),
        year(col("o_orderdate")).cast("long").as("y"),
        month(col("o_orderdate")).cast("long").as("m"),
        dayofmonth(col("o_orderdate")).cast("long").as("d"),
        unix_millis(date_trunc("month", col("o_orderdate"))).as("month_ms"))
        .orderBy(col("o_orderkey"))),

    "q_scalar_math" -> ((s, dir) =>
      // Sort the narrow source columns FIRST, compute in a project above
      // the sort: the range shuffle then moves 5 source columns instead
      // of 4 computed ones too — measured 2× faster at sf0.1.
      t(s, dir, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_extendedprice"), col("l_discount"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
        .select(
          col("l_orderkey"),
          col("l_linenumber"),
          round(sqrt(col("l_quantity")), 4).as("sqrt_qty"),
          round(log(col("l_extendedprice")), 4).as("ln_price"),
          round(abs(col("l_discount") - lit(0.05)), 4).as("abs_disc"),
          // exact decimal-domain multiply (2-decimal money data): avoids
          // HALF_UP-vs-HALF_EVEN ties at .xx5 between Spark and DuckDB.
          (col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1.0).cast("decimal(3,2)") - col("l_discount").cast("decimal(3,2)")))
            .cast("double").as("disc_price"))),

    "q_json_extract" -> ((s, dir) =>
      t(s, dir, "events").select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
        .orderBy(col("event_id"))),

    "q_array_ops" -> ((s, dir) =>
      t(s, dir, "embeddings").select(
        col("vec_id"),
        size(col("embedding")).cast("long").as("dim"),
        round(element_at(col("embedding"), 1).cast("double"), 4).as("first_val"),
        col("label"))
        .orderBy(col("vec_id"))),

    // Malformed-record quarantine (round 5): schema-on-read over a JSON
    // column where some records are broken — count and exclude them
    // instead of failing the job (the PERMISSIVE-parse contract every
    // 100 TB ingest needs; one bad crawl record must not kill a stage).
    // Like the cleaning family, both engines deterministically corrupt
    // the same rows (doc_id % 7 == 0 → truncated JSON), so the operator
    // under test is the parse-or-null semantics: Spark's from_json
    // yields null fields on malformed input exactly where DuckDB's
    // ->> extraction yields NULL on json-invalid text.
    "q_json_malformed" -> ((s, dir) => {
      val lenTok = size(split(col("text"), " "))
      val js = when(col("doc_id") % 7 === 0,
          concat(lit("{\"id\":"), col("doc_id"), lit(",\"len\":")))
        .otherwise(concat(
          lit("{\"id\":"), col("doc_id"),
          lit(",\"len\":"), lenTok, lit("}")))
      docs(s, dir)
        .select(col("lang"),
          from_json(js, org.apache.spark.sql.types.StructType.fromDDL(
            "id BIGINT, len BIGINT")).as("p"))
        .groupBy(col("lang"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(when(col("p.len").isNull, 1L).otherwise(0L)).as("n_malformed"),
          sum(coalesce(col("p.len"), lit(0L))).as("parsed_len"))
        .orderBy(col("lang"))
    }),

    // Date arithmetic (round 3): day difference, offset, month spans —
    // the remaining scalar-date family. DuckDB's datediff takes the
    // part first and (start, end); Spark's datediff is (end, start).
    "q_date_arith" -> ((s, dir) =>
      t(s, dir, "orders").select(
        col("o_orderkey"),
        datediff(col("o_orderdate"), lit("1995-01-01").cast("date")).cast("long").as("days_since"),
        // ISO string, not DATE: pandas reads Spark DATE as date and
        // DuckDB DATE as datetime — value compare would mismatch on type
        date_format(date_add(col("o_orderdate"), 30), "yyyy-MM-dd").as("due_date"),
        // cast to date first: months_between on raw timestamps folds the
        // time-of-day into the fraction, which no portable SQL reproduces
        round(months_between(col("o_orderdate").cast("date"), lit("1995-01-01").cast("date")), 2).as("months_since"))
        .orderBy(col("o_orderkey"))),

    // Edit distance (round 3): Levenshtein on a bounded prefix — the
    // fuzzy-match primitive (typo-tolerant dedup, canonicalization).
    // Bounded input keeps the O(n·m) per-row cost constant.
    "q_edit_distance" -> ((s, dir) =>
      t(s, dir, "part").select(
        col("p_partkey"),
        levenshtein(substring(col("p_name"), 1, 12), lit("promo brushed")).cast("long").as("dist"),
        levenshtein(col("p_brand"), lit("Brand#33")).cast("long").as("brand_dist"))
        .orderBy(col("p_partkey"))),

    // Wide→long unpivot (round 3): Spark's native `unpivot` operator
    // (a Generate, one pass, no join) over three measure columns; the
    // oracle spells the same relation as UNION ALL, the portable form.
    "q_unpivot" -> ((s, dir) =>
      // Range-partition the 5-column base rows FIRST, expand after: the
      // sort's range exchange then moves N rows instead of the 3N
      // unpivoted ones (same trick as q_scalar_math's sort-then-project).
      // Equal (orderkey, linenumber) keys land in one partition, so the
      // within-partition sort on the full key reproduces the global
      // ORDER BY bit-for-bit.
      t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("l_extendedprice"), col("l_discount"))
        .repartitionByRange(col("l_orderkey"), col("l_linenumber"))
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("l_quantity"), col("l_extendedprice"), col("l_discount")),
          "metric", "val")
        // val in the sort: synthetic lineitem has duplicate
        // (orderkey, linenumber) keys, so (key, metric) is not total
        .sortWithinPartitions(
          col("l_orderkey"), col("l_linenumber"), col("metric"), col("val"))))

  /** Round-5 extras appended to the scalar family. */
  private val round5: Map[String, Fn] = Map(
    // Error-safe arithmetic: try_divide returns NULL on a zero divisor
    // (DuckDB's division already yields NULL there, so the semantics
    // line up engine-to-engine) — the messy-data guard that keeps a
    // 100 TB job from dying on one bad row. SUM skips the NULLs on
    // both engines; the null count is pinned explicitly.
    "q_try_arith" -> ((s, dir) => {
      val k = get_json_object(col("props"), "$.k").cast("int")
      val ratio = try_divide(col("value"), (k - lit(50)).cast("double"))
      t(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          sum(when(ratio.isNull, 1L).otherwise(0L)).as("n_div_null"),
          round(sum(ratio), 4).as("sum_ratio"))
        .orderBy(col("event_type"))
    }),

    // Nested-type aggregation: per region, a sorted JSON array of
    // {nation, customer count} structs — arrays-of-structs through two
    // hash aggregations and out as canonical JSON (the manifest/feed
    // shape). array_sort on structs orders by the first field (the
    // nation name) — the same order the oracle's list(... ORDER BY)
    // pins; to_json(struct) is byte-compatible with DuckDB's
    // struct-to-json for null-free fields.
    "q_nested_agg" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val n = t(s, dir, "nation")
      val r = t(s, dir, "region")
      c.join(n, c("c_nationkey") === n("n_nationkey"))
        .join(r, n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n"))
        .groupBy(col("r_name"))
        .agg(to_json(array_sort(collect_list(
          struct(col("n_name").as("nation"), col("n"))))).as("nations"))
        .orderBy(col("r_name"))
    }))

  val queries: Map[String, Fn] = base ++ round5

  val oracle: Map[String, String] = Map(
    "q_try_arith" ->
      ("SELECT event_type, COUNT(1) AS n, " +
        "CAST(SUM(CASE WHEN CAST(json_extract_string(props, '$.k') AS INT) = 50 THEN 1 ELSE 0 END) AS BIGINT) AS n_div_null, " +
        "ROUND(SUM(value / CAST(CAST(json_extract_string(props, '$.k') AS INT) - 50 AS DOUBLE)), 4) AS sum_ratio " +
        "FROM events GROUP BY event_type ORDER BY event_type"),
    "q_nested_agg" ->
      ("WITH per_n AS (SELECT r_name, n_name, COUNT(1) AS n FROM customer " +
        "JOIN nation ON c_nationkey = n_nationkey " +
        "JOIN region ON n_regionkey = r_regionkey GROUP BY r_name, n_name) " +
        "SELECT r_name, CAST(to_json(list(struct_pack(nation := n_name, n := n) " +
        "ORDER BY n_name)) AS VARCHAR) AS nations " +
        "FROM per_n GROUP BY r_name ORDER BY r_name"),
    "q_scalar_string" ->
      ("SELECT p_partkey, UPPER(p_name) AS up_name, SUBSTRING(p_name, 1, 5) AS pfx, " +
        "p_brand || '-' || p_type AS brandtype, CAST(LENGTH(p_name) AS BIGINT) AS len " +
        "FROM part ORDER BY p_partkey"),
    "q_scalar_date" ->
      ("SELECT o_orderkey, CAST(YEAR(o_orderdate) AS BIGINT) AS y, " +
        "CAST(MONTH(o_orderdate) AS BIGINT) AS m, " +
        "CAST(DAYOFMONTH(o_orderdate) AS BIGINT) AS d, " +
        "epoch_ms(date_trunc('month', o_orderdate)) AS month_ms " +
        "FROM orders ORDER BY o_orderkey"),
    "q_scalar_math" ->
      ("SELECT l_orderkey, l_linenumber, ROUND(SQRT(l_quantity), 4) AS sqrt_qty, " +
        "ROUND(LN(l_extendedprice), 4) AS ln_price, " +
        "ROUND(ABS(l_discount - 0.05), 4) AS abs_disc, " +
        "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * " +
        "(CAST(1.0 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2))) AS DOUBLE) AS disc_price " +
        "FROM lineitem ORDER BY l_orderkey, l_linenumber"),
    "q_json_extract" ->
      ("SELECT event_id, CAST(props->>'$.k' AS BIGINT) AS k " +
        "FROM events ORDER BY event_id"),
    "q_json_malformed" ->
      ("WITH j AS (SELECT lang, CASE WHEN doc_id % 7 = 0 " +
        "THEN '{\"id\":' || doc_id || ',\"len\":' " +
        "ELSE '{\"id\":' || doc_id || ',\"len\":' || len(string_split(text, ' ')) || '}' " +
        "END AS js FROM documents), " +
        // ->> ERRORS on malformed json in DuckDB (vs from_json's null),
        // so the valid gate must come first
        "p AS (SELECT lang, CASE WHEN json_valid(js) " +
        "THEN CAST(js->>'$.len' AS BIGINT) END AS len FROM j) " +
        "SELECT lang, COUNT(1) AS n_docs, " +
        "CAST(SUM(CASE WHEN len IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_malformed, " +
        "CAST(SUM(COALESCE(len, 0)) AS BIGINT) AS parsed_len " +
        "FROM p GROUP BY lang ORDER BY lang"),
    "q_array_ops" ->
      ("SELECT vec_id, CAST(LEN(embedding) AS BIGINT) AS dim, " +
        "ROUND(CAST(embedding[1] AS DOUBLE), 4) AS first_val, label " +
        "FROM embeddings ORDER BY vec_id"),
    "q_date_arith" ->
      ("SELECT o_orderkey, " +
        "CAST(datediff('day', DATE '1995-01-01', o_orderdate) AS BIGINT) AS days_since, " +
        "strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS due_date, " +
        // Spark months_between(d, 1995-01-01) = whole-month diff +
        // (dom-1)/31 (the dom==1 case lands on 0 either way)
        "ROUND(datediff('month', DATE '1995-01-01', CAST(o_orderdate AS DATE)) + " +
        " (dayofmonth(o_orderdate) - 1) / 31.0, 2) AS months_since " +
        "FROM orders ORDER BY o_orderkey"),
    "q_edit_distance" ->
      ("SELECT p_partkey, " +
        "CAST(levenshtein(SUBSTRING(p_name, 1, 12), 'promo brushed') AS BIGINT) AS dist, " +
        "CAST(levenshtein(p_brand, 'Brand#33') AS BIGINT) AS brand_dist " +
        "FROM part ORDER BY p_partkey"),
    "q_unpivot" ->
      ("SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric, l_quantity AS val FROM lineitem " +
        "UNION ALL " +
        "SELECT l_orderkey, l_linenumber, 'l_extendedprice' AS metric, l_extendedprice AS val FROM lineitem " +
        "UNION ALL " +
        "SELECT l_orderkey, l_linenumber, 'l_discount' AS metric, l_discount AS val FROM lineitem " +
        "ORDER BY l_orderkey, l_linenumber, metric, val"))
}
