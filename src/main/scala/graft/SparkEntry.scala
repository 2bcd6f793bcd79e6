package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` carries one entry per declared operator (SURVEY.md §2.6);
  * `oracleSql` is the DuckDB-equivalent SQL for every oracle-checked key.
  * Column names are aliased identically on both sides (the driver sorts
  * columns by name before hashing values).
  */
object SparkEntry {

  /** Flagship query (the reference's single benchmark shape,
    * /root/reference/README.md:5–8) on sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Core.queries("q_time_range_sum")(spark, "/root/testdata/sf0.001")

  private val groups: Seq[(Map[String, Q.Fn], Map[String, String])] = Seq(
    (Core.queries, Core.oracle),
    (Analytics.queries, Analytics.oracle),
    (Aggregates.queries, Aggregates.oracle),
    (Joins.queries, Joins.oracle),
    (Windows.queries, Windows.oracle),
    (Subqueries.queries, Subqueries.oracle),
    (SetOps.queries, SetOps.oracle),
    (Scalars.queries, Scalars.oracle),
    (Text.queries, Text.oracle),
    (Pipeline.queries, Pipeline.oracle),
    (Similarity.queries, Similarity.oracle),
    (Multimodal.queries, Multimodal.oracle))

  /** One entry per implemented operator from SURVEY.md §2.6. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    groups.iterator.map(_._1).reduce(_ ++ _)

  /** For each key in `queries`, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops (those
    * get a rows-only check + internal ScalaTest verification). */
  def oracleSql: Map[String, String] =
    groups.iterator.map(_._2).reduce(_ ++ _)
}
