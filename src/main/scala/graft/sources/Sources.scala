package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source/sink surface (SURVEY.md §2.3 "Sources/sinks" row: the
  * reference's engine registers parquet and, via its SQL dependency, can
  * read CSV/JSON/memory tables — /root/reference/src/main.rs:42–46 plus
  * the dependency surface).
  *
  * Spark-first mapping with one deliberate policy: **readers take an
  * explicit schema** — `inferSchema` on CSV/JSON is an extra full pass
  * over the data and a schema-drift hazard; at 100 TB it is simply
  * wrong. Parquet carries its own schema in the footer.
  */
object Sources {

  def parquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Headered CSV with a caller-supplied schema (no inference pass). */
  def csv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).option("header", "true").csv(path)

  /** JSON-lines with a caller-supplied schema (no inference pass). */
  def json(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** In-memory rows as a table — the analogue of a registered memory
    * table; used by specs and examples. */
  def memory(spark: SparkSession, rows: Seq[org.apache.spark.sql.Row],
      schema: StructType): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, math.max(1, rows.size / 1000)), schema)

  def writeParquet(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").parquet(path)

  /** Hive-style partitioned parquet layout (`col=value/` directories) —
    * THE layout that makes 100 TB queryable: a filter on the partition
    * column prunes whole directories at planning time (PartitionFilters
    * in the scan, asserted in SourcesSpec), so a day query over a year
    * of data reads 1/365th of the files. */
  def writePartitionedParquet(df: DataFrame, path: String, partitionCols: String*): Unit =
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)

  /** Bucketed + sorted managed table: rows are hash-bucketed by
    * `bucketCol` at WRITE time, so an equi-join (or aggregation) of two
    * tables bucketed the same way needs NO shuffle at read time — the
    * co-located-join layout for repeated big fact⋈fact joins
    * (SourcesSpec asserts the exchange-free plan). */
  def writeBucketedTable(df: DataFrame, table: String, bucketCol: String,
      numBuckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)

  /** ORC — the other columnar format Spark ships natively (predicate
    * pushdown + column pruning work the same as parquet); round-trip
    * asserted in SourcesSpec. */
  def orc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)

  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)
}
