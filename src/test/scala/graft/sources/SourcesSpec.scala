package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.queries.Q

/** Round-trip checks for the CSV/JSON/memory source surface (SURVEY.md
  * §2.3 "Sources/sinks"). */
class SourcesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def sample = Q.t(spark, TestSpark.Sf0001, "events")
    .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
    .orderBy(col("event_id")).limit(500)

  private def rowsOf(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.orderBy(col("event_id")).collect().map(_.toString).toSeq

  test("csv round-trips with explicit schema") {
    val dir = Files.createTempDirectory("graft-csv").toString
    val df = sample
    Sources.writeCsv(df, dir)
    val back = Sources.csv(spark, dir, df.schema)
    assert(rowsOf(back) == rowsOf(df))
  }

  test("json round-trips with explicit schema") {
    val dir = Files.createTempDirectory("graft-json").toString
    val df = sample
    Sources.writeJson(df, dir)
    val back = Sources.json(spark, dir, df.schema)
    assert(rowsOf(back) == rowsOf(df))
  }

  test("orc round-trips and pushes filters into the scan") {
    val dir = Files.createTempDirectory("graft-orc").toString
    val df = sample
    Sources.writeOrc(df, dir)
    val back = Sources.orc(spark, dir)
    assert(rowsOf(back) == rowsOf(df))
    val filtered = Sources.orc(spark, dir).filter(col("value") > 100.0)
    filtered.collect()
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(value), GreaterThan(value,100.0)]"), plan)
  }

  test("memory table matches its source rows") {
    val df = sample
    val mem = Sources.memory(spark, df.collect().toSeq, df.schema)
    assert(rowsOf(mem) == rowsOf(df))
  }

  test("partitioned parquet prunes partitions at plan time") {
    val dir = Files.createTempDirectory("graft-part").toString
    val events = Q.t(spark, TestSpark.Sf0001, "events")
      .select(col("event_id"), col("user_id"), col("value"),
        to_date(col("ts")).as("dt"))
    Sources.writePartitionedParquet(events, dir, "dt")
    val pruned = spark.read.parquet(dir).filter(col("dt") === "2024-01-05")
    pruned.collect()
    val plan = pruned.queryExecution.executedPlan.toString
    // the dt predicate must land in PartitionFilters (directory pruning),
    // NOT PushedFilters (row-group filtering after listing everything)
    assert(plan.contains("PartitionFilters: [isnotnull(dt"), plan)
    assert(plan.contains("(dt"), plan)
    val expected = Q.t(spark, TestSpark.Sf0001, "events")
      .filter(to_date(col("ts")) === "2024-01-05").count()
    assert(pruned.count() == expected)
  }

  test("co-bucketed tables join with no shuffle exchange") {
    // managed tables land in the default warehouse dir (spark-warehouse/,
    // gitignored); the shared session's warehouse conf is static
    val events = Q.t(spark, TestSpark.Sf0001, "events")
      .select(col("event_id"), col("user_id"), col("value"))
    // the in-memory catalog forgets tables across JVMs but their
    // warehouse directories persist — clear both catalog AND location
    Seq("graft_bkt_a", "graft_bkt_b").foreach { tbl =>
      spark.sql(s"DROP TABLE IF EXISTS $tbl")
      val loc = new java.io.File(s"spark-warehouse/$tbl")
      if (loc.exists()) {
        import scala.reflect.io.Directory
        new Directory(loc).deleteRecursively()
      }
    }
    Sources.writeBucketedTable(events, "graft_bkt_a", "user_id", 8)
    Sources.writeBucketedTable(events
      .groupBy(col("user_id")).agg(count(lit(1)).as("n")), "graft_bkt_b", "user_id", 8)
    val joined = spark.table("graft_bkt_a")
      .join(spark.table("graft_bkt_b"), "user_id")
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join still shuffles:\n$plan")
    // sanity: the join actually ran over the bucketed files
    assert(joined.count() == events.count())
  }
}
