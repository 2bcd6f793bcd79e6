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

  test("memory table matches its source rows") {
    val df = sample
    val mem = Sources.memory(spark, df.collect().toSeq, df.schema)
    assert(rowsOf(mem) == rowsOf(df))
  }
}
