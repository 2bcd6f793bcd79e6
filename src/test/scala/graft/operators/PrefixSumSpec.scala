package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The two-phase distributed prefix sum must be BIT-IDENTICAL to the
  * single-window spelling (integer addition reassociates exactly) —
  * on skewed ids, sparse ids, many input partitions, and a
  * single-row frame. */
class PrefixSumSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def naive(df: org.apache.spark.sql.DataFrame): Map[Long, Long] = {
    val w = Window.orderBy(col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("run", sum(col("v")).over(w))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
  }

  test("matches the global-order window exactly on sparse, shuffled ids") {
    // ids deliberately sparse and inserted in hash-ish order across
    // 13 input partitions; values vary so misordering would show
    val rows = (0 until 5000).map(i => ((i * 2654435761L) % 100000L, (i % 97).toLong + 1L))
      .distinctBy(_._1)
    val df = spark.createDataset(rows).toDF("id", "v").repartition(13)
    val got = PrefixSum.runningSum(df, "id", "v", "run")
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("run")).toMap
    assert(got == naive(df))
  }

  test("exact with exchange reuse DISABLED (round 17, ADVICE r16): pid " +
      "is a deterministic id function, not a sampled range partitioning") {
    val rows = (0 until 3000).map(i => ((i * 48271L) % 65537L, (i % 13).toLong + 1L))
      .distinctBy(_._1)
    val df = spark.createDataset(rows).toDF("id", "v").repartition(7)
    val want = naive(df)
    spark.conf.set("spark.sql.exchange.reuse", "false")
    try {
      val got = PrefixSum.runningSum(df, "id", "v", "run")
        .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("run")).toMap
      assert(got == want)
    } finally spark.conf.set("spark.sql.exchange.reuse", "true")
  }

  test("NULL token counts count as 0; the running sum is never NULL " +
      "(round 17, ADVICE r16)") {
    val df = Seq((1L, Some(5L)), (2L, None), (3L, Some(2L)), (4L, None))
      .toDF("id", "v")
    val got = PrefixSum.runningSum(df, "id", "v", "run")
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("run")).toMap
    assert(got == Map(1L -> 5L, 2L -> 5L, 3L -> 7L, 4L -> 7L))
    // leading NULLs too — the all-NULL prefix is 0, not NULL
    val lead = Seq((1L, Option.empty[Long]), (2L, Some(3L)))
      .toDF("id", "v")
    val gl = PrefixSum.runningSum(lead, "id", "v", "run")
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("run")).toMap
    assert(gl == Map(1L -> 0L, 2L -> 3L))
  }

  test("DUPLICATE ids: bucket totals stay exact (round 17) — per-row " +
      "order within a tie is ambiguous (as in the single-window " +
      "spelling) but the cumulative THROUGH each id group is not") {
    // 4 rows per id; pid is a function of the id, so a tie never spans
    // buckets — the max run within an id group is the exact cumulative
    // through that group, and any error in a bucket's total would shift
    // every later group
    val rows = (0 until 2000).map(i => ((i / 4).toLong, (i % 7) + 1L))
    val df = spark.createDataset(rows).toDF("id", "v").repartition(9)
    val got = PrefixSum.runningSum(df, "id", "v", "run").collect()
      .groupBy(_.getAs[Long]("id"))
      .map { case (k, rs) => k -> rs.map(_.getAs[Long]("run")).max }
    val totals = rows.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    var acc = 0L
    val want = totals.keys.toSeq.sorted.map { id =>
      acc += totals(id); id -> acc
    }.toMap
    assert(got == want)
  }

  test("non-numeric id refuses up front") {
    val df = Seq(("a", 1L)).toDF("id", "v")
    intercept[IllegalArgumentException] {
      PrefixSum.runningSum(df, "id", "v", "run")
    }
  }

  test("single row and fewer rows than shuffle partitions") {
    val one = Seq((42L, 7L)).toDF("id", "v")
    val g1 = PrefixSum.runningSum(one, "id", "v", "run").collect()
    assert(g1.length == 1 && g1(0).getAs[Long]("run") == 7L)
    val few = Seq((3L, 1L), (1L, 2L), (2L, 3L)).toDF("id", "v")
    val gf = PrefixSum.runningSum(few, "id", "v", "run")
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("run")).toMap
    assert(gf == Map(1L -> 2L, 2L -> 5L, 3L -> 6L))
  }
}
