package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Salted join must return exactly the plain join's rows while spreading
  * a hot key across salt buckets. */
class SaltedJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("salted join equals plain join on a skewed key distribution") {
    import spark.implicits._
    // 10 000 rows of hot key 1, a tail of others
    val big = ((1 to 10000).map(i => (1L, i.toLong)) ++
      (1 to 500).map(i => (1L + i % 20, 100000L + i)))
      .toDF("k", "payload")
    val small = (1L to 21L).map(k => (k, s"dim_$k")).toDF("k", "name")
    val plain = big.join(small, "k").collect().map(_.toString).sorted.toSeq
    val salted = SaltedJoin(big, small, "k", buckets = 8)
      .select("k", "payload", "name") // align column order with plain join
      .collect().map(_.toString).sorted.toSeq
    assert(salted == plain)
  }

  test("salting actually spreads the hot key across partitions") {
    import spark.implicits._
    val big = (1 to 5000).map(i => (1L, i.toLong)).toDF("k", "payload")
    val small = Seq((1L, "only")).toDF("k", "name")
    val buckets = 8
    val salted = big.withColumn("__salt",
      pmod(hash(col("k"), col("payload")), lit(buckets)))
    val used = salted.select("__salt").distinct().count()
    assert(used == buckets, s"only $used salt buckets used")
    assert(SaltedJoin(big, small, "k", buckets).count() == 5000)
  }

  test("deterministic salt: same inputs salt identically across runs") {
    import spark.implicits._
    val big = (1 to 100).map(i => (1L, i.toLong)).toDF("k", "payload")
    def salts() = big.withColumn("s", pmod(hash(col("k"), col("payload")), lit(4)))
      .orderBy("payload").collect().map(_.getInt(2)).toSeq
    assert(salts() == salts())
  }
}
