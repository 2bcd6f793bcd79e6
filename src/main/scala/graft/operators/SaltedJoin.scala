package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join — the standard remedy when one join key is so hot
  * that a single shuffle partition drags the whole stage (the 100 TB
  * skew case AQE's skew-join handles for sort-merge joins; this helper
  * expresses it explicitly so it also composes with aggregations and
  * works when AQE is off or the skew is in a hash join build).
  *
  * The big (skewed) side gets a random salt in [0, buckets); the small
  * side is replicated `buckets` times (explode over the salt range), and
  * the join key becomes (key, salt) — the hot key's rows spread over
  * `buckets` partitions instead of one. Results are identical to the
  * plain join (verified in SaltedJoinSpec); cost is `buckets`× the small
  * side, so pick buckets ~ the observed skew factor, not larger.
  *
  * The salt uses a deterministic per-row hash (not rand()) so retries
  * and speculative tasks salt identically — nondeterministic salts can
  * duplicate or drop rows under task retry. */
object SaltedJoin {

  /** Inner equi-join of `big` (skewed) with `small` on `key`, salted
    * into `buckets` sub-keys. `saltBy` are columns of `big` that make a
    * row's salt deterministic (default: all of big's columns). */
  def apply(big: DataFrame, small: DataFrame, key: String, buckets: Int,
      saltBy: Seq[String] = Seq.empty): DataFrame = {
    require(buckets > 0, "need at least one salt bucket")
    val saltCols = (if (saltBy.isEmpty) big.columns.toSeq else saltBy).map(col)
    val salted = big.withColumn("__salt",
      pmod(hash(saltCols: _*), lit(buckets)))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
