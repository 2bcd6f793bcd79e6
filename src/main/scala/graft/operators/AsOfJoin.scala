package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — an operator DataFusion exposes via SQL engines like
  * `ASOF JOIN` and Spark lacks natively (SURVEY.md §2.3 joins row).
  *
  * For every left row, append the payload of the most recent right row
  * with the same key whose time is at-or-before the left row's time.
  *
  * Implementation is the scalable union trick, not an inequality join:
  * tag both sides, union, ONE hash shuffle on the key, and a running
  * `last(payload, ignoreNulls)` window over (time, tag) within each key
  * partition. Work is O(n log n) per key partition with no quadratic
  * range-join blowup, the formulation that holds at 100 TB. Ties at
  * equal time sort right-before-left, giving at-or-before semantics
  * (half-open in the same spirit as the reference's ranges,
  * /root/reference/src/main.rs:254–255).
  */
object AsOfJoin {

  /** `left` and `right` must both expose `key` and `time` columns with
    * identical names/types; `payload` names the right columns to carry
    * (they must not collide with left columns). Inner semantics by
    * default: left rows with no prior right row are dropped; pass
    * `keepUnmatched = true` for left-join semantics (null payload). */
  def apply(left: DataFrame, right: DataFrame, key: String, time: String,
      payload: Seq[String], keepUnmatched: Boolean = false): DataFrame = {
    require(payload.nonEmpty, "payload columns required")
    val rightSide = right.select(
      (Seq(col(key), col(time), lit(0).as("__tag")) :+
        struct(payload.map(col): _*).as("__p")): _*)
    val pType = rightSide.schema("__p").dataType
    val leftCols = left.columns.toSeq
    val leftSide = left.select(
      (leftCols.map(col) :+ lit(1).as("__tag") :+
        lit(null).cast(pType).as("__p")): _*)
    // `__p` as the final sort key makes the pick among right rows tied on
    // (key, time) deterministic (struct ordering is total): last() then
    // always selects the greatest payload, across any run/partitioning.
    // Left rows are unaffected — `__tag` already orders them after every
    // tied right row.
    val w = Window.partitionBy(col(key))
      .orderBy(col(time), col("__tag"), col("__p"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val out: Seq[Column] =
      leftCols.map(col) ++ payload.map(p => col("__asof").getField(p).as(p))
    val joined = leftSide
      .unionByName(rightSide, allowMissingColumns = true)
      .withColumn("__asof", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)
    (if (keepUnmatched) joined else joined.filter(col("__asof").isNotNull))
      .select(out: _*)
  }
}
