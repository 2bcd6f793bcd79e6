package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability}
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, SupportsTruncate, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.sources.InsertableRelation
import org.apache.spark.sql.types.{NumericType, StructType}

import graft.wheel.PersistentWheel

/** `df.write.format("wheel")` — the wheel index WRITE path (round 13,
  * VERDICT r12 #6).
  *
  * Any DataFrame — a filtered view, a join result, a cleaned corpus —
  * persists a wheel index dir directly:
  * {{{
  *   df.write.format("wheel")
  *     .option("dir", indexDir).option("ts", "ts")
  *     .mode("overwrite").save()         // sum-family dir
  *   df.write.format("wheel")
  *     .option("dir", d).option("ts", "ts").option("key", "event_type")
  *     .mode("overwrite").save()         // keyedmulti dir
  * }}}
  * The written dir is indistinguishable from a [[PersistentWheel]] save
  * and is served by every existing dir consumer: the kind-dispatched
  * table read (`spark.read.format("wheel").option("dir", …)`),
  * `registerPersisted*`, and the ingest bootstrap.
  *
  * Options: `ts` (required — the event-time column; its presence is
  * what routes `getTable` to the write table), `key` (optional — write
  * the keyed N-measure family instead of the unkeyed sum family),
  * `measures` (optional comma list; default = every numeric column
  * except ts/key), `fingerprint` (optional provenance token recorded in
  * the sidecar; an ad-hoc DataFrame has no listable source to
  * fingerprint, so staleness checks are the CALLER's contract —
  * defaults to "dataframe").
  *
  * Implementation: the logical write is Spark's V1 fallback
  * ([[V1Write]] — the same seam Spark's own JDBC source uses), because
  * the wheel's persist IS an aggregation: the insert delegates to
  * [[PersistentWheel]]'s save pipeline, which runs ONE codegen'd
  * minute-rollup aggregation job (map-side combine, one shuffle of
  * O(slots) partials) and the atomic slots+sidecar swap. Hand-rolled
  * per-partition [[org.apache.spark.sql.connector.write.DataWriter]]s
  * would re-implement that aggregation outside Tungsten for no gain —
  * the shuffle they'd avoid moves O(slots) pre-combined rows, not data.
  *
  * Modes: `overwrite` replaces any existing dir (atomic swap — a
  * concurrent reader keeps the previous consistent index); `append`
  * refuses if the dir already holds a readable wheel (appending to an
  * index is the INGEST path's job — silently replacing under "append"
  * would be a lie). Spark itself rejects the default ErrorIfExists for
  * v2 providers with a message directing to append/overwrite. */
final class WheelWriteTable(dir: String, opts: Map[String, String],
    writeSchema: StructType) extends Table with SupportsWrite {

  override def name(): String = s"wheel:$dir?write"
  override def schema(): StructType = writeSchema
  // BATCH_WRITE gates DataFrameWriter's v2 path; V1_BATCH_WRITE makes
  // the planner accept the V1Write fallback this builder produces
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_WRITE,
      TableCapability.V1_BATCH_WRITE, TableCapability.TRUNCATE)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate {
      private var overwrite = false
      override def truncate(): WriteBuilder = { overwrite = true; this }
      override def build(): Write = new V1Write {
        override def toInsertableRelation: InsertableRelation =
          new InsertableRelation {
            override def insert(data: DataFrame, overwriteFlag: Boolean): Unit =
              WheelWriteTable.write(dir, opts, data, overwrite || overwriteFlag)
          }
      }
    }
}

private[sources] object WheelWriteTable {

  private[sources] def write(dir: String, opts: Map[String, String],
      data: DataFrame, overwrite: Boolean): Unit = {
    val spark = data.sparkSession
    val tsCol = opts.getOrElse("ts", throw new IllegalArgumentException(
      "wheel write requires option(\"ts\", <event-time column>)"))
    require(data.schema.fieldNames.contains(tsCol),
      s"wheel write: ts column '$tsCol' not in ${data.schema.fieldNames.mkString(", ")}")
    val key = opts.get("key")
    key.foreach(k => require(data.schema.fieldNames.contains(k),
      s"wheel write: key column '$k' not in ${data.schema.fieldNames.mkString(", ")}"))
    val measures = opts.get("measures")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(data.schema.fields.collect {
        case f if f.dataType.isInstanceOf[NumericType] &&
            f.name != tsCol && !key.contains(f.name) => f.name
      }.toSeq)
    require(measures.nonEmpty,
      "wheel write: no measure columns (pass option(\"measures\", …) or " +
        "include numeric columns)")
    val fp = opts.getOrElse("fingerprint", "dataframe")
    // append refuses on ANY non-empty dir, not only a readable wheel
    // (ADVICE r13): a corrupt or half-written index must not be
    // silently replaced under mode("append")
    if (!overwrite) {
      val p = new org.apache.hadoop.fs.Path(dir)
      val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
      val occupied = PersistentWheel.peek(spark, dir).isDefined ||
        (fs.exists(p) && fs.listStatus(p).nonEmpty)
      if (occupied) throw new IllegalStateException(
        s"wheel write: '$dir' is not empty (a persisted wheel, or remnants " +
          "of one) — use mode(\"overwrite\") to replace it (appending to an " +
          "index is the ingest path's job, not a batch write's)")
    }
    key match {
      case Some(k) =>
        PersistentWheel.saveKeyedMulti(spark, dir, data, k, tsCol, measures, fp)
      case None =>
        PersistentWheel.save(spark, dir, data, tsCol, measures, fp)
    }
  }

  /** True when the option set names a WRITE (the `ts` option is the
    * routing signal — reads never pass it). */
  private[sources] def isWrite(opts: Map[String, String]): Boolean =
    opts.contains("ts")

  private[sources] def forWrite(opts: Map[String, String],
      schema: StructType): Table = {
    val dir = opts.getOrElse("dir", throw new IllegalArgumentException(
      "wheel write requires option(\"dir\", <index dir>)"))
    new WheelWriteTable(dir, opts, schema)
  }
}
