package graft.sources

import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}

import graft.wheel.AllAggregate

/** Streaming read of the LIVE wheel registration (round 14, VERDICT r13
  * #5): `spark.readStream.format("wheel").option("source", path)` is a
  * [[MicroBatchStream]] that emits, per micro-batch, the (key,) slot
  * partial rows whose ROW COUNT changed since the previous batch — the
  * push counterpart of the round-13 mid-ingest batch re-read, so a
  * dashboard subscribes to slot deltas instead of polling.
  *
  * Contract: this is a LIVE-STATE delta feed, not a replayable log —
  * the source of truth is the in-memory registration that
  * [[graft.streaming.WheelIngest]] refreshes after each committed
  * batch. Each emitted row carries the slot's CURRENT cumulative
  * partials (same schema and semantics as the batch table), so a
  * consumer upserts by (key, slot_ms) and is always eventually
  * consistent with the index; a restart from a checkpoint re-emits the
  * full populated state once (the upsert absorbs it). Every batch is
  * O(changed slots) to plan and bounded by |keys| × minutes to replay —
  * never by source volume.
  *
  * The offset is a monotone VERSION: `latestOffset()` diffs the live
  * per-slot row counts against the last observed map (row counts only
  * grow under ingest merges, so equality ⇔ unchanged partials) and
  * stashes the changed rows under the new version; `planInputPartitions`
  * serves the stashed versions in `(start, end]`; `commit` drops served
  * stashes. */
private[sources] final case class WheelVersionOffset(v: Long) extends Offset {
  override def json(): String = v.toString
}

private[sources] abstract class WheelStreamBase(fields: Array[String])
    extends MicroBatchStream {

  /** (identity key for the diff map, current rows, row values). */
  protected def liveRows(): Iterator[(Any, Long, () => Array[Any])]

  private var seen: Map[Any, Long] = Map.empty
  private var version = 0L
  private val pending =
    scala.collection.mutable.TreeMap.empty[Long, Array[Array[Any]]]

  override def initialOffset(): Offset = WheelVersionOffset(0L)

  override def deserializeOffset(json: String): Offset = synchronized {
    val v = json.trim.toLong
    // restart: adopt the checkpointed version so the counter stays
    // monotone; `seen` is empty, so the next latestOffset() stashes the
    // full populated state (the consumer's upsert absorbs the replay)
    if (v > version) version = v
    WheelVersionOffset(v)
  }

  override def latestOffset(): Offset = synchronized {
    val changed = Array.newBuilder[Array[Any]]
    val now = Map.newBuilder[Any, Long]
    liveRows().foreach { case (id, rows, mk) =>
      if (rows > 0L) {
        now += id -> rows
        if (!seen.get(id).contains(rows)) changed += mk()
      }
    }
    val rows = changed.result()
    if (rows.nonEmpty) {
      version += 1
      pending += version -> rows
      seen = now.result()
    }
    WheelVersionOffset(version)
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] =
    synchronized {
      val s = start.asInstanceOf[WheelVersionOffset].v
      val e = end.asInstanceOf[WheelVersionOffset].v
      val stashed = pending.range(s + 1, e + 1).valuesIterator.flatten.toArray
      Array(WheelInputPartition(stashed))
    }

  override def createReaderFactory(): PartitionReaderFactory = WheelReaderFactory

  override def commit(end: Offset): Unit = synchronized {
    val e = end.asInstanceOf[WheelVersionOffset].v
    pending.keys.takeWhile(_ <= e).toSeq.foreach(pending.remove)
  }

  override def stop(): Unit = ()
}

/** Unkeyed live stream: one row per changed minute slot. `loPushed` /
  * `hiPushed` are the statement's pushed slot_ms bounds (None = open —
  * the live horizon keeps extending, so the resolve-time span must NOT
  * cap the walk). */
private[sources] final class WheelMicroBatchStream(source: String,
    fields: Array[String], loPushed: Option[Long], hiPushed: Option[Long])
  extends WheelStreamBase(fields) {

  protected def liveRows(): Iterator[(Any, Long, () => Array[Any])] = {
    val (_, wheels) = graft.plans.WheelAcceleration.registeredWheels(source)
      .getOrElse(throw new IllegalStateException(
        s"wheel stream: no live registration for source '$source' " +
          "(was it unregistered mid-stream?)"))
    val measures = wheels.keys.toSeq.sorted
    val any = wheels(measures.head)
    val a = loPushed.fold(any.baseMs)(math.max(_, any.baseMs))
    val b = hiPushed.fold(any.horizonMs)(math.min(_, any.horizonMs))
    if (a >= b) Iterator.empty
    else any.minuteEntries(a, b).map { case (slotMs, headAgg) =>
      (slotMs: Any, headAgg.rows, () => {
        val aggs: Map[String, AllAggregate] = measures.map(c =>
          c -> (if (c == measures.head) headAgg
                else wheels(c).minuteAt(slotMs))).toMap
        fields.map[Any] {
          case "slot_ms" => slotMs
          case "rows" => headAgg.rows
          case f => SlotFields.measureValue(f, aggs)
        }
      })
    }
  }
}

/** Keyed live stream: one row per changed (dimension key, minute slot),
  * honoring the statement's pushed key membership. */
private[sources] final class KeyedWheelMicroBatchStream(source: String,
    keyCol: String, fields: Array[String],
    loPushed: Option[Long], hiPushed: Option[Long],
    keySet: Option[Set[Any]], dropNullKey: Boolean)
  extends WheelStreamBase(fields) {

  private def keep(key: Any): Boolean =
    (!dropNullKey || key != null) && keySet.forall(_.contains(key))

  protected def liveRows(): Iterator[(Any, Long, () => Array[Any])] = {
    val (kc, _, wheels) =
      graft.plans.WheelAcceleration.registeredKeyedWheels(source)
        .getOrElse(throw new IllegalStateException(
          s"wheel stream: no live KEYED registration for source '$source' " +
            "(was it unregistered mid-stream?)"))
    require(kc == keyCol,
      s"wheel stream: registration key column changed ('$keyCol' -> '$kc')")
    val measures = wheels.keys.toSeq.sorted
    val any = wheels(measures.head)
    val a = loPushed.fold(any.baseMs)(math.max(_, any.baseMs))
    val b = hiPushed.fold(any.horizonMs)(math.min(_, any.horizonMs))
    if (a >= b) Iterator.empty
    else any.minuteEntries(a, b)
      .filter { case (k, _, _) => keep(k) }
      .map { case (key, slotMs, headAgg) =>
        ((key, slotMs): Any, headAgg.rows, () => {
          val aggs: Map[String, AllAggregate] = measures.map(c =>
            c -> (if (c == measures.head) headAgg
                  else wheels(c).minuteAt(key, slotMs))).toMap
          fields.map[Any] {
            case f if f == keyCol => SlotFields.toInternal(key)
            case "slot_ms" => slotMs
            case "rows" => headAgg.rows
            case f => SlotFields.measureValue(f, aggs)
          }
        })
      }
  }
}
