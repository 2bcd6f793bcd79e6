package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.wheel.AllAggregate

/** Custom stateful streaming aggregation via `mapGroupsWithState`
  * (SURVEY.md §2.3 streaming row): the streaming analogue of the wheel
  * writer's insert path (/root/reference/src/main.rs:128–139) — one
  * [[AllAggregate]] partial per key held in Spark-managed state,
  * combined with each micro-batch and re-emitted. Demonstrates the
  * custom-state extension point beyond built-in windowed aggregation;
  * the buffer is one fixed-size struct per key, so state size is
  * O(|keys|), never O(rows). */
object StatefulAll {

  final case class KeyedAll(key: Long, sum_v: Double, cnt: Long,
      min_v: Double, max_v: Double)

  /** Running lifetime `All` aggregate per key over a streaming
    * `(key, value)` Dataset. Output mode must be `update`. */
  def perKeyRunningAll(events: Dataset[(Long, Double)]): Dataset[KeyedAll] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (key: Long, rows: Iterator[(Long, Double)], state: GroupState[AllAggregate]) =>
          val updated = rows.foldLeft(state.getOption.getOrElse(AllAggregate.identity)) {
            (acc, r) => acc.combine(AllAggregate.lift(r._2))
          }
          state.update(updated)
          KeyedAll(key, updated.sum, updated.count, updated.min, updated.max)
      }
  }

  /** The only output mode `mapGroupsWithState` supports. */
  val RequiredOutputMode: OutputMode = OutputMode.Update()
}
