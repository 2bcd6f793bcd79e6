package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract self-checks: the queries map is collision-free (the
  * groups merge with ++, so a duplicated key would silently shadow an
  * operator) and every oracle belongs to a declared query. */
class SparkEntrySpec extends AnyFunSuite {

  test("no query key collisions across groups") {
    val groups = Seq(
      graft.queries.Core.queries, graft.queries.Aggregates.queries,
      graft.queries.Joins.queries, graft.queries.Windows.queries,
      graft.queries.Analytics.queries, graft.queries.Subqueries.queries,
      graft.queries.SetOps.queries, graft.queries.Scalars.queries,
      graft.queries.Text.queries, graft.queries.Pipeline.queries,
      graft.queries.Similarity.queries,
      graft.queries.Multimodal.queries)
    assert(SparkEntry.queries.size == groups.map(_.size).sum,
      "a duplicate key across query groups is shadowing an operator")
  }

  test("every oracle key names a declared query; all keys are q_-prefixed") {
    val orphan = SparkEntry.oracleSql.keySet.diff(SparkEntry.queries.keySet)
    assert(orphan.isEmpty, s"oracles without queries: $orphan")
    assert(SparkEntry.queries.keySet.forall(_.startsWith("q_")))
  }

  test("flagship entry returns rows on sf0.001") {
    assert(SparkEntry.entry(TestSpark.spark).count() > 0)
  }
}
