package graft

import org.scalatest.funsuite.AnyFunSuite

/** SURVEY.md §2.6 is a binding contract, not prose ("keys become
  * `SparkEntry.queries`") — VERDICT r6 flagged the table lagging the
  * code by three keys. This spec enforces the binding in BOTH
  * directions: every served query key must appear in a §2.6 table row's
  * first cell, and every declared key must be served. The document can
  * no longer silently drift from the code in either direction. */
class SurveyContractSpec extends AnyFunSuite {

  test("SURVEY §2.6 declared keys == SparkEntry.queries keys") {
    val text = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("SURVEY.md")),
      java.nio.charset.StandardCharsets.UTF_8)
    val parts = text.split("### 2\\.6 ")
    assert(parts.length == 2, "SURVEY.md must contain exactly one §2.6 header")
    val section = parts(1).split("### 2\\.7 ")(0)
    val key = "`(q_[a-z0-9_]+)`".r
    // first table cell only: later columns reference OTHER keys in
    // prose ("recall vs q_sim_topk"), which are not declarations
    val declared = section.linesIterator
      .filter(_.startsWith("| `q_"))
      .flatMap(line => key.findAllMatchIn(line.split("\\|")(1)).map(_.group(1)))
      .toSet
    val served = SparkEntry.queries.keySet
    assert((served -- declared).isEmpty,
      s"served by SparkEntry.queries but missing from SURVEY §2.6: ${(served -- declared).toSeq.sorted}")
    assert((declared -- served).isEmpty,
      s"declared in SURVEY §2.6 but not served: ${(declared -- served).toSeq.sorted}")
  }

  test("every oracleSql key is a served query key") {
    val served = SparkEntry.queries.keySet
    val orphans = SparkEntry.oracleSql.keySet -- served
    assert(orphans.isEmpty, s"oracle SQL for undeclared queries: $orphans")
  }
}
