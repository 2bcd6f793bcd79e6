package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.functions.VectorFunctions

/** Brute-force ground truth for the no-oracle similarity queries
  * (SURVEY.md §2.6: verified internally vs brute force). */
class SimilaritySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.Sf0001

  private lazy val vecs: Map[Long, Array[Double]] =
    Q.t(spark, dir, "embeddings").collect().map { r =>
      r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray
    }.toMap

  test("q_sim_topk matches plain-Scala brute force") {
    val got = SparkEntryQueries("q_sim_topk")
    val byQuery = got.groupBy(_._1)
    assert(byQuery.size == 50)
    (0L until 50L).foreach { q =>
      val brute = vecs.toSeq.filter(_._1 != q)
        .map { case (id, v) => (id, VectorFunctions.cosineLocal(vecs(q), v)) }
        .sortBy { case (id, sim) => (-sim, id) }
        .take(3).map(_._1)
      val mine = byQuery(q).sortBy(_._4).map(_._2)
      assert(mine == brute, s"query $q: got $mine want $brute")
    }
  }

  test("q_embed_neardup matches brute-force pair set") {
    val rows = Similarity.queries("q_embed_neardup")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ids = vecs.keys.toSeq.sorted
    val brute = (for {
      i <- ids; j <- ids if i < j
      if VectorFunctions.cosineLocal(vecs(i), vecs(j)) > 0.4
    } yield (i, j)).toSet
    assert(rows == brute)
  }

  test("q_ann_lsh returns correctly-scored subset with sane recall") {
    val ann = SparkEntryQueries("q_ann_lsh")
    val exact = SparkEntryQueries("q_sim_topk")
    // every ANN hit's similarity must match the true cosine (rounded)
    ann.foreach { case (q, n, sim, _) =>
      val truth = math.rint(VectorFunctions.cosineLocal(vecs(q), vecs(n)) * 1e4) / 1e4
      assert(math.abs(sim - truth) < 1e-9, s"($q,$n)")
    }
    // pigeonhole recall: with 12 planes on 500 random vectors the bucket
    // join finds some but not all true neighbors — require > 0 overlap
    // and no more rows than the exact top-k.
    val annPairs = ann.map(r => (r._1, r._2)).toSet
    val exactPairs = exact.map(r => (r._1, r._2)).toSet
    assert(annPairs.nonEmpty)
    assert(ann.size <= exact.size)
    assert(annPairs.intersect(exactPairs).nonEmpty)
  }

  /** (query_id, neighbor_id, sim, rank) rows. */
  private def SparkEntryQueries(name: String): Seq[(Long, Long, Double, Long)] =
    Similarity.queries(name)(spark, dir).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
}
