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

  test("q_embed_neardup: precision 1 vs brute force, deterministic recall") {
    val rows = Similarity.queries("q_embed_neardup")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ids = vecs.keys.toSeq.sorted
    val brute = (for {
      i <- ids; j <- ids if i < j
      if VectorFunctions.cosineLocal(vecs(i), vecs(j)) > 0.4
    } yield (i, j)).toSet
    // exact verification of every LSH candidate ⇒ no false positives
    assert(rows.subsetOf(brute), s"false positives: ${rows.diff(brute)}")
    // deterministic planes + fixture ⇒ recall is a constant; these
    // borderline pairs (cos barely over τ=0.4 on near-random synthetic
    // vectors) are the LSH worst case — true near-dups approach recall 1
    // (planted-pair test below).
    val recall = if (brute.isEmpty) 1.0 else rows.size.toDouble / brute.size
    assert(recall >= 0.85, s"recall $recall (${rows.size}/${brute.size})")
  }

  test("bucketNearDups: over-budget dup-dense bucket emits linear star pairs (round 11)") {
    def unit(axis: Int): Array[Double] = {
      val v = new Array[Double](8); v(axis) = 1.0; v
    }
    // a planted 100-way dup cluster: C(100,2) = 4950 > PairBudget, so
    // pivot mode emits 99 (min-id, member) pairs — linear, with one
    // dot-product pass instead of 4950
    val ids100 = (1L to 100L).toArray
    val same = Array.fill(100)(unit(0))
    val star = Similarity.bucketNearDups(ids100, same, 0.4)
    assert(star.size == 99)
    assert(star.forall { case (a, _, d) => a == 1L && d == 1.0 })
    assert(star.map(_._2).toSet == (2L to 100L).toSet)
    // two orthogonal 50-clusters in one over-budget bucket: each
    // cluster's min id becomes its pivot; no cross-cluster pairs
    val mixed = Array.tabulate(100)(i => unit(i % 2))
    val ids = (1L to 100L).toArray
    val out = Similarity.bucketNearDups(ids, mixed, 0.4)
    assert(out.size == 98)
    val byPivot = out.groupBy(_._1)
    assert(byPivot.keySet == Set(1L, 2L)) // ids 1,2 are the two clusters' minima
    assert(byPivot(1L).map(_._2).toSet == (3L to 99L by 2).toSet)
    assert(byPivot(2L).map(_._2).toSet == (4L to 100L by 2).toSet)
    // below the budget: exact all-pairs, unchanged
    val small = Similarity.bucketNearDups((1L to 10L).toArray,
      Array.fill(10)(unit(0)), 0.4)
    assert(small.size == 45)
    assert(small.forall(_._3 == 1.0))
  }

  test("q_embed_neardup finds every planted near-duplicate pair") {
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.{Row, types => T}
    val r = new scala.util.Random(123)
    val base = Array.fill(100)(Array.fill(64)(r.nextGaussian().toFloat))
    // 5 planted near-identical copies of vectors 0..4 (tiny perturbation)
    val planted = (0 until 5).map { i =>
      base(i).map(x => x + (r.nextGaussian() * 1e-3).toFloat)
    }
    val rows = (base ++ planted).zipWithIndex.map { case (v, i) =>
      Row(i.toLong, v.toSeq)
    }
    val schema = T.StructType(Seq(
      T.StructField("vec_id", T.LongType, nullable = false),
      T.StructField("embedding", T.ArrayType(T.FloatType), nullable = false)))
    val tmp = "target/test-fixtures/planted"
    spark.createDataFrame(rows.toSeq.asJava, schema)
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    val got = Similarity.queries("q_embed_neardup")(spark, tmp).collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    (0 until 5).foreach { i =>
      assert(got.contains((i.toLong, (100 + i).toLong)),
        s"planted pair ($i, ${100 + i}) missed; got ${got.size} pairs")
    }
  }

  test("q_semdedup with one cell equals exact greedy keep-lowest dedup (round 12)") {
    val norm: Map[Long, Array[Double]] = vecs.map { case (id, v) =>
      val n = math.sqrt(VectorFunctions.dotLocal(v, v))
      id -> (if (n == 0) v else v.map(_ / n))
    }
    val kept = scala.collection.mutable.ArrayBuffer.empty[Long]
    vecs.keys.toSeq.sorted.foreach { id =>
      if (!kept.exists(k => VectorFunctions.dotLocal(norm(k), norm(id)) > 0.4))
        kept += id
    }
    val got = Similarity.semDedup(spark, dir, Some(1), 0.4)
      .collect().map(_.getLong(0)).toSet
    assert(got == kept.toSet,
      s"extra=${(got -- kept).toSeq.sorted.take(5)} missing=${(kept.toSet -- got).toSeq.sorted.take(5)}")
  }

  test("q_semdedup drops every planted duplicate and keeps its representative (round 12)") {
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.{Row, types => T}
    val r = new scala.util.Random(321)
    val base = Array.fill(100)(Array.fill(64)(r.nextGaussian().toFloat))
    val planted = (0 until 5).map { i =>
      base(i).map(x => x + (r.nextGaussian() * 1e-3).toFloat)
    }
    val rows = (base ++ planted).zipWithIndex.map { case (v, i) =>
      Row(i.toLong, v.toSeq)
    }
    val schema = T.StructType(Seq(
      T.StructField("vec_id", T.LongType, nullable = false),
      T.StructField("embedding", T.ArrayType(T.FloatType), nullable = false)))
    val tmp = "target/test-fixtures/planted-semdedup"
    spark.createDataFrame(rows.toSeq.asJava, schema)
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    // near-identical copies land in the same nearest cell as their
    // original, so default cells still see every planted pair
    val got = Similarity.queries("q_semdedup")(spark, tmp).collect()
      .map(_.getLong(0)).toSet
    (0 until 5).foreach { i =>
      assert(got.contains(i.toLong), s"representative $i dropped")
      assert(!got.contains((100 + i).toLong), s"planted dup ${100 + i} survived")
    }
  }

  test("semDedup greedy walk keeps chain tails in SMALL cells (round 13, ADVICE r12)") {
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.{Row, types => T}
    // a ~ b, b ~ c, a !~ c: greedy keep-lowest keeps {a, c} — c's only
    // near-dup b was itself dropped. The pre-r13 pair rule ("drop the
    // higher id of every pair") over-dropped c whenever the cell was
    // small enough to take the all-pairs branch; this 3-vector cell is
    // exactly that regime.
    val dim = 64
    def unit(i: Int): Array[Float] = Array.tabulate(dim)(j => if (j == i) 1f else 0f)
    val a = unit(0)
    val c = unit(1)
    val s = (1.0 / math.sqrt(2)).toFloat
    val b = Array.tabulate(dim)(j => (a(j) + c(j)) * s) // cos(a,b)=cos(b,c)=0.707, cos(a,c)=0
    val rows = Seq(Row(0L, a.toSeq), Row(1L, b.toSeq), Row(2L, c.toSeq))
    val schema = T.StructType(Seq(
      T.StructField("vec_id", T.LongType, nullable = false),
      T.StructField("embedding", T.ArrayType(T.FloatType), nullable = false)))
    val tmp = "target/test-fixtures/semdedup-chain"
    spark.createDataFrame(rows.asJava, schema)
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    val kept = Similarity.semDedup(spark, tmp, Some(1), 0.5)
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(0L, 2L), s"expected {0, 2} kept, got $kept")
    assert(Similarity.lastOversizedCells == 0L)
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

  test("q_ann_ivf scores exactly and recalls most exact top-k neighbors") {
    val ivf = SparkEntryQueries("q_ann_ivf")
    val exact = SparkEntryQueries("q_sim_topk")
    // every IVF hit's similarity must be the true cosine (rounded)
    ivf.foreach { case (q, n, sim, _) =>
      val truth = math.rint(VectorFunctions.cosineLocal(vecs(q), vecs(n)) * 1e4) / 1e4
      assert(math.abs(sim - truth) < 1e-9, s"($q,$n)")
    }
    assert(ivf.map(_._1).distinct.size == 50) // every query answered
    // learned cells + 4-probe: recall vs exact top-k is deterministic on
    // the fixed fixture; require a solid floor
    val ivfPairs = ivf.map(r => (r._1, r._2)).toSet
    val exactPairs = exact.map(r => (r._1, r._2)).toSet
    val recall = ivfPairs.intersect(exactPairs).size.toDouble / exactPairs.size
    assert(recall >= 0.5, s"IVF recall $recall")
  }

  test("q_knn_graph: exact scores, bounded degree, sane corpus coverage") {
    val knn = SparkEntryQueries("q_knn_graph")
    // every edge's similarity is the true cosine (rounded)
    knn.foreach { case (src, n, sim, _) =>
      val truth = math.rint(VectorFunctions.cosineLocal(vecs(src), vecs(n)) * 1e4) / 1e4
      assert(math.abs(sim - truth) < 1e-9, s"($src,$n)")
    }
    // at most k neighbors per node, ranks contiguous, sims non-increasing
    knn.groupBy(_._1).foreach { case (src, rows) =>
      assert(rows.size <= 3, s"node $src has ${rows.size} neighbors")
      val byRank = rows.sortBy(_._4)
      assert(byRank.map(_._4) == (1L to rows.size).toSeq)
      byRank.map(_._3).sliding(2).foreach {
        case Seq(a, b) => assert(a >= b); case _ => ()
      }
    }
    // the graph must cover most of the corpus (every vector collides
    // with SOMETHING in 8 tables of 6 planes on 500 vectors)
    assert(knn.map(_._1).distinct.size >= vecs.size * 9 / 10,
      s"only ${knn.map(_._1).distinct.size} of ${vecs.size} nodes have edges")
    // and overlap the exact graph: each node's true #1 neighbor is the
    // hardest recall target; require solid aggregate overlap with the
    // exact top-3 graph
    val exactPairs = vecs.keys.toSeq.flatMap { src =>
      vecs.toSeq.filter(_._1 != src)
        .map { case (id, v) => (id, VectorFunctions.cosineLocal(vecs(src), v)) }
        .sortBy { case (id, s) => (-s, id) }.take(3).map(p => (src, p._1))
    }.toSet
    val knnPairs = knn.map(r => (r._1, r._2)).toSet
    val recall = knnPairs.intersect(exactPairs).size.toDouble / exactPairs.size
    assert(recall >= 0.2, s"knn-graph recall@3 $recall")
  }

  test("q_knn_graph finds every planted near-duplicate as the #1 neighbor") {
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.{Row, types => T}
    val r = new scala.util.Random(321)
    val base = Array.fill(100)(Array.fill(64)(r.nextGaussian().toFloat))
    val planted = (0 until 5).map { i =>
      base(i).map(x => x + (r.nextGaussian() * 1e-3).toFloat)
    }
    val rows = (base ++ planted).zipWithIndex.map { case (v, i) =>
      Row(i.toLong, v.toSeq)
    }
    val schema = T.StructType(Seq(
      T.StructField("vec_id", T.LongType, nullable = false),
      T.StructField("embedding", T.ArrayType(T.FloatType), nullable = false)))
    val tmp = "target/test-fixtures/planted-knn"
    spark.createDataFrame(rows.toSeq.asJava, schema)
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    val knn = Similarity.queries("q_knn_graph")(spark, tmp).collect()
      .map(r2 => (r2.getLong(0), r2.getLong(1), r2.getDouble(2), r2.getLong(3)))
    (0 until 5).foreach { i =>
      val copy = 100L + i
      val top = knn.filter(r2 => r2._1 == copy && r2._4 == 1L)
      assert(top.nonEmpty && top.head._2 == i.toLong && top.head._3 > 0.99,
        s"planted copy $copy: ${top.toSeq}")
    }
  }

  /** (query_id, neighbor_id, sim, rank) rows. */
  private def SparkEntryQueries(name: String): Seq[(Long, Long, Double, Long)] =
    Similarity.queries(name)(spark, dir).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
}
