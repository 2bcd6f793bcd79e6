package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Round-5 additions: cross-formulation parity for the rewritten hot
  * queries (local-count q_repetition, broadcast-first q_contamination)
  * and property checks for the new cleaning/dedup/argmax operators
  * beyond their DuckDB oracles. */
class Round5Spec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.Sf0001

  test("q_repetition local counting matches the explode formulation") {
    val fast = Text.queries("q_repetition")(spark, dir).collect()
    val K = 3
    val toks = split(col("text"), " ")
    val shingles = transform(
      sequence(lit(1), size(toks) - (K - 1)),
      i => concat_ws(" ", slice(toks, i, lit(K))))
    val slow = Q.t(spark, dir, "documents")
      .filter(size(toks) >= K)
      .select(col("doc_id"), explode(shingles).as("sh"))
      .groupBy(col("doc_id"), col("sh"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(max(col("c")).as("max_rep"),
        sum(col("c")).as("n_grams"),
        (max(col("c")).cast("double") / sum(col("c"))).as("rep_ratio"))
      .orderBy(col("doc_id"))
      .collect()
    assert(fast.length === slow.length)
    fast.zip(slow).foreach { case (f, sl) => assert(f === sl) }
  }

  test("q_contamination broadcast-first matches distinct-then-join") {
    val fast = Text.queries("q_contamination")(spark, dir).collect()
    val K = 4
    val toks = split(col("text"), " ")
    val shingles = transform(
      sequence(lit(1), size(toks) - (K - 1)),
      i => concat_ws(" ", slice(toks, i, lit(K))))
    val d = Q.t(spark, dir, "documents")
      .filter(size(toks) >= K)
      .select(col("doc_id"), explode(shingles).as("sh"))
    val test0 = d.filter(col("doc_id") < 10)
      .select(col("doc_id").as("test_doc"), col("sh")).distinct()
    val slow = d.filter(col("doc_id") >= 10).distinct()
      .join(test0, "sh")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingle_hits"),
        countDistinct(col("test_doc")).as("n_test_docs"))
      .orderBy(col("doc_id"))
      .collect()
    assert(fast.length === slow.length)
    fast.zip(slow).foreach { case (f, sl) => assert(f === sl) }
  }

  test("q_chunk_dedup totals: chunk counts cover every token window and " +
      "corpus-wide firsts equal distinct chunk hashes") {
    val rows = Text.queries("q_chunk_dedup")(spark, dir).collect()
    val W = 10
    val toks = split(col("text"), " ")
    val expectedChunks = Q.t(spark, dir, "documents")
      .select((ceil(size(toks).cast("double") / W)).cast("long").as("nc"))
      .agg(sum(col("nc"))).collect()(0).getLong(0)
    assert(rows.map(_.getLong(1)).sum === expectedChunks)
    // exactly one "first" per distinct chunk hash across the corpus
    val distinctHashes = Q.t(spark, dir, "documents")
      .select(col("doc_id"), explode(transform(
        sequence(lit(1), size(toks), lit(W)),
        i => md5(concat_ws(" ", slice(toks, i, lit(W)))))).as("h"))
      .select(col("h")).distinct().count()
    assert(rows.map(_.getLong(2)).sum === distinctHashes)
    rows.foreach { r =>
      assert(r.getLong(2) >= 0 && r.getLong(2) <= r.getLong(1))
    }
  }

  test("q_argminmax picks rows achieving the group extremes") {
    val byPrio = Round5Spec.collectMap(
      Aggregates.queries("q_argminmax")(spark, dir))
    val orders = Q.t(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"))
      .collect()
      .groupBy(_.getString(1))
    byPrio.foreach { case (prio, (maxOrder, minOrder, maxPrice, minPrice)) =>
      val group = orders(prio)
      assert(group.map(_.getDouble(2)).max === maxPrice)
      assert(group.map(_.getDouble(2)).min === minPrice)
      val maxRow = group.find(_.getLong(0) == maxOrder).get
      val minRow = group.find(_.getLong(0) == minOrder).get
      assert(maxRow.getDouble(2) === maxPrice)
      assert(minRow.getDouble(2) === minPrice)
    }
  }

  test("q_pii_redact finds the one planted email+phone per page and " +
      "the redacted text no longer matches the patterns") {
    val rows = Pipeline.queries("q_pii_redact")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) === 1L, s"emails in doc ${r.getLong(0)}")
      assert(r.getLong(2) === 1L, s"phones in doc ${r.getLong(0)}")
    }
    // the n_emails/n_phones == 1 assertions above prove both patterns
    // matched every page, so regexp_replace necessarily rewrote each
    // one; here just check the digests are well-formed and per-doc
    // unique (each page embeds its doc_id)
    assert(rows.map(_.getString(3)).distinct.length === rows.length)
    rows.foreach(r => assert(r.getString(3).matches("[0-9a-f]{32}")))
  }

  test("q_html_strip removes every tag and never grows the text") {
    val rows = Pipeline.queries("q_html_strip")(spark, dir).collect()
    rows.foreach { r =>
      assert(r.getLong(2) < r.getLong(1),
        s"clean not shorter for doc ${r.getLong(0)}")
      assert(!r.getString(3).contains("<") && !r.getString(3).contains(">"))
    }
  }

  test("q_corpus_assembly: gates hold, one winner per text hash, splits valid") {
    val rows = Pipeline.queries("q_corpus_assembly")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(Set("en", "de", "fr")(r.getString(1)))
      val n = r.getLong(3)
      assert(n >= 20 && n <= 1000, s"doc ${r.getLong(0)}: $n tokens")
      assert(Set("train", "val", "test")(r.getString(4)))
    }
    val gated = Q.t(spark, dir, "documents")
      .filter(col("lang").isin("en", "de", "fr"))
      .filter(size(split(col("text"), " ")).between(20, 1000))
    val expected = gated.select(md5(col("text"))).distinct().count()
    assert(rows.length.toLong === expected,
      "one manifest row per distinct surviving text")
  }

  test("q_try_arith: zero divisors become NULL, sums skip them") {
    val rows = Scalars.queries("q_try_arith")(spark, dir).collect()
    assert(rows.nonEmpty)
    val exact = Q.t(spark, dir, "events")
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("int").as("k"))
      .filter(col("k") === 50)
      .groupBy(col("event_type")).agg(count(lit(1)).as("nz"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      assert(r.getLong(2) === exact.getOrElse(r.getString(0), 0L),
        s"${r.getString(0)}: null-division count")
      assert(!r.getDouble(3).isNaN && !r.getDouble(3).isInfinite)
    }
  }

  test("q_nested_agg emits sorted, well-formed JSON nation arrays") {
    val rows = Scalars.queries("q_nested_agg")(spark, dir).collect()
    assert(rows.length === 5) // one per region
    rows.foreach { r =>
      val json = r.getString(1)
      assert(json.startsWith("[{\"nation\":\"") && json.endsWith("}]"), json)
      val nations = "\"nation\":\"([^\"]+)\"".r
        .findAllMatchIn(json).map(_.group(1)).toSeq
      assert(nations == nations.sorted, s"unsorted: $nations")
      assert(nations.distinct.size == nations.size)
    }
  }

  test("q_join_salted equals the unsalted join") {
    val salted = Joins.queries("q_join_salted")(spark, dir).collect()
    val plain = Q.t(spark, dir, "customer")
      .join(Q.t(spark, dir, "nation"),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_cust"),
        sum(col("c_acctbal").cast("decimal(18,4)")).cast("double").as("total_bal"))
      .orderBy(col("n_name"))
      .collect()
    assert(salted.length === plain.length)
    salted.zip(plain).foreach { case (s0, p0) => assert(s0 === p0) }
  }

  test("q_join_bloom equals the plain (unfiltered, broadcast-free) join") {
    val bloomed = Joins.queries("q_join_bloom")(spark, dir).collect()
    val o = Q.t(spark, dir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"))
    val plain = Q.t(spark, dir, "lineitem")
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("total"))
      .orderBy(col("l_returnflag"))
      .collect()
    assert(bloomed.length === plain.length)
    bloomed.zip(plain).foreach { case (b, p) => assert(b === p) }
  }

  test("q_data_mixture: prefix-closed per lang, shares within one doc of the budget") {
    val rows = Pipeline.queries("q_data_mixture")(spark, dir).collect()
    assert(rows.nonEmpty)
    val totals = Q.t(spark, dir, "documents")
      .groupBy(col("lang"))
      .agg(sum(size(split(col("text"), " ")).cast("long")).as("tot"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val budget = totals.values.min
    val byLang = rows.groupBy(_.getString(1))
    assert(byLang.keySet == totals.keySet, "every language contributes")
    byLang.foreach { case (lang, docs) =>
      val share = docs.map(_.getLong(2)).sum
      assert(share <= budget, s"$lang over budget: $share > $budget")
      // greedy prefix: the next doc (if any) would overflow the budget
      val kept = docs.map(_.getLong(0)).toSet
      val next = Q.t(spark, dir, "documents").filter(col("lang") === lang)
        .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n"))
        .collect().sortBy(_.getLong(0))
        .find(r => !kept(r.getLong(0)))
      next.foreach(r => assert(share + r.getLong(1) > budget,
        s"$lang: doc ${r.getLong(0)} was skipped but fits"))
      // prefix-closed: kept ids are exactly the smallest ids of the lang
      val allIds = Q.t(spark, dir, "documents").filter(col("lang") === lang)
        .select(col("doc_id")).collect().map(_.getLong(0)).sorted
      assert(allIds.take(kept.size).toSet == kept, s"$lang not prefix-closed")
    }
  }

  test("q_bm25 scores satisfy the BM25 formula against independent corpus stats") {
    val rows = Text.queries("q_bm25")(spark, dir).collect()
    assert(rows.nonEmpty)
    // independent N / avgdl from the raw table
    val lens = Q.t(spark, dir, "documents")
      .select(size(split(col("text"), " ")).cast("long").as("len"))
      .collect().map(_.getLong(0))
    val n = lens.length.toDouble
    val avgdl = lens.sum.toDouble / n
    rows.groupBy(_.getLong(0)).foreach { case (_, perDoc) =>
      // ranks are 1..k and scores non-increasing in rank order
      val byRk = perDoc.sortBy(_.getLong(1))
      assert(byRk.map(_.getLong(1)).toSeq === (1L to byRk.length))
      assert(byRk.map(_.getDouble(6)).toList.sliding(2).forall {
        case List(a, b) => a >= b; case _ => true
      })
      byRk.foreach { r =>
        val tf = r.getLong(3).toDouble
        val df = r.getLong(4).toDouble
        val len = r.getLong(5).toDouble
        val idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
        val expected = idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * len / avgdl))
        assert(math.abs(r.getDouble(6) - expected) < 1e-4 + 1e-9,
          s"doc ${r.getLong(0)} tok ${r.getString(2)}")
      }
    }
  }
}

object Round5Spec {
  import org.apache.spark.sql.DataFrame

  /** q_argminmax rows keyed by priority. */
  private def collectMap(df: DataFrame): Map[String, (Long, Long, Double, Double)] =
    df.collect().map { r =>
      r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    }.toMap
}
