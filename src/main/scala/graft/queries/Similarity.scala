package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.VectorFunctions._
import Q._

/** Similarity search over the embeddings table (builder prompt:
  * "approximate-nearest-neighbor over an embedding column"):
  * brute-force cosine top-k as the exactness baseline, an all-pairs
  * near-duplicate join, and a sign-LSH bucketed variant as the scale
  * path. Scoring = normalize once per vector, then the native codegen
  * [[graft.functions.DotProduct]] per pair — no boxing in the hot loop
  * (the higher-order-function formulation was ~20× slower).
  *
  * None of these carry a SQL oracle (float-order sensitivity — SURVEY.md
  * §2.6); ScalaTest verifies them against a plain-Scala brute force.
  *
  * Scale posture: the query set and the LSH bucket map are broadcast;
  * candidates stream. Brute-force top-k is O(Q·N) with Q bounded — the
  * honest baseline; the LSH variant prunes N to a bucket, which is the
  * 100 TB path (per-bucket shuffles, no cross join of the full table). */
object Similarity {

  private val NumQueries = 50
  private val TopK = 3
  private val NearDupThreshold = 0.4 // synthetic embeddings are near-random; max cos ≈ 0.51
  // Multi-table sign-LSH: L independent tables of k hyperplanes each.
  // Collision prob per table ≈ (1 - θ/π)^k, union over L tables — k sets
  // bucket selectivity, L buys recall.
  private val LshTables = 8
  private val LshPlanesPerTable = 6

  /** Vectors L2-normalized ONCE per row (norms are not recomputed per
    * pair), so pair similarity is a single codegen [[graft.functions
    * .DotProduct]] — the hot-path shape that survives a 100× scale-up. */
  private def embeddings(s: org.apache.spark.sql.SparkSession, dir: String) = {
    graft.functions.DotProduct.register(s)
    t(s, dir, "embeddings")
      .select(col("vec_id"), asDouble(col("embedding")).as("raw"))
      .withColumn("nrm", sqrt(call_function("graft_dot", col("raw"), col("raw"))))
      .withColumn("v", when(col("nrm") === 0.0, col("raw"))
        .otherwise(transform(col("raw"), _ / col("nrm"))))
      .select(col("vec_id"), col("v"))
  }

  /** Cosine of two pre-normalized vectors = codegen dot product. */
  private def sim(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    call_function("graft_dot", a, b)

  val queries: Map[String, Fn] = Map(
    // Brute-force cosine top-k: broadcast the bounded query set, stream
    // all candidates, window-rank per query.
    "q_sim_topk" -> ((s, dir) => {
      val all = embeddings(s, dir)
      val q = broadcast(all.filter(col("vec_id") < NumQueries)
        .withColumnRenamed("vec_id", "query_id").withColumnRenamed("v", "qv"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("sim").desc, col("vec_id"))
      all.crossJoin(q)
        .filter(col("vec_id") =!= col("query_id"))
        .withColumn("sim", sim(col("qv"), col("v")))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= TopK)
        .select(col("query_id"), col("vec_id").as("neighbor_id"),
          round(col("sim"), 4).as("sim"), col("rk").cast("long").as("rk"))
        .orderBy(col("query_id"), col("rk"))
    }),

    // Embedding-cosine near-duplicate pairs (a < b upper triangle).
    // Brute force is the correctness baseline; q_ann_lsh is the scale path.
    "q_embed_neardup" -> ((s, dir) => {
      val a = embeddings(s, dir)
        .withColumnRenamed("vec_id", "vec_a").withColumnRenamed("v", "va")
      val b = embeddings(s, dir)
        .withColumnRenamed("vec_id", "vec_b").withColumnRenamed("v", "vb")
      a.crossJoin(b)
        .filter(col("vec_a") < col("vec_b"))
        .withColumn("sim", sim(col("va"), col("vb")))
        .filter(col("sim") > NearDupThreshold)
        .select(col("vec_a"), col("vec_b"), round(col("sim"), 4).as("sim"))
        .orderBy(col("vec_a"), col("vec_b"))
    }),

    // Multi-table sign-LSH ANN: every vector gets L bucket keys (one per
    // table); candidates = equi-join on bucket key instead of a cross
    // join; dedupe across tables, rank by true cosine. Recall vs
    // q_sim_topk is checked in ScalaTest.
    "q_ann_lsh" -> ((s, dir) => {
      val planes = hyperplanes(LshTables * LshPlanesPerTable, 64)
      val bucketsUdf = udf((v: Seq[Double]) =>
        Array.tabulate(LshTables) { l =>
          var bucket = 0L
          var p = 0
          while (p < LshPlanesPerTable) {
            val plane = planes(l * LshPlanesPerTable + p)
            var d = 0.0; var i = 0
            while (i < plane.length && i < v.length) { d += plane(i) * v(i); i += 1 }
            if (d >= 0) bucket |= 1L << p
            p += 1
          }
          bucket | (l.toLong << 16) // table id disambiguates bucket space
        })
      val all = embeddings(s, dir)
        .select(col("vec_id"), col("v"), explode(bucketsUdf(col("v"))).as("bucket"))
      val q = broadcast(all.filter(col("vec_id") < NumQueries)
        .select(col("vec_id").as("query_id"), col("v").as("qv"), col("bucket")))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("sim").desc, col("vec_id"))
      all.join(q, "bucket")
        .filter(col("vec_id") =!= col("query_id"))
        .dropDuplicates("query_id", "vec_id")
        .withColumn("sim", sim(col("qv"), col("v")))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= TopK)
        .select(col("query_id"), col("vec_id").as("neighbor_id"),
          round(col("sim"), 4).as("sim"), col("rk").cast("long").as("rk"))
        .orderBy(col("query_id"), col("rk"))
    }))

  /** No SQL oracles: float-order-sensitive ranking (SURVEY.md §2.6). */
  val oracle: Map[String, String] = Map.empty
}
