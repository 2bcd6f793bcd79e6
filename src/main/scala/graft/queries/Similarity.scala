package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.VectorFunctions._
import Q._

/** Similarity search over the embeddings table (builder prompt:
  * "approximate-nearest-neighbor over an embedding column"):
  * brute-force cosine top-k as the exactness baseline, LSH-candidate
  * near-duplicate pairs with exact verification, and a sign-LSH bucketed
  * ANN as the scale path. Scoring = normalize once per vector, then the
  * native codegen [[graft.functions.DotProduct]] per pair — no boxing in
  * the hot loop (the higher-order-function formulation was ~20× slower).
  *
  * None of these carry a SQL oracle (float-order sensitivity — SURVEY.md
  * §2.6); ScalaTest verifies them against a plain-Scala brute force.
  *
  * Scale posture: the query set is broadcast and candidates stream;
  * near-dup and ANN both go through bucket hash-shuffles with
  * bounded-memory bucket collection — no cross join of the full table
  * anywhere (asserted in PlanAuditSpec). Brute-force top-k is O(Q·N)
  * with Q bounded — the honest exactness baseline. */
object Similarity {

  private val NumQueries = 50
  private val TopK = 3
  private val NearDupThreshold = 0.4 // synthetic embeddings are near-random; max cos ≈ 0.51
  // Multi-table sign-LSH: L independent tables of k hyperplanes each.
  // Collision prob per table ≈ (1 - θ/π)^k, union over L tables — k sets
  // bucket selectivity, L buys recall.
  private val LshTables = 8
  private val LshPlanesPerTable = 6
  // Near-dup banding runs wider/shallower (more tables, fewer planes):
  // at the declared τ=0.4 (θ≈66°) a pair collides in one of 16 4-plane
  // tables with p ≈ 1-(1-0.63⁴)¹⁶ ≈ 0.94; true near-dups (θ→0) are
  // found with probability ≈ 1. Deterministic planes ⇒ deterministic
  // recall on a fixed fixture (asserted in SimilaritySpec).
  // Planes-per-table ADAPTS to corpus size (k ≈ log₂(n / target-bucket))
  // so expected bucket size stays ~DupTargetBucket as n grows — bucket
  // count scales with data instead of buckets growing linearly and
  // tripping the MaxBucket guard en masse at 100×. Borderline-τ recall
  // decays with k (inherent to LSH); true near-dup recall stays ≈ 1.
  private val DupTables = 16
  private val DupPlanesPerTable = 4
  private val DupTargetBucket = 500
  /** Oversized-bucket guard for in-bucket verification (same cap as the
    * text LSH path); BoundedCollectVec truncates at MaxBucket+1. */
  private val MaxBucket = 1000
  private val boundedVecs =
    org.apache.spark.sql.functions.udaf(graft.functions.Aggregators.BoundedCollectVec(MaxBucket))

  /** In-bucket exact cosine verification with a PAIR budget (round 11,
    * VERDICT r10 #5). Below [[Text.PairBudget]] candidate pairs the
    * behavior is the unchanged exact all-pairs scan (every shipped
    * verify SF). Above it — the dup-dense regime where nearly every
    * pair verifies and output grows quadratically in cluster size —
    * the bucket switches to SemDeDup-style PIVOT clustering: walk ids
    * ascending, each still-unassigned pivot absorbs its ≥ τ neighbors
    * and emits (pivot, member) star pairs. Output is linear in bucket
    * size, dot-product work collapses to ~one pass per cluster on
    * dup-dense buckets, and the star edges are exactly what
    * keep-one-per-cluster dedup consumes (the component stays
    * connected through its canonical pivot). Declared trade: non-star
    * pair-level recall inside over-budget buckets. */
  private[queries] def bucketNearDups(ids: Array[Long],
      vecs: Array[Array[Double]], tau: Double): Seq[(Long, Long, Double)] = {
    val m = ids.length
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var k = 0
      while (k < a.length && k < b.length) { d += a(k) * b(k); k += 1 }
      d
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
    if (m.toLong * (m - 1) / 2 > Text.PairBudget) {
      val order = Array.range(0, m).sortBy(ids(_))
      val assigned = new Array[Boolean](m)
      var oi = 0
      while (oi < m) {
        val p = order(oi)
        if (!assigned(p)) {
          var oj = oi + 1
          while (oj < m) {
            val q = order(oj)
            if (!assigned(q)) {
              val d = dot(vecs(p), vecs(q))
              if (d > tau) {
                assigned(q) = true
                out += ((ids(p), ids(q), d)) // ids(p) < ids(q): ascending walk
              }
            }
            oj += 1
          }
        }
        oi += 1
      }
    } else {
      var i = 0
      while (i < m) {
        var j = i + 1
        while (j < m) {
          val d = dot(vecs(i), vecs(j))
          if (d > tau) {
            val (x, y) = if (ids(i) < ids(j)) (ids(i), ids(j)) else (ids(j), ids(i))
            out += ((x, y, d))
          }
          j += 1
        }
        i += 1
      }
    }
    out.toSeq
  }
  /** Per-bucket exact near-dup pair scan as a UDF over the bounded
    * collected (id, vec) items — shared by the LSH near-dup path and
    * the SemDeDup cells. Oversized buckets (> MaxBucket, truncated by
    * BoundedCollectVec at MaxBucket+1) emit nothing rather than a
    * partial pair set. */
  private def inBucketPairsUdf(tau: Double) =
    udf((items: Seq[org.apache.spark.sql.Row]) => {
      val m = items.length
      if (m < 2 || m > MaxBucket) Seq.empty[(Long, Long, Double)]
      else {
        val ids = new Array[Long](m)
        val vecs = new Array[Array[Double]](m)
        var i = 0
        while (i < m) {
          val r = items(i)
          ids(i) = r.getLong(0); vecs(i) = r.getSeq[Double](1).toArray
          i += 1
        }
        bucketNearDups(ids, vecs, tau)
      }
    })

  /** One-shuffle top-k with cross-table dedupe (see TopKPairs). */
  private val topKPairs =
    org.apache.spark.sql.functions.udaf(graft.functions.Aggregators.TopKPairs(TopK))

  /** Multi-table sign-LSH bucket ids (one per table) for a normalized
    * vector — shared by the ANN and near-dup paths. Each bucket id is
    * namespaced by table id so the equi-join key spans all tables. */
  private def bucketsUdfFor(tables: Int, planesPerTable: Int) = {
    val planes = hyperplanes(tables * planesPerTable, 64)
    udf((v: Seq[Double]) => {
      // one unboxing pass (dim ops) instead of tables×planes×dim boxed
      // Seq reads in the plane loops — measured 2.5× on this stage
      val a = toPrimitive(v)
      Array.tabulate(tables) { l =>
        var bucket = 0L
        var p = 0
        while (p < planesPerTable) {
          val plane = planes(l * planesPerTable + p)
          var d = 0.0; var i = 0
          val n = math.min(plane.length, a.length)
          while (i < n) { d += plane(i) * a(i); i += 1 }
          if (d >= 0) bucket |= 1L << p
          p += 1
        }
        bucket | (l.toLong << 48) // table id (high bits) disambiguates bucket space
      }
    })
  }

  /** Copy a (possibly boxed) Seq into a primitive array in one pass. */
  private def toPrimitive(v: Seq[Double]): Array[Double] = {
    val arr = new Array[Double](v.length)
    var i = 0; val it = v.iterator
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    arr
  }

  /** Vectors L2-normalized ONCE per row (norms are not recomputed per
    * pair), so pair similarity is a single codegen [[graft.functions
    * .DotProduct]] — the hot-path shape that survives a 100× scale-up.
    *
    * The normalized table is persisted per (session, dir) and shared by
    * all four similarity queries: each of them references it 2–4 times
    * (candidate generation + both verify sides), and without the persist
    * every reference re-scans parquet and re-normalizes. At production
    * scale this materialize-normalized-once step is a written table the
    * whole pipeline reads; persist() is its single-process analogue. */
  private val normCache =
    new java.util.concurrent.ConcurrentHashMap[(org.apache.spark.sql.SparkSession, String),
      org.apache.spark.sql.DataFrame]()
  graft.wheel.SessionSweeper.addSweep(() =>
    normCache.keySet.removeIf(k => k._1.sparkContext.isStopped))
  private def embeddings(s: org.apache.spark.sql.SparkSession, dir: String) = {
    graft.functions.DotProduct.register(s)
    // drop entries pinned to stopped sessions (same sweep discipline as
    // WheelCatalog), and ALSO when any tracked session stops (the
    // SessionSweeper hook above) — a session-scoped persist of a static
    // table needs no data-change fingerprint; re-running in a fresh
    // session rebuilds
    normCache.keySet.removeIf(k => k._1.sparkContext.isStopped)
    graft.wheel.SessionSweeper.track(s)
    normCache.computeIfAbsent((s, dir), _ =>
      // fanOut BEFORE normalize: the single-row-group embeddings file
      // plans as 1–2 splits, which would pin every downstream dot
      // product to 2 cores (Q.fanOut doc) — and persist() freezes the
      // starved layout for all five similarity queries
      fanOut(t(s, dir, "embeddings"))
        .select(col("vec_id"), asDouble(col("embedding")).as("raw"))
        .withColumn("nrm", sqrt(call_function("graft_dot", col("raw"), col("raw"))))
        .withColumn("v", when(col("nrm") === 0.0, col("raw"))
          .otherwise(transform(col("raw"), _ / col("nrm"))))
        .select(col("vec_id"), col("v"))
        .persist())
  }

  /** Cosine of two pre-normalized vectors = codegen dot product. */
  private def sim(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    call_function("graft_dot", a, b)

  val queries: Map[String, Fn] = Map(
    // Brute-force cosine top-k: broadcast the bounded query set, stream
    // all candidates, window-rank per query.
    // (Round 18 note: a TopKPairs-aggregation form — the q_ann_lsh
    // shape — was tried and REVERTED: Spark's own WindowGroupLimit
    // already bounds this exchange to k rows per query per partition
    // MAP-SIDE (Sort → WindowGroupLimit → Exchange in the before plan),
    // so the swap has no asymptotic advantage, and the Aggregator-UDAF's
    // per-row buffer encoding measured SLOWER at sf0.1: exec
    // 0.88 → 1.02 s in the same bench window. The window form is the
    // codegen path; keep it.)
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

    // Embedding-cosine near-duplicate pairs (a < b upper triangle):
    // LSH bucketing (hash-shuffle on bucket key, bounded-memory collect)
    // with EXACT cosine verification INSIDE each bucket — only
    // above-threshold pairs are ever emitted, so the post-bucket shuffle
    // carries true near-dups (tiny) instead of O(bucket²) candidate id
    // pairs that round 2 exploded, distinct-ed and joined back (~2M rows
    // at sf0.1 = 1000 candidates/vector — the dominant cost). Precision
    // 1 by construction, recall set by the LSH params (≈1 for true
    // near-dups; measured on the fixture in SimilaritySpec against
    // plain-Scala brute force). Oversized buckets are dropped by the
    // BoundedCollectVec overflow marker without ever materializing — and
    // no cross join anywhere (asserted in PlanAuditSpec).
    "q_embed_neardup" -> ((s, dir) => {
      val all = embeddings(s, dir)
      val n = math.max(1L, all.count())
      val planesPerTable = math.max(DupPlanesPerTable,
        math.ceil(math.log(n.toDouble / DupTargetBucket) / math.log(2)).toInt)
      val buckets = bucketsUdfFor(DupTables, planesPerTable)
      val inBucketPairs = inBucketPairsUdf(NearDupThreshold)
      all.select(col("vec_id"), col("v"), explode(buckets(col("v"))).as("bucket"))
        .groupBy(col("bucket"))
        .agg(boundedVecs(col("vec_id"), col("v")).as("items"))
        .select(explode(inBucketPairs(col("items"))).as("p"))
        // the same pair surfaces from every table whose bucket holds it,
        // with a bit-identical dot (fixed summation order) — max = dedupe
        .groupBy(col("p._1").as("vec_a"), col("p._2").as("vec_b"))
        .agg(round(max(col("p._3")), 4).as("sim"))
        .orderBy(col("vec_a"), col("vec_b"))
    }),

    // SemDeDup (semantic dedup over embedding clusters, after
    // Abbas et al. 2023): k-means cells bound the comparison scope —
    // within each cell, greedy keep-lowest-id dedup at cosine > τ; the
    // survivors are the semantically-diverse corpus. Differs from
    // q_embed_neardup in both bucketing (learned cells vs sign-LSH;
    // a vector has exactly ONE cell, so total pair work is
    // Σ|cell|²/2, not ×L tables) and output (surviving corpus rows,
    // not pairs). No oracle: survivors depend on our trainer; spec
    // checks c=1 ≡ exact greedy dedup and planted-duplicate removal.
    "q_semdedup" -> ((s, dir) => semDedup(s, dir, None, NearDupThreshold)),

    // Multi-table sign-LSH ANN: every vector gets L bucket keys (one per
    // table); candidates = equi-join on bucket key instead of a cross
    // join; then ONE TopKPairs aggregation replaces the round-2
    // dropDuplicates + window-rank pair of shuffles — the bounded heap
    // dedupes across tables (identical score per duplicate) and keeps
    // the k best, shipping k rows per query per partition. Recall vs
    // q_sim_topk is checked in ScalaTest.
    "q_ann_lsh" -> ((s, dir) => {
      val bucketsUdf = bucketsUdfFor(LshTables, LshPlanesPerTable)
      val all = embeddings(s, dir)
        .select(col("vec_id"), col("v"), explode(bucketsUdf(col("v"))).as("bucket"))
      val q = broadcast(all.filter(col("vec_id") < NumQueries)
        .select(col("vec_id").as("query_id"), col("v").as("qv"), col("bucket")))
      all.join(q, "bucket")
        .filter(col("vec_id") =!= col("query_id"))
        .withColumn("sim", sim(col("qv"), col("v")))
        .groupBy(col("query_id"))
        .agg(topKPairs(col("vec_id"), col("sim")).as("tops"))
        .select(col("query_id"), posexplode(col("tops")))
        .select(col("query_id"), col("col._1").as("neighbor_id"),
          round(col("col._2"), 4).as("sim"), (col("pos") + 1).cast("long").as("rk"))
        .orderBy(col("query_id"), col("rk"))
    }),

    // IVF ANN (learned coarse quantizer; see ivfQuery below).
    "q_ann_ivf" -> ((s, dir) => ivfQuery(s, dir)),

    // k-NN GRAPH (round 5): every vector's top-k neighbors — the
    // SemDeDup / semantic-clustering primitive, where the "query set"
    // is the whole corpus (vs q_ann_lsh's bounded 50). A naive self
    // equi-join on bucket is O(bucket²) ROWS through the shuffle; here
    // candidates never leave their bucket: the per-bucket UDF emits
    // each member's top-k within the bucket (work O(m²) dots with
    // m ≤ MaxBucket enforced by BoundedCollectVec's overflow marker,
    // output m×k rows), then ONE TopKPairs aggregation per source
    // merges across the L tables (duplicate candidates carry
    // bit-identical scores, so the bounded heap dedupes them). Two
    // bounded shuffles, no O(n²) anywhere. Recall is the LSH recall —
    // planted near-duplicates are found with probability ≈ 1
    // (SimilaritySpec).
    "q_knn_graph" -> ((s, dir) => {
      val bucketsUdf = bucketsUdfFor(LshTables, LshPlanesPerTable)
      val inBucketTopK = udf((items: Seq[org.apache.spark.sql.Row]) => {
        val m = items.length
        if (m < 2 || m > MaxBucket) Seq.empty[(Long, Long, Double)]
        else {
          val ids = new Array[Long](m)
          val vecs = new Array[Array[Double]](m)
          var i = 0
          while (i < m) {
            val r = items(i)
            ids(i) = r.getLong(0); vecs(i) = r.getSeq[Double](1).toArray
            i += 1
          }
          val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
          // bounded k-insertion (score desc, id asc — TopKPairs' order):
          // O(m·k) per member with primitive arrays, vs sorting m-1
          // boxed tuples per member (O(m log m) + allocation) — this is
          // the hottest loop of the query at full buckets
          val bestId = new Array[Long](TopK)
          val bestSim = new Array[Double](TopK)
          i = 0
          while (i < m) {
            var filled = 0
            var j = 0
            while (j < m) {
              if (j != i) {
                val a = vecs(i); val b = vecs(j)
                var d = 0.0; var k = 0
                while (k < a.length && k < b.length) { d += a(k) * b(k); k += 1 }
                val id = ids(j)
                // find insertion point among the current best
                var pos = filled
                while (pos > 0 && (bestSim(pos - 1) < d ||
                    (bestSim(pos - 1) == d && bestId(pos - 1) > id))) pos -= 1
                if (pos < TopK) {
                  val last = math.min(filled, TopK - 1)
                  var s = last
                  while (s > pos) {
                    bestSim(s) = bestSim(s - 1); bestId(s) = bestId(s - 1)
                    s -= 1
                  }
                  bestSim(pos) = d; bestId(pos) = id
                  if (filled < TopK) filled += 1
                }
              }
              j += 1
            }
            var r = 0
            while (r < filled) {
              out += ((ids(i), bestId(r), bestSim(r))); r += 1
            }
            i += 1
          }
          out.toSeq
        }
      })
      embeddings(s, dir)
        .select(col("vec_id"), col("v"), explode(bucketsUdf(col("v"))).as("bucket"))
        .groupBy(col("bucket"))
        .agg(boundedVecs(col("vec_id"), col("v")).as("items"))
        .select(explode(inBucketTopK(col("items"))).as("p"))
        .groupBy(col("p._1").as("vec_id"))
        .agg(topKPairs(col("p._2"), col("p._3")).as("tops"))
        .select(col("vec_id"), posexplode(col("tops")))
        .select(col("vec_id"), col("col._1").as("neighbor_id"),
          round(col("col._2"), 4).as("sim"), (col("pos") + 1).cast("long").as("rk"))
        .orderBy(col("vec_id"), col("rk"))
    }))

  // IVF: learned coarse quantizer (vs LSH's random hyperplanes) — the
  // other standard ANN scale path the builder prompt names. Cells ≈ √n
  // keeps cell size ≈ √n; probing the nprobe nearest cells per query
  // bounds candidates to nprobe·√n — sub-linear per query, and on
  // clustered real-world embeddings the learned cells beat random
  // planes at equal candidate budget.
  private val IvfSampleCap = 4096
  private val IvfIters = 10
  private val IvfNProbe = 4

  /** Driver-side spherical k-means on a bounded sample — deterministic
    * (seeded init, fixed iteration count, stable argmax ties) so the
    * quantizer is reproducible across runs and executors. */
  private def trainCentroids(sample: Array[Array[Double]], c: Int): Array[Array[Double]] = {
    val dim = sample.head.length
    val rnd = new scala.util.Random(11)
    var centroids = Array.tabulate(c)(i =>
      sample(rnd.nextInt(sample.length)).clone())
    (1 to IvfIters).foreach { _ =>
      val sums = Array.fill(c)(new Array[Double](dim))
      val counts = new Array[Int](c)
      sample.foreach { v =>
        val cell = nearestCell(centroids, v)
        counts(cell) += 1
        var i = 0
        while (i < dim) { sums(cell)(i) += v(i); i += 1 }
      }
      centroids = Array.tabulate(c) { j =>
        if (counts(j) == 0) centroids(j)
        else graft.functions.VectorFunctions.normalizeLocal(sums(j))
      }
    }
    centroids
  }

  /** Argmax dot (cosine on normalized input), first-wins on ties.
    * Primitive-array input: the cells×dim inner loop runs per corpus
    * row, so boxed Seq reads here dominate the assignment stage. */
  private def nearestCell(centroids: Array[Array[Double]], v: Array[Double]): Int = {
    var best = 0; var bestDot = Double.NegativeInfinity
    var j = 0
    while (j < centroids.length) {
      var d = 0.0; var i = 0
      val cj = centroids(j)
      val n = math.min(cj.length, v.length)
      while (i < n) { d += cj(i) * v(i); i += 1 }
      if (d > bestDot) { bestDot = d; best = j }
      j += 1
    }
    best
  }

  private def topCells(centroids: Array[Array[Double]], v: Array[Double], k: Int): Array[Int] = {
    val scored = Array.tabulate(centroids.length) { j =>
      var d = 0.0; var i = 0
      val cj = centroids(j)
      val n = math.min(cj.length, v.length)
      while (i < n) { d += cj(i) * v(i); i += 1 }
      (j, d)
    }
    scored.sortBy { case (j, d) => (-d, j) }.take(k).map(_._1)
  }

  /** IVF ANN as a query: train on a bounded sample, assign corpus cells,
    * probe nprobe cells per (broadcast) query, exact-score candidates.
    * Registered alongside q_ann_lsh; recall checked in SimilaritySpec.
    * (At production scale the trainer would draw a uniform reservoir
    * sample and size cells from the true corpus count; the id-prefix
    * sample here is exact on the fixtures, which fit under the cap.) */
  private val ivfQuery: Fn = (s, dir) => {
    val all = embeddings(s, dir)
    val sample = all.filter(col("vec_id") < IvfSampleCap)
      .collect().map(_.getSeq[Double](1).toArray)
    val n = math.max(1, sample.length)
    val c = math.max(4, math.ceil(math.sqrt(n.toDouble)).toInt)
    val centroids = trainCentroids(sample, c)
    val cellUdf = udf((v: Seq[Double]) => nearestCell(centroids, toPrimitive(v)))
    val probeUdf = udf((v: Seq[Double]) => topCells(centroids, toPrimitive(v), IvfNProbe))
    val corpus = all.withColumn("cell", cellUdf(col("v")))
    val q = broadcast(all.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        explode(probeUdf(col("v"))).as("cell")))
    corpus.join(q, "cell")
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("sim", sim(col("qv"), col("v")))
      .groupBy(col("query_id"))
      .agg(topKPairs(col("vec_id"), col("sim")).as("tops"))
      .select(col("query_id"), posexplode(col("tops")))
      .select(col("query_id"), col("col._1").as("neighbor_id"),
        round(col("col._2"), 4).as("sim"), (col("pos") + 1).cast("long").as("rk"))
      .orderBy(col("query_id"), col("rk"))
  }

  /** Greedy keep-lowest dedup walk over one cell: ids ascending, each
    * still-kept pivot absorbs (drops) its > τ neighbors. Returns the
    * DROPPED ids. ONE policy for every cell size (round 13, ADVICE r12):
    * the previous pair-based rule ("drop the higher id of every > τ
    * pair") over-dropped chains in small cells — a~b, b~c, a≁c dropped
    * c even though its only near-dup b was itself dropped — so dedup
    * semantics flipped with cell occupancy. */
  private[queries] def greedyDrops(ids: Array[Long],
      vecs: Array[Array[Double]], tau: Double): Seq[Long] = {
    val m = ids.length
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var k = 0
      while (k < a.length && k < b.length) { d += a(k) * b(k); k += 1 }
      d
    }
    val order = Array.range(0, m).sortBy(ids(_))
    val dropped = new Array[Boolean](m)
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    var oi = 0
    while (oi < m) {
      val p = order(oi)
      if (!dropped(p)) {
        var oj = oi + 1
        while (oj < m) {
          val q = order(oj)
          if (!dropped(q) && dot(vecs(p), vecs(q)) > tau) {
            dropped(q) = true
            out += ids(q)
          }
          oj += 1
        }
      }
      oi += 1
    }
    out.toSeq
  }

  /** Accumulator behind [[lastOversizedCells]] — rebound per semDedup
    * call, incremented executor-side as the plan runs. */
  @volatile private var oversizedAcc: Option[org.apache.spark.util.LongAccumulator] = None

  /** Cells that exceeded MaxBucket in the most recent EXECUTED semDedup
    * plan — their items arrive truncated (BoundedCollectVec), so dedup
    * is SKIPPED there (all rows kept) and the cell is counted here
    * instead of silently passing (round 13, ADVICE r12). Reads 0 before
    * the returned DataFrame has run an action; may over-count under
    * task retries (Spark accumulator semantics) — a flag, not an exact
    * total. */
  def lastOversizedCells: Long = oversizedAcc.map(_.value.longValue).getOrElse(0L)

  /** SemDeDup core (round 12): assign every vector its single nearest
    * k-means cell (trainer = the IVF path's driver-side k-means over a
    * capped sample), then run ONE in-cell greedy keep-lowest walk
    * ([[greedyDrops]]) regardless of cell size — ids ascending, each
    * kept pivot absorbs its > τ neighbors. One shuffle (groupBy cell) +
    * one AQE-planned anti-join; pair work is Σ|cell|²/2 bounded by
    * MaxBucket (oversized cells skip dedup and are flagged via
    * [[lastOversizedCells]]); dup-dense cells collapse to ~one pass per
    * cluster. `cellsOverride = Some(1)` collapses to the exact
    * single-scope greedy dedup the spec checks against. */
  private[queries] def semDedup(s: org.apache.spark.sql.SparkSession, dir: String,
      cellsOverride: Option[Int], tau: Double): org.apache.spark.sql.DataFrame = {
    val all = embeddings(s, dir)
    val sample = all.filter(col("vec_id") < IvfSampleCap)
      .collect().map(_.getSeq[Double](1).toArray)
    val n = math.max(1, sample.length)
    val c = cellsOverride.getOrElse(
      math.max(4, math.ceil(math.sqrt(n.toDouble)).toInt))
    val centroids = trainCentroids(sample, c)
    val cellUdf = udf((v: Seq[Double]) => nearestCell(centroids, toPrimitive(v)))
    val corpus = all.withColumn("cell", cellUdf(col("v")))
    val oversized = s.sparkContext.longAccumulator("semdedup_oversized_cells")
    oversizedAcc = Some(oversized)
    val dropsUdf = udf((items: Seq[org.apache.spark.sql.Row]) => {
      val m = items.length
      if (m < 2) Seq.empty[Long]
      else if (m > MaxBucket) { oversized.add(1L); Seq.empty[Long] }
      else {
        val ids = new Array[Long](m)
        val vecs = new Array[Array[Double]](m)
        var i = 0
        while (i < m) {
          val r = items(i)
          ids(i) = r.getLong(0); vecs(i) = r.getSeq[Double](1).toArray
          i += 1
        }
        greedyDrops(ids, vecs, tau)
      }
    })
    val drops = corpus.groupBy(col("cell"))
      .agg(boundedVecs(col("vec_id"), col("v")).as("items"))
      .select(explode(dropsUdf(col("items"))).as("vec_id"))
    // plain anti-join: the drop set scales with the corpus (dup-dense
    // data can drop most rows), so let AQE pick broadcast vs shuffle
    corpus.join(drops, Seq("vec_id"), "left_anti")
      .select(col("vec_id"), col("cell").cast("int").as("cell"))
      .orderBy(col("vec_id"))
  }

  /** No SQL oracles: float-order-sensitive ranking (SURVEY.md §2.6). */
  // q_sim_topk gained a DuckDB oracle in round 7 (previously declared
  // un-oracle-able on float-order grounds): the trick is mirroring the
  // EXACT double arithmetic, not just the math — cast the float32
  // embeddings to DOUBLE first, normalize-then-dot in the same
  // left-to-right summation order as the codegen DotProduct loop
  // (DuckDB's list_dot_product also folds sequentially), and rank by
  // the UNROUNDED sim with the same vec_id tie-break. Verified
  // bit-identical (hash match) at sf0.001/0.01/0.1. The ANN variants
  // (q_ann_lsh/q_ann_ivf/q_knn_graph/q_embed_neardup) stay no-oracle:
  // their outputs depend on our LSH/IVF parameters, which no DuckDB
  // query can reproduce — they are verified against this now-oracled
  // brute-force baseline in SimilaritySpec.
  val oracle: Map[String, String] = Map(
    "q_sim_topk" ->
      ("WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS raw " +
        "FROM embeddings), " +
        "n AS (SELECT vec_id, sqrt(list_dot_product(raw, raw)) AS nrm, raw FROM e), " +
        "v AS (SELECT vec_id, CASE WHEN nrm = 0 THEN raw " +
        "ELSE list_transform(raw, x -> x / nrm) END AS v FROM n), " +
        "p AS (SELECT q.vec_id AS query_id, a.vec_id AS neighbor_id, " +
        "list_dot_product(q.v, a.v) AS sim " +
        s"FROM (SELECT * FROM v WHERE vec_id < $NumQueries) q " +
        "JOIN v a ON a.vec_id <> q.vec_id), " +
        "r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id " +
        "ORDER BY sim DESC, neighbor_id) AS rk FROM p) " +
        "SELECT query_id, neighbor_id, ROUND(sim, 4) AS sim, CAST(rk AS BIGINT) AS rk " +
        s"FROM r WHERE rk <= $TopK ORDER BY query_id, rk"))
}
