package graft.queries

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import Q._

/** Multimodal-column plumbing (builder prompt: "treat image/audio/video
  * as opaque binary columns with typed metadata").
  *
  * The container has no image/audio codecs, so the DECODE step is a
  * clearly-marked deterministic STUB ([[fakeDecode]]); everything
  * Spark-side — binary schema, batched partition processing, feature
  * schema, the metadata query — is real and tested. Swapping
  * [[fakeDecode]] for a real codec changes no plan shape.
  *
  * Scale posture: decode runs as `mapPartitions` with explicit batching
  * (the same batch shape a vectorized/Arrow UDF would use), so per-row
  * codec setup cost is amortized and memory is bounded by batch size,
  * not partition size. */
object Multimodal {

  /** Documents with an opaque binary payload column — the stand-in for
    * an image/audio blob (real pipelines read these from parquet BINARY
    * columns; here we derive one deterministically from text). */
  def withPayload(docs: DataFrame): DataFrame =
    docs.withColumn("payload", encode(col("text"), "UTF-8"))

  final case class MediaMeta(width: Int, height: Int, nFrames: Int)

  /** STUB decode: a real implementation would parse the container header
    * (e.g. PNG IHDR / WAV fmt chunk). This deterministic fake derives
    * "dimensions" from payload bytes so tests have stable expectations. */
  def fakeDecode(payload: Array[Byte]): MediaMeta = {
    val n = payload.length
    val h = if (n == 0) 0 else java.util.Arrays.hashCode(payload)
    MediaMeta(width = 64 + math.abs(h % 512), height = 64 + math.abs((h / 512) % 512),
      nFrames = 1 + n % 16)
  }

  /** Aspect-preserving resize plan to fit a max edge (the arithmetic a
    * real thumbnailer applies before the pixel pass): returns (w, h)
    * scaled so max(w, h) == maxEdge when larger, unchanged otherwise. */
  def resizePlan(width: Int, height: Int, maxEdge: Int = 224): (Int, Int) = {
    val m = math.max(width, height)
    if (m <= maxEdge || m == 0) (width, height)
    else (math.max(1, width * maxEdge / m), math.max(1, height * maxEdge / m))
  }

  private val featureSchema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false),
    StructField("resized_w", IntegerType, nullable = false),
    StructField("resized_h", IntegerType, nullable = false)))

  val DecodeBatchSize = 64

  /** Batched per-partition "decode" + resize plan: the Spark-side shape
    * of a real feature-extraction pass (schema, batching, partition
    * preservation). */
  def extractFeatures(withBin: DataFrame): DataFrame = {
    val spark = withBin.sparkSession
    val rows = withBin.select(col("doc_id").cast("long"), col("payload")).rdd
      .mapPartitions { it =>
        it.grouped(DecodeBatchSize).flatMap { batch =>
          batch.map { r =>
            val payload = r.getAs[Array[Byte]](1)
            val m = fakeDecode(payload)
            val (rw, rh) = resizePlan(m.width, m.height)
            Row(r.getLong(0), payload.length.toLong, m.width, m.height, m.nFrames, rw, rh)
          }
        }
      }
    spark.createDataFrame(rows, featureSchema)
  }

  val queries: Map[String, Fn] = Map(
    // Binary metadata over the payload column — pure built-ins, oracle-
    // checkable (byte length, fixed-size chunk count, modality tag).
    "q_multimodal_meta" -> ((s, dir) =>
      withPayload(t(s, dir, "documents")).select(
        col("doc_id"),
        octet_length(col("payload")).cast("long").as("n_bytes"),
        ((octet_length(col("payload")).cast("long") + 255L) / 256L).cast("long")
          .as("n_chunks"),
        when(octet_length(col("payload")) % 3 === 0, "image")
          .when(octet_length(col("payload")) % 3 === 1, "audio")
          .otherwise("video").as("modality"))
        .orderBy(col("doc_id"))),

    // The full stub-decode pass: binary → batched mapPartitions →
    // typed feature columns + aspect-preserving resize plan. No oracle
    // (the decode is ours); ScalaTest checks determinism and schema.
    "q_multimodal_decode" -> ((s, dir) =>
      extractFeatures(withPayload(t(s, dir, "documents")))
        .orderBy(col("doc_id"))),

    // Frame sampling (round 2): treat each document's content as a
    // sequence of 256-char chunks ("frames"); sample ≤4 at an even
    // stride and emit each frame's length + digest — the video
    // frame-sample plumbing shape (stride selection + per-frame
    // feature), as pure built-ins, fully oracle-checkable (the codec
    // stub isn't involved; char windows because DuckDB has no BLOB
    // slicing to oracle byte windows against).
    "q_multimodal_frames" -> ((s, dir) =>
      t(s, dir, "documents")
        .withColumn("n_chunks", ((length(col("text")).cast("long") + 255L) / 256L).cast("long"))
        .withColumn("stride", greatest(lit(1L), expr("n_chunks div 4")))
        .withColumn("frame_idx",
          explode(sequence(lit(0L), col("n_chunks") - 1L, col("stride"))))
        .withColumn("frame",
          expr("substring(text, CAST(frame_idx * 256 + 1 AS INT), 256)"))
        .select(col("doc_id"), col("frame_idx"),
          length(col("frame")).cast("long").as("frame_chars"),
          md5(encode(col("frame"), "UTF-8")).as("frame_md5"))
        .orderBy(col("doc_id"), col("frame_idx"))))

  val oracle: Map[String, String] = Map(
    "q_multimodal_meta" ->
      ("SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes, " +
        "CAST((octet_length(encode(text)) + 255) // 256 AS BIGINT) AS n_chunks, " +
        "CASE octet_length(encode(text)) % 3 WHEN 0 THEN 'image' " +
        "WHEN 1 THEN 'audio' ELSE 'video' END AS modality " +
        "FROM documents ORDER BY doc_id"),
    "q_multimodal_frames" ->
      ("WITH p AS (SELECT doc_id, text, " +
        "CAST((length(text) + 255) // 256 AS BIGINT) AS n_chunks FROM documents), " +
        "f AS (SELECT doc_id, text, " +
        "unnest(range(0, n_chunks, GREATEST(1, n_chunks // 4))) AS frame_idx FROM p) " +
        "SELECT doc_id, frame_idx, " +
        "CAST(length(substring(text, CAST(frame_idx * 256 + 1 AS INT), 256)) AS BIGINT) AS frame_chars, " +
        "md5(substring(text, CAST(frame_idx * 256 + 1 AS INT), 256)) AS frame_md5 " +
        "FROM f ORDER BY doc_id, frame_idx"))
}
