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

  private val featureSchema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false)))

  val DecodeBatchSize = 64

  /** Batched per-partition "decode": the Spark-side shape of a real
    * feature-extraction pass (schema, batching, partition preservation). */
  def extractFeatures(withBin: DataFrame): DataFrame = {
    val spark = withBin.sparkSession
    val rows = withBin.select(col("doc_id").cast("long"), col("payload")).rdd
      .mapPartitions { it =>
        it.grouped(DecodeBatchSize).flatMap { batch =>
          batch.map { r =>
            val payload = r.getAs[Array[Byte]](1)
            val m = fakeDecode(payload)
            Row(r.getLong(0), payload.length.toLong, m.width, m.height, m.nFrames)
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
    // typed feature columns. No oracle (the decode is ours); ScalaTest
    // checks determinism and schema.
    "q_multimodal_decode" -> ((s, dir) =>
      extractFeatures(withPayload(t(s, dir, "documents")))
        .orderBy(col("doc_id"))))

  val oracle: Map[String, String] = Map(
    "q_multimodal_meta" ->
      ("SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes, " +
        "CAST((octet_length(encode(text)) + 255) // 256 AS BIGINT) AS n_chunks, " +
        "CASE octet_length(encode(text)) % 3 WHEN 0 THEN 'image' " +
        "WHEN 1 THEN 'audio' ELSE 'video' END AS modality " +
        "FROM documents ORDER BY doc_id"))
}
