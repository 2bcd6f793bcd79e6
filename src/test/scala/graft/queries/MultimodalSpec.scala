package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.Sf0001

  test("GB1 codec: round-trip, bad magic rejected, truncation rejected") {
    val payload = "some media bytes".getBytes("UTF-8")
    val container = Multimodal.GB1.encode(payload)
    val d = Multimodal.GB1.decode(container)
    assert(d.payload.toSeq == payload.toSeq)
    val (w, h, f) = Multimodal.GB1.geometry(payload.length)
    assert((d.width, d.height, d.nFrames) == (w, h, f))
    // the decoder PARSES — flipping a header byte changes what it reads
    val tampered = container.clone()
    tampered(7) = (tampered(7) + 1).toByte // low byte of big-endian width
    assert(Multimodal.GB1.decode(tampered).width == d.width + 1)
    val badMagic = container.clone()
    badMagic(0) = 'X'.toByte
    intercept[IllegalArgumentException](Multimodal.GB1.decode(badMagic))
    intercept[IllegalArgumentException](
      Multimodal.GB1.decode(container.take(Multimodal.GB1.HeaderLen - 1)))
  }

  test("decode pass: schema, totality, determinism, byte counts") {
    val out1 = Multimodal.queries("q_multimodal_decode")(spark, dir).collect()
    val out2 = Multimodal.queries("q_multimodal_decode")(spark, dir).collect()
    assert(out1.length == 500)
    assert(out1.map(_.toString).toSeq == out2.map(_.toString).toSeq)
    val docs = Q.t(spark, dir, "documents")
      .select(col("doc_id"), octet_length(encode(col("text"), "UTF-8")).cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    out1.foreach { r =>
      assert(r.getLong(1) == docs(r.getLong(0)), s"doc ${r.getLong(0)} byte count")
      assert(r.getInt(2) >= 64 && r.getInt(3) >= 64 && r.getInt(4) >= 1)
      // resize plan: fits the 224 max edge, preserves aspect within
      // integer truncation
      val (w, h, rw, rh) = (r.getInt(2), r.getInt(3), r.getInt(5), r.getInt(6))
      assert(math.max(rw, rh) <= 224)
      if (math.max(w, h) <= 224) assert((rw, rh) == (w, h))
      else {
        // integer truncation skews the ratio by at most ~1/min(rw, rh)
        val rel = math.abs(rw.toDouble / rh - w.toDouble / h) / (w.toDouble / h)
        assert(rel <= 1.0 / math.min(rw, rh) + 0.01, s"($w,$h)->($rw,$rh) rel=$rel")
      }
    }
  }

  test("decoded digest matches the payload bytes (not recomputed from text)") {
    import spark.implicits._
    val rows = Multimodal.queries("q_multimodal_decode")(spark, dir)
      .select("doc_id", "payload_md5").as[(Long, String)].collect().toMap
    val expected = Q.t(spark, dir, "documents")
      .select(col("doc_id"), md5(encode(col("text"), "UTF-8")).as("m"))
      .as[(Long, String)].collect().toMap
    assert(rows == expected)
  }

  test("resizePlan clamps the max edge and keeps small media unchanged") {
    assert(Multimodal.resizePlan(100, 50) == (100, 50))
    assert(Multimodal.resizePlan(448, 224) == (224, 112))
    assert(Multimodal.resizePlan(224, 448) == (112, 224))
    assert(Multimodal.resizePlan(1000, 10)._1 == 224)
  }

  test("q_multimodal_frames samples an even stride of chunk digests") {
    val rows = Multimodal.queries("q_multimodal_frames")(spark, dir).collect()
    assert(rows.nonEmpty)
    val byDoc = rows.groupBy(_.getLong(0))
    assert(byDoc.keySet.size == 500) // every doc contributes ≥1 frame
    byDoc.values.foreach { fs =>
      assert(fs.length <= 5)
      assert(fs.forall(r => r.getLong(2) >= 1 && r.getLong(2) <= 256))
      assert(fs.map(_.getLong(1)).distinct.length == fs.length)
    }
  }
}
