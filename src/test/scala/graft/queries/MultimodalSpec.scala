package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.Sf0001

  test("decode stub pass: schema, totality, determinism, byte counts") {
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
    }
  }

  test("local stub decode is stable for same payload") {
    val p = "same bytes".getBytes("UTF-8")
    assert(Multimodal.fakeDecode(p) == Multimodal.fakeDecode(p.clone()))
  }
}
