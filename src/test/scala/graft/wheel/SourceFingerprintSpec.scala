package graft.wheel

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The shared staleness-fingerprint dialect: relative-path tokens (a
  * partitioned layout's equal-basename files stay distinct), marker
  * exclusion, fail-closed absence. */
class SourceFingerprintSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def conf = spark.sessionState.newHadoopConf()

  private def fixture(name: String): java.io.File = {
    val f = new java.io.File(s"target/test-fixtures/fingerprint/$name")
    org.apache.commons.io.FileUtils.deleteQuietly(f)
    f.mkdirs()
    f
  }

  test("equal-basename files in different subdirectories get DISTINCT tokens (ADVICE r9)") {
    val root = fixture("partitioned")
    // a partitioned layout: k=1/part-0.parquet and k=2/part-0.parquet
    // with identical name, length and mtime — basename-only tokens
    // would collapse them to one
    val bytes = "same-content".getBytes
    for (part <- Seq("k=1", "k=2")) {
      val d = new java.io.File(root, part); d.mkdirs()
      val f = new java.io.File(d, "part-0.parquet")
      java.nio.file.Files.write(f.toPath, bytes)
      f.setLastModified(1700000000000L)
    }
    val fp = SourceFingerprint.of(root.getAbsolutePath, conf)
    val tokens = fp.split('|').toSeq
    assert(tokens.size == 2, fp)
    assert(tokens.exists(_.startsWith("k=1/part-0.parquet:")), fp)
    assert(tokens.exists(_.startsWith("k=2/part-0.parquet:")), fp)
  }

  test("commit markers are excluded; data changes always change the fingerprint") {
    val root = fixture("markers")
    java.nio.file.Files.write(
      new java.io.File(root, "part-0.parquet").toPath, "d".getBytes)
    java.nio.file.Files.write(
      new java.io.File(root, "_SUCCESS").toPath, Array.empty[Byte])
    val tmp = new java.io.File(root, "_temporary/0"); tmp.mkdirs()
    java.nio.file.Files.write(
      new java.io.File(tmp, "task-file").toPath, "t".getBytes)
    val fp = SourceFingerprint.of(root.getAbsolutePath, conf)
    assert(fp.split('|').length == 1 && fp.startsWith("part-0.parquet:"), fp)

    // marker churn (the committer rewriting _SUCCESS) leaves it stable
    java.nio.file.Files.write(
      new java.io.File(root, "_SUCCESS").toPath, "x".getBytes)
    assert(SourceFingerprint.of(root.getAbsolutePath, conf) == fp)

    // a data append changes it
    java.nio.file.Files.write(
      new java.io.File(root, "part-1.parquet").toPath, "d2".getBytes)
    assert(SourceFingerprint.of(root.getAbsolutePath, conf) != fp)
  }

  test("an absent path fingerprints as 'absent' (fail closed)") {
    assert(SourceFingerprint.of(
      "target/test-fixtures/fingerprint/nope", conf) == "absent")
  }
}
