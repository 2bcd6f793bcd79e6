package graft

/** One-query verify dump for fast local oracle iteration — dumps ONE
  * declared query's parquet plus an oracle_sql.json holding just that
  * query, so `scripts/check_oracle.py` checks it in seconds instead of
  * the full-inventory Verify run:
  *
  *   sbt "Test/runMain graft.ScratchOne q_foo /root/testdata/sf0.01 /tmp/verify_one"
  *   python3 scripts/check_oracle.py /root/testdata/sf0.01 /tmp/verify_one
  */
object ScratchOne {
  def main(args: Array[String]): Unit = {
    if (args.length != 3) {
      System.err.println("usage: ScratchOne <q_name> <sfDir> <outDir>")
      sys.exit(2)
    }
    val Array(name, sfDir, outDir) = args
    val fn = SparkEntry.queries.getOrElse(name,
      sys.error(s"unknown query '$name'; declared: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}"))
    val spark = TestSpark.spark
    fn(spark, sfDir)
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
    // Verify.q escapes control chars too — keep the one-query loop's JSON
    // byte-compatible with the full Verify dump (ADVICE r5).
    val oj = SparkEntry.oracleSql.get(name).map { sql =>
      "{" + Verify.q(name) + ": " + Verify.q(sql) + "}"
    }.getOrElse("{}")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$outDir/oracle_sql.json"), oj)
    spark.stop()
  }
}
