package graft
object ScratchOne {
  def main(args: Array[String]): Unit = {
    val Array(name, sfDir, outDir) = args
    val spark = TestSpark.spark
    SparkEntry.queries(name)(spark, sfDir)
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
    val oj = SparkEntry.oracleSql.get(name).map { sql =>
      "{\"" + name + "\": \"" + sql.replace("\\", "\\\\").replace("\"", "\\\"") + "\"}"
    }.getOrElse("{}")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$outDir/oracle_sql.json"), oj)
    spark.stop()
  }
}
