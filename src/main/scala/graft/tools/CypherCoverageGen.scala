package graft.tools

import org.apache.spark.sql.SparkSession

/** Regenerates CYPHER_COVERAGE.md from the [[graft.byokg.CypherCoverage]]
  * sweep (run after any dialect change; CypherCoverageSpec fails if the
  * committed file drifts from the sweep's output). */
object CypherCoverageGen {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("CYPHER_COVERAGE.md")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val md = graft.byokg.CypherCoverage.render(
      graft.byokg.CypherCoverage.sweep(spark))
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      md.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(s"[cypher-coverage] wrote $out")
    spark.stop()
  }
}
