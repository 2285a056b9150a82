package graft

/** Executes EVERY SparkEntry query end-to-end at sf0.001 and asserts none
  * throws. OracleTypeParitySpec only *constructs* the oracle-gated plans; a
  * runtime failure (or a query with no oracle) slips past it — which is how
  * the round-4 testdata change (events.ts TIMESTAMP(NANOS) → timestamp[us])
  * broke q_events_window/q_sessionize while `sbt test` stayed green. This
  * spec is the catch-all: any query that cannot run against the CURRENT
  * fixtures fails the build by name.
  */
class AllQueriesSmokeSpec extends SparkSpec {
  private val sfDir = "/root/testdata/sf0.001"

  test("every SparkEntry query runs without throwing at sf0.001") {
    assume(new java.io.File(s"$sfDir/documents.parquet").exists(),
      "sf0.001 fixtures unavailable")
    GraftExtensions.registerAll(spark)
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try { fn(spark, sfDir).count(); None }
        catch { case e: Throwable =>
          Some(s"$name: ${e.getClass.getSimpleName}: " +
            String.valueOf(e.getMessage).linesIterator.take(3).mkString(" | "))
        }
    }
    assert(failures.isEmpty, s"${failures.size} queries threw:\n" +
      failures.mkString("\n"))
  }

  test("flagship entry returns rows") {
    assume(new java.io.File(s"$sfDir/documents.parquet").exists(),
      "sf0.001 fixtures unavailable")
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
