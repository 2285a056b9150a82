package graft

import graft.tools.PlanCensus

/** The timing-immune plan-regression gate: recomputes the per-query
  * {jobs, stages, tasks, shuffle-map stages} census at sf0.001 under the
  * suite session and fails on drift from the committed PLAN_CENSUS.json.
  * Slack covers the measured scheduler nondeterminism (ContextCleaner
  * races can skip one warm shuffle stage); any real plan regression —
  * a re-deriving broadcast subtree, a lost broadcast, an extra
  * exchange — is an order of magnitude outside it. Regenerate after
  * INTENTIONAL plan changes: sbt "runMain graft.tools.PlanCensus". */
class PlanCensusSpec extends SparkSpec {
  private val sfDir = "/root/testdata/sf0.001"
  private val snapshot = new java.io.File("PLAN_CENSUS.json")

  test("per-query scheduler census matches the committed PLAN_CENSUS.json " +
    "within the documented slack") {
    assume(snapshot.exists(), "no committed census — run " +
      "sbt \"runMain graft.tools.PlanCensus\"")
    assume(new java.io.File(s"$sfDir/documents.parquet").exists(),
      "sf0.001 fixtures unavailable")
    val committed = PlanCensus.parseJson(
      scala.io.Source.fromFile(snapshot, "UTF-8").mkString)
    val expected = SparkEntry.queries.keySet
    // coverage first: a query added without re-censusing fails by name
    val missing = (expected -- committed.keySet).toSeq.sorted
    val stale = (committed.keySet -- expected).toSeq.sorted
    assert(missing.isEmpty && stale.isEmpty,
      s"census out of sync with SparkEntry.queries — missing: " +
        s"${missing.mkString(", ")}; stale: ${stale.mkString(", ")}; " +
        "regenerate with sbt \"runMain graft.tools.PlanCensus\"")
    GraftExtensions.registerAll(spark)
    graft.queries.Warmup.warmAll(spark, sfDir)
    val warmed = spark.sparkContext.getPersistentRDDs.keySet.toSet
    val drifted = PlanCensus.censusAll(spark, sfDir, warmed).flatMap {
      case (name, now) =>
        val c = committed(name)
        // tasks get the widest slack: AQE partition coalescing reacts to
        // in-JVM memory state, so a fresh-JVM census vs the shared suite
        // JVM measured up to ~18% task drift on deep beam plans while
        // jobs/stages/shuffles stayed exact — those three carry the
        // regression signal
        val taskSlack = math.max(8L, (c.tasks * 0.3).toLong)
        // shuffle BYTES catch payload-width regressions task counts are
        // blind to (round-9: a hex-string key doubling an exchange).
        // Slack: totals are data-deterministic at fixed sf, but AQE
        // coalescing changes per-partition compression framing and a
        // ContextCleaner race can skip one warm stage's read — measured
        // cross-JVM drift stays inside max(64 KB, 20%); a payload-width
        // regression on a real exchange is 2x of MBs
        def bOk(now0: Long, c0: Long): Boolean =
          math.abs(now0 - c0) <= math.max(64L << 10, (c0 * 0.2).toLong)
        val ok = math.abs(now.jobs - c.jobs) <= 1 &&
          math.abs(now.stages - c.stages) <= 2 &&
          math.abs(now.shuffles - c.shuffles) <= 2 &&
          math.abs(now.tasks - c.tasks) <= taskSlack &&
          bOk(now.shuffleReadB, c.shuffleReadB) &&
          bOk(now.shuffleWriteB, c.shuffleWriteB)
        if (ok) None
        else Some(s"$name: committed ${c.render} vs now ${now.render}")
    }
    assert(drifted.isEmpty,
      s"${drifted.size} queries drifted from the committed plan census " +
        "(re-derivation / extra exchange / lost broadcast?) — if the " +
        "plan change is intentional, regenerate with " +
        "sbt \"runMain graft.tools.PlanCensus\":\n" +
        drifted.mkString("\n"))
  }
}
