package graft

import graft.byokg.CypherCoverage

/** Replays the reference-cypher dialect sweep: every retrieval-tier
  * query text the reference ships must land on its recorded outcome
  * (compiles+executes vs refuses), and the committed CYPHER_COVERAGE.md
  * must match the sweep's rendering — so a dialect regression (or an
  * uncommitted improvement) fails by name. */
class CypherCoverageSpec extends SparkSpec {

  private lazy val outcomes = CypherCoverage.sweep(spark)

  test("every reference cypher text lands on its recorded outcome") {
    val bad = outcomes.filter(o =>
      o.result.isRight != o.entry.expectCompiles)
    assert(bad.isEmpty, bad.map(o =>
      s"${o.entry.id}: expected " +
        (if (o.entry.expectCompiles) "compiles" else "refusal") +
        s", got ${o.result}").mkString("\n"))
  }

  test("every compiling entry returns rows on the fixture (the gate is " +
    "execute, not just parse)") {
    val empty = outcomes.collect {
      case o if o.result.contains(0L) => o.entry.id
    }
    assert(empty.isEmpty, s"zero-row entries: ${empty.mkString(", ")}")
  }

  test("every refusal message is targeted (non-empty, no stack traces)") {
    outcomes.collect { case o if o.result.isLeft =>
      val msg = o.result.swap.getOrElse("")
      assert(msg.nonEmpty && !msg.startsWith("EXECUTION ERROR"),
        s"${o.entry.id}: $msg")
    }
  }

  test("the committed CYPHER_COVERAGE.md matches the sweep") {
    val committed = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("CYPHER_COVERAGE.md")),
      java.nio.charset.StandardCharsets.UTF_8)
    val rendered = CypherCoverage.render(outcomes)
    assert(committed == rendered,
      "CYPHER_COVERAGE.md drifted from the sweep — regenerate with " +
        "`sbt \"runMain graft.tools.CypherCoverageGen\"`")
  }
}
