package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** CI guard for the round-10 documentation defect: COVERAGE.md's
  * operator inventory silently stopped at q200 while the repo was at
  * q230. Every `SparkEntry.queries` key must appear in COVERAGE.md
  * (the generated index section keeps this true — rerun
  * `scripts/run.sh graft.Coverage .` after adding queries).
  */
class CoverageSpec extends AnyFunSuite {

  test("every SparkEntry query appears in COVERAGE.md") {
    val coverage = new String(
      Files.readAllBytes(Paths.get("COVERAGE.md")), StandardCharsets.UTF_8)
    val missing = SparkEntry.queries.keySet.filterNot(coverage.contains)
    assert(missing.isEmpty,
      s"COVERAGE.md is stale — missing ${missing.toSeq.sorted.mkString(", ")}; " +
        "regenerate with scripts/run.sh graft.Coverage .")
  }

  test("the generated index row count matches the query surface") {
    val coverage = new String(
      Files.readAllBytes(Paths.get("COVERAGE.md")), StandardCharsets.UTF_8)
    val gen = coverage.linesIterator.count(_.matches("""\| q\d+\w* \| .*"""))
    assert(gen >= SparkEntry.queries.size,
      s"generated index has $gen rows for ${SparkEntry.queries.size} queries")
  }
}
