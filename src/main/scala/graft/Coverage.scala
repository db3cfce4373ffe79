package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

/** COVERAGE.md index generator (the Plans.scala pattern): derives the
  * query → implementation `file:line` map from `SparkEntry.queries`
  * itself, so the advertised SURVEY→implementation index can no longer
  * drift from the code (the round-10 defect: COVERAGE.md's tables
  * stopped at q200 while the repo was at q230). Regenerate after adding
  * queries: `scripts/run.sh graft.Coverage`. CoverageSpec asserts every
  * `SparkEntry.queries` key appears in COVERAGE.md, failing the suite
  * if a round forgets to rerun this.
  */
object Coverage {
  private val Begin = "<!-- BEGIN GENERATED QUERY INDEX (graft.Coverage) -->"
  private val End = "<!-- END GENERATED QUERY INDEX -->"

  def main(args: Array[String]): Unit = {
    val repo = Paths.get(args.headOption.getOrElse("."))
    val entrySrc = repo.resolve("src/main/scala/graft/SparkEntry.scala")
    val coverage = repo.resolve("COVERAGE.md")

    // "qN_name" -> Object.method _  (the uniform queries-map syntax)
    val entryRe = """"(q[^"]+)"\s*->\s*(\w+)\.(\w+) _""".r
    val text = new String(Files.readAllBytes(entrySrc), StandardCharsets.UTF_8)
    val impls = entryRe.findAllMatchIn(text)
      .map(m => m.group(1) -> (m.group(2), m.group(3))).toMap

    // locate each `def <method>` across the main source tree
    val srcRoot = repo.resolve("src/main/scala/graft")
    val walk = Files.walk(srcRoot)
    val files =
      try walk.iterator().asScala.filter(_.toString.endsWith(".scala")).toList
      finally walk.close()
    val defSites: Seq[(String, String)] = files.flatMap { p =>
      val lines = Files.readAllLines(p, StandardCharsets.UTF_8).asScala
      val rel = srcRoot.relativize(p).toString
      lines.zipWithIndex.collect {
        case (l, i) if l.matches(""".*\bdef (q\d+\w*)[(\[ :].*""") =>
          val name = """\bdef (q\d+\w*)""".r.findFirstMatchIn(l).get.group(1)
          name -> s"$rel:${i + 1}"
      }
    }
    // a duplicate qNNN def in two files would silently mis-attribute the
    // index (last-wins Map) — fail instead
    val dups = defSites.groupBy(_._1).filter(_._2.size > 1)
    require(dups.isEmpty,
      s"duplicate query def names: ${dups.map { case (n, s) => s"$n at ${s.map(_._2).mkString(", ")}" }.mkString("; ")}")
    val defIndex: Map[String, String] = defSites.toMap

    val names = SparkEntry.queries.keySet.toSeq
      .sortBy(n => (n.drop(1).takeWhile(_.isDigit).toInt, n))
    val oracle = SparkEntry.oracleSql.keySet

    val missing = names.filterNot(impls.contains)
    require(missing.isEmpty, s"unparsed SparkEntry entries: $missing")

    val rows = names.map { n =>
      val (obj, method) = impls(n)
      val loc = defIndex.getOrElse(method, s"$obj (def not found)")
      val gate = if (oracle.contains(n)) "oracle" else "rows-only"
      s"| $n | `$loc` (`$obj.$method`) | $gate |"
    }
    // plain concatenation: stripMargin would eat the table rows' pipes
    val section = Seq(
      Begin,
      "## Query → implementation index (generated)",
      "",
      "Derived from `SparkEntry.queries` by `graft.Coverage` — do not",
      "edit by hand; regenerate with `scripts/run.sh graft.Coverage .`.",
      s"**${names.length} queries** (${names.count(oracle.contains)} " +
        s"oracle-gated, ${names.count(n => !oracle.contains(n))} rows-only).",
      "",
      "| query | implementation | gate |",
      "| --- | --- | --- |",
      rows.mkString("\n"),
      End).mkString("\n")

    val cur = new String(Files.readAllBytes(coverage), StandardCharsets.UTF_8)
    val next =
      if (cur.contains(Begin))
        cur.substring(0, cur.indexOf(Begin)) + section +
          cur.substring(cur.indexOf(End) + End.length)
      else cur.stripTrailing() + "\n\n" + section + "\n"
    Files.write(coverage, next.getBytes(StandardCharsets.UTF_8))
    println(s"[coverage] wrote ${names.length} rows to $coverage")
  }
}
