package graft

import graft.ops.Redaction
import org.apache.spark.sql.functions._

/** PII scrubbing: known strings redact to placeholders, counts match,
  * clean text passes through untouched, and redaction is idempotent. */
class RedactionSpec extends SparkSpec {

  private def df = {
    import spark.implicits._
    Seq(
      (1L, "contact me at jane.doe+x@example.co.uk or on +1 (415) 555-0199"),
      (2L, "server 192.168.0.1 charged card 4111 1111 1111 1111 today"),
      (3L, "perfectly clean text with nothing sensitive"),
      (4L, "two mails: a@b.io c@d.org")).toDF("id", "text")
  }

  test("redact replaces every kind with its placeholder") {
    val out = df.select(col("id"), Redaction.redact(col("text")).as("r"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L).contains("<EMAIL>") && out(1L).contains("<PHONE>"))
    assert(!out(1L).contains("@") && !out(1L).contains("555"))
    assert(out(2L).contains("<IP>") && out(2L).contains("<CARD>"))
    assert(out(3L) == "perfectly clean text with nothing sensitive")
    assert(out(4L) == "two mails: <EMAIL> <EMAIL>")
  }

  test("piiCounts reports per-kind match counts") {
    val counts = Redaction.piiCounts(col("text"))
    val out = df.select(col("id") +: counts.map { case (n, c) => c.as(n) }: _*)
      .collect().map(r => r.getLong(0) ->
        Redaction.patterns.indices.map(i => r.getInt(i + 1))).toMap
    assert(out(1L)(0) == 1, "one email on row 1")
    assert(out(4L)(0) == 2, "two emails on row 4")
    assert(out(3L).sum == 0, "clean row counts nothing")
  }

  test("redaction is idempotent") {
    val once = df.select(col("id"), Redaction.redact(col("text")).as("r"))
    val twice = once.select(col("id"), Redaction.redact(col("r")).as("r"))
    assert(once.exceptAll(twice).isEmpty && twice.exceptAll(once).isEmpty)
  }
}
