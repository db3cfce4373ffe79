package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII detection / redaction — the privacy-scrubbing station of a
  * training-data pipeline. Patterns are conservative, well-known
  * regexes (public knowledge); each kind redacts to a stable
  * placeholder so downstream dedup/fingerprints stay deterministic.
  *
  * Everything is chained `regexp_replace` / `regexp_count` — codegen'd
  * builtins, per-row, no shuffle, no UDF; at 100 TB this pipelines
  * inside the scan stage like every other cleaning op.
  */
object Redaction {

  /** (kind, pattern, placeholder) — order matters: longer/more specific
    * patterns first so e.g. an email is not half-eaten by another rule. */
  val patterns: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b", "<IP>"),
    ("card", "\\b(?:\\d[ -]?){13,16}\\b", "<CARD>"),
    ("phone", "\\+?\\d{1,3}[ .-]?\\(?\\d{2,4}\\)?[ .-]?\\d{3,4}[ .-]?\\d{3,4}", "<PHONE>"))

  /** Text with every PII kind replaced by its placeholder. */
  def redact(text: Column): Column =
    patterns.foldLeft(text) { case (c, (_, re, ph)) =>
      regexp_replace(c, re, ph)
    }

  /** One count column per kind, e.g. `pii_email`, for audit metrics.
    * Counts are taken kind-by-kind on the PROGRESSIVELY redacted text
    * (same order as [[redact]]) so overlapping patterns never double
    * count the same span. */
  def piiCounts(text: Column): Seq[(String, Column)] = {
    var cur = text
    patterns.map { case (kind, re, ph) =>
      val n = regexp_count(cur, lit(re))
      cur = regexp_replace(cur, re, ph)
      s"pii_$kind" -> n
    }
  }
}
