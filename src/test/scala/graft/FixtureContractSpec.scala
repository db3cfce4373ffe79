package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Contract tests between the driver-generated fixtures and Tables'
  * declared schemas — the spec round 8 was missing: the driver
  * regenerated `events.ts` as timestamp[us] (it had been timestamp[ns]
  * since round 5), every one of the 267 unit tests stayed green, and 25
  * oracle rows went red because `Tables` kept dividing by 1000. These
  * tests read the actual parquet footers, so they go red the moment the
  * fixture layout changes again.
  */
class FixtureContractSpec extends SparkSpec {

  test("every table's footer schema matches the declared schema") {
    for ((name, declared) <- Tables.schemas) {
      // Footer-inferred schema, no imposed schema: what the files really
      // contain. For events this also proves the current fixture's ts
      // maps natively to TimestampType (µs/ms); a ns fixture would
      // infer LongType (under nanosAsLong) and is exercised separately.
      val inferred = spark.read.parquet(s"$sf0001/$name.parquet").schema
      assert(inferred.fieldNames.toSeq == declared.fieldNames.toSeq,
        s"$name: footer fields ${inferred.fieldNames.mkString(",")} != " +
          s"declared ${declared.fieldNames.mkString(",")}")
      for ((inf, dec) <- inferred.fields.zip(declared.fields)) {
        // The fixtures store naive (isAdjustedToUTC=false) timestamps,
        // which infer as NTZ; the declared LTZ read carries the same µs
        // payload under the UTC session zone — the two are equivalent
        // here, exactly as DuckDB's naive read is.
        val norm = (t: DataType) =>
          if (t == TimestampNTZType) TimestampType else t
        assert(norm(inf.dataType) == dec.dataType,
          s"$name.${dec.name}: footer type ${inf.dataType} != declared ${dec.dataType}")
      }
    }
  }

  test("loaded schemas equal the declared schemas for every table") {
    for ((name, declared) <- Tables.schemas) {
      val loaded = Tables.load(spark, sf0001, name).schema
      assert(loaded.fieldNames.toSeq == declared.fieldNames.toSeq, s"$name fields")
      for ((l, d) <- loaded.fields.zip(declared.fields))
        assert(l.dataType == d.dataType, s"$name.${d.name} type")
    }
  }

  test("events timestamps land in the documented 2024 range, not 1970") {
    // A unit mis-read shrinks or inflates every instant 1000×: ns read
    // as µs lands in 1970; µs read as ns lands past 2100. Either trap
    // fires loudly here. The fixture documents 2024-01-01..2024-01-30.
    val row = Tables.events(spark, sf0001)
      .agg(min(col("ts")).as("lo"), max(col("ts")).as("hi")).head()
    val lo = row.getTimestamp(0).toInstant
    val hi = row.getTimestamp(1).toInstant
    val y2000 = java.time.Instant.parse("2000-01-01T00:00:00Z")
    val y2100 = java.time.Instant.parse("2100-01-01T00:00:00Z")
    assert(lo.isAfter(y2000), s"min(ts)=$lo is before 2000 — unit collapse (÷1000?)")
    assert(hi.isBefore(y2100), s"max(ts)=$hi is after 2100 — unit inflation (×1000?)")
    val spanDays = java.time.Duration.between(lo, hi).toDays
    assert(spanDays >= 1 && spanDays <= 366,
      s"events span $spanDays days — a 30-day fixture collapsed or stretched")
  }

  test("the detected events ts unit drives the loader branch") {
    val unit = Tables.eventsTsUnit(spark, s"$sf0001/events.parquet")
    // Whatever the physical unit, the loaded column must be µs
    // TimestampType — the loader's whole contract.
    val tsType = Tables.events(spark, sf0001).schema("ts").dataType
    assert(tsType == TimestampType, s"unit=$unit but loaded ts is $tsType")
  }

  test("the documents corpus is pure ASCII at every scale factor") {
    // CDC chunking (CdcChunks: UTF-16 code units vs the oracle's
    // unicode() codepoints vs DuckDB's character-based substr), the
    // hash kernels, and the BPE oracles are all byte/char-parity
    // constructions whose DuckDB equivalence holds ONLY while the
    // corpus is ASCII (1 byte = 1 UTF-16 unit = 1 codepoint = 1
    // character). The schema tests above can't see corpus content, and
    // the driver has regenerated fixtures between rounds before — so
    // pin the assumption itself: max codepoint over documents.text
    // (and the other string columns those kernels touch) must be <128.
    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1")
        if new java.io.File(s"$sf/documents.parquet").exists) {
      val doc = Tables.documents(spark, sf)
      val strCols = doc.schema.fields
        .filter(_.dataType == StringType).map(_.name).toSeq
      assert(strCols.contains("text"), "documents.text missing?")
      // pure ASCII ⟺ every char is one UTF-8 byte ⟺ octet_length ==
      // char length (cheap full-scan predicate, no per-char explode)
      val nonAscii = doc.filter(strCols.map(c =>
          octet_length(col(c)) =!= length(col(c))).reduce(_ || _))
        .count()
      assert(nonAscii == 0L,
        s"$sf documents has $nonAscii rows with non-ASCII content — " +
          "CDC/HashKernels/BPE oracle parity assumptions are void; " +
          "revisit CdcChunks.scala and the byte-level kernels")
    }
  }

  test("the NANOS fallback branch still reads a raw-long ns fixture") {
    // Re-create the historical layout: INT64 ts with no logical
    // annotation (eventsTsUnit treats it as ns). The loader must divide
    // to µs exactly as it did for rounds 5–8.
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-nsfixture").toString
    val nsOf = (s: String) =>
      java.time.Instant.parse(s).toEpochMilli * 1000000L + 789L
    Seq(
      (1L, nsOf("2024-01-01T00:00:07Z"), 10L, "view", 1.0, "{}"),
      (2L, nsOf("2024-01-30T23:59:59Z"), 11L, "buy", 2.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .repartition(1)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    assert(Tables.eventsTsUnit(spark, s"$dir/events.parquet") ==
      org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit.NANOS)
    val got = Tables.load(spark, dir, "events")
    assert(got.schema("ts").dataType == TimestampType)
    val micros = got.select(unix_micros(col("ts"))).as[Long].collect().sorted
    val want = Seq(
      nsOf("2024-01-01T00:00:07Z") / 1000L,
      nsOf("2024-01-30T23:59:59Z") / 1000L)
    assert(micros.toSeq == want, "ns → µs floor-division mismatch")
  }
}
