package graft

import org.apache.spark.sql.functions._

/** Dynamic partition overwrite — the backfill contract: rewriting ONE
  * day/key's partition must replace exactly the partitions present in
  * the written frame and leave every other partition untouched. In
  * static mode (Spark's default) the same INSERT OVERWRITE truncates
  * the whole table first — the classic production data-loss trap this
  * spec documents alongside the safe mode. */
class DynamicOverwriteSpec extends SparkSpec {
  import spark.implicits._

  test("dynamic mode replaces only the partitions being written") {
    val dir = java.nio.file.Files.createTempDirectory("dynov").toString + "/t"
    Seq(("a", 1L), ("a", 2L), ("b", 10L), ("c", 100L))
      .toDF("k", "v").write.partitionBy("k").parquet(dir)

    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    try {
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      // backfill partition k=a only
      Seq(("a", 99L)).toDF("k", "v")
        .write.mode("overwrite").partitionBy("k").parquet(dir)
    } finally {
      prev match {
        case Some(p) =>
          spark.conf.set("spark.sql.sources.partitionOverwriteMode", p)
        case None =>
          spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
      }
    }

    val after = spark.read.parquet(dir).as[(Long, String)].collect().toSet
    assert(after == Set((99L, "a"), (10L, "b"), (100L, "c")),
      s"only k=a may change; got $after")
  }

  test("static mode truncates everything — the documented trap") {
    val dir = java.nio.file.Files.createTempDirectory("dynov").toString + "/t"
    Seq(("a", 1L), ("b", 10L)).toDF("k", "v")
      .write.partitionBy("k").parquet(dir)
    // default (static) overwrite with a one-partition frame
    Seq(("a", 99L)).toDF("k", "v")
      .write.mode("overwrite").partitionBy("k").parquet(dir)
    val after = spark.read.parquet(dir).as[(Long, String)].collect().toSet
    assert(after == Set((99L, "a")),
      "static overwrite must have dropped partition b — if this fails, " +
        "Spark's default changed and the Bucketing/backfill docs need review")
  }
}
