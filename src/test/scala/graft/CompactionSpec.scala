package graft

import java.nio.file.Files

import graft.ops.Compaction
import org.apache.spark.sql.functions._

/** Compaction invariants: bounded rows per file, expected file count,
  * and DISJOINT key ranges across files — the property that lets
  * parquet min/max stats prune a sort-key filter down to one file. */
class CompactionSpec extends SparkSpec {

  test("writeClustered bounds file sizes and range-clusters the sort key") {
    val docs = Tables.documents(spark, sf0001) // 500 rows
    val dir = Files.createTempDirectory("compaction").toString + "/docs"
    val k = Compaction.writeClustered(docs, dir, Seq("doc_id"),
      targetRowsPerFile = 150L)
    assert(k == 4, s"500 rows at 150/file should plan 4 files, got $k")

    val perFile = spark.read.parquet(dir)
      .select(col("doc_id"),
        input_file_name().as("f"))
      .groupBy("f")
      .agg(count(lit(1)).as("rows"),
        min("doc_id").as("lo"), max("doc_id").as("hi"))
      .collect()
    assert(perFile.length >= k, "expected at least the planned file count")
    assert(perFile.forall(_.getLong(1) <= 150L), "a file exceeds maxRecordsPerFile")

    // disjoint ranges: sort files by lo; each lo must exceed the prior hi
    val ranges = perFile.map(r => (r.getLong(2), r.getLong(3))).sortBy(_._1)
    val overlaps = ranges.sliding(2).exists {
      case Array((_, hi1), (lo2, _)) => lo2 <= hi1
      case _ => false
    }
    assert(!overlaps, s"files must cover disjoint doc_id ranges: ${ranges.toSeq}")
  }

  test("filesFor rounds up and never returns zero") {
    assert(Compaction.filesFor(0, 100) == 1)
    assert(Compaction.filesFor(100, 100) == 1)
    assert(Compaction.filesFor(101, 100) == 2)
  }
}
