package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/** Dedup-a-new-batch-against-the-corpus — the incremental-ingest shape a
  * training-data pipeline runs on every crawl drop: "which of these N
  * new documents are NOT already in the 100 TB corpus?"
  *
  * The exact form is a left-anti join of the batch against the corpus —
  * correct but it shuffles/scans the CORPUS side every time. The bloom
  * pre-filter changes the economics: one corpus pass builds a bits-sized
  * sketch (built distributed via Spark's `stat.bloomFilter` tree
  * aggregation — only the filter's bit array reaches the driver, the
  * same model-not-data contract as AnnIvf centroids), then every future
  * batch checks membership locally per partition. Rows the filter has
  * never seen are DEFINITELY new (bloom has no false negatives) and
  * skip the join entirely; only the `mightContain` survivors — true
  * dups + fpp of the batch — need the exact anti-join. The corpus-side
  * join input can then be semi-pruned to the maybe keys. Result is
  * EXACT: the bloom only routes rows, it never decides membership.
  *
  * The membership probe is a scala UDF over the broadcast filter — the
  * one UDF-appropriate case (an opaque external structure; there is no
  * builtin-expression form of "query this bit array").
  */
object BloomDedup {

  /** One corpus pass → membership sketch over `keyCol`. An empty corpus
    * is a legitimate first-ingest state but breaks Spark twice over
    * (`BloomFilter.create` throws on 0 expected insertions; the
    * `stat.bloomFilter` tree aggregation NPEs on a null zero-buffer), so
    * it short-circuits to a fresh filter that matches nothing — every
    * batch row then routes definitely-new. The `isEmpty` probe is a
    * limit-1 job, negligible next to the corpus aggregation it guards. */
  def buildFilter(corpus: DataFrame, keyCol: String,
      expectedItems: Long, fpp: Double = 0.01): BloomFilter = {
    val n = math.max(1L, expectedItems)
    if (corpus.isEmpty) BloomFilter.create(n, fpp)
    else corpus.stat.bloomFilter(keyCol, n, fpp)
  }

  /** `mightContain(key)` as a column (broadcast via UDF closure).
    * Dispatches on the key type (integral vs string — the two types
    * `stat.bloomFilter` supports); a NULL key yields false ("never
    * seen"), which routes null-keyed rows to the definitely-new branch
    * — matching anti-join semantics, where a null key equals nothing
    * and therefore always survives. */
  def mightContain(bloom: BloomFilter, key: Column,
      dt: org.apache.spark.sql.types.DataType): Column = {
    import org.apache.spark.sql.types._
    dt match {
      case LongType | IntegerType | ShortType | ByteType =>
        val probe = udf((k: java.lang.Long) =>
          k != null && bloom.mightContainLong(k))
        probe(key.cast("long"))
      case StringType =>
        val probe = udf((k: String) =>
          k != null && bloom.mightContainString(k))
        probe(key)
      case other => throw new IllegalArgumentException(
        s"bloom key type not supported: $other (integral or string only)")
    }
  }

  /** Exact "batch rows whose key is not in the corpus", bloom-routed.
    * Output == plain `batch.join(corpus, key, "left_anti")`, proven in
    * BloomDedupSpec; the join only ever sees the maybe-dup slice. */
  def newAgainst(batch: DataFrame, corpus: DataFrame, keyCol: String,
      bloom: BloomFilter): DataFrame = {
    val dt = batch.schema(keyCol).dataType
    val maybe = mightContain(bloom, col(keyCol), dt)
    val definitelyNew = batch.filter(!maybe)
    val needCheck = batch.filter(maybe)
    val confirmedNew = needCheck.join(
      corpus.select(col(keyCol).as("bd_corpus_key")),
      col(keyCol) === col("bd_corpus_key"), "left_anti")
    definitelyNew.unionByName(confirmedNew)
  }
}
