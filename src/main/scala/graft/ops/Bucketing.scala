package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table layout for shuffle-free co-located joins — the
  * third leg of the join-locality ladder next to broadcast (small
  * side) and salting (hot keys): when two fact-sized tables are
  * repeatedly joined on the same key, write BOTH hash-bucketed and
  * bucket-sorted on that key, and every subsequent join (and
  * aggregation on the key) reads pre-partitioned, pre-sorted data —
  * Catalyst's `EnsureRequirements` sees the required distribution
  * already satisfied and inserts NO exchange and NO sort. At 100 TB
  * this converts the recurring join's O(data) shuffle into a one-time
  * layout cost at write, exactly what lakehouse `CLUSTERED BY` /
  * bucketed Hive tables exist for (the L34 z-order sink solves the
  * same problem for range predicates; this solves it for equi-joins).
  *
  * Buckets must agree on BOTH sides (same count, same key) — Spark
  * hashes rows to buckets with the same `Murmur3Hash` the shuffle
  * would use, which is what makes bucket i ⋈ bucket i complete.
  * BucketingSpec proves the contract: zero exchanges and zero sorts in
  * the joined plan, row-parity with the unbucketed join, and a
  * bucket-pruned point lookup.
  *
  * Zero-EXCHANGE is unconditional. Zero-SORT additionally needs
  * `spark.sql.legacy.bucketedTableScan.outputOrdering=true`: since 3.0
  * Spark ignores the written sort order by default because a
  * multi-file bucket would interleave at read time — [[writeBucketed]]
  * pre-shuffles onto the bucket hash so every bucket is exactly one
  * file, which is the case that flag exists for. Without it the join
  * still skips the shuffle and pays only an in-memory sort.
  */
object Bucketing {

  /** Write `df` as a managed parquet table hash-bucketed (and
    * bucket-sorted) on `key`. The pre-shuffle onto the bucket hash
    * (same Murmur3+pmod Spark's bucket writer uses) leaves each task
    * exactly one bucket, i.e. ONE file per bucket — the layout Spark
    * requires before it will trust the written sort order at read time
    * (multi-file buckets force a re-sort above the scan). */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.repartition(buckets, org.apache.spark.sql.functions.col(key))
      .write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(table)

  /** Join two bucketed tables on their shared bucket key. With equal
    * bucket counts this plans as a zero-exchange, zero-sort
    * sort-merge join. */
  def bucketedJoin(spark: SparkSession, leftTable: String,
      rightTable: String, key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)
}
