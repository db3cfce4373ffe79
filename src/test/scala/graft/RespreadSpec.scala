package graft

import graft.ops.Respread
import org.apache.spark.sql.functions._

/** Pins [[Respread.ifNarrow]]'s two contractual behaviors (r19
  * optimization round): a frame NARROWER than the context's default
  * parallelism is re-spread to exactly that many hash partitions with
  * no row loss, and a frame already at-or-above it passes through with
  * its plan untouched (no repartition is ever added to a wide scan —
  * the production-scale case must never pay a payload shuffle).
  */
class RespreadSpec extends SparkSpec {
  import spark.implicits._

  private val target = spark.sparkContext.defaultParallelism

  test("narrow input is re-spread to defaultParallelism, rows preserved") {
    val narrow = (1L to 1000L).toDF("id").coalesce(1)
    assert(narrow.rdd.getNumPartitions === 1)
    val out = Respread.ifNarrow(narrow, col("id"))
    assert(out.rdd.getNumPartitions === target)
    assert(out.as[Long].collect().sorted === (1L to 1000L).toArray)
  }

  test("wide input passes through with an identical plan") {
    val wide = (1L to 1000L).toDF("id").repartition(target + 3)
    val out = Respread.ifNarrow(wide, col("id"))
    assert(out.queryExecution.logical eq wide.queryExecution.logical,
      "must return the same frame, not a rewrapped one")
    assert(out.rdd.getNumPartitions === target + 3)
  }
}
