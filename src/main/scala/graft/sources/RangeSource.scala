package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** S11: a native DataSource V2 TableProvider with REAL filter and
  * column pushdown — the engine-extension row that proves this library
  * can speak Spark's connector API, not just consume built-in formats.
  *
  * The table is a deterministic synthetic range — (id BIGINT,
  * val BIGINT = Weyl hash of id, payload STRING) for id ∈ [0, n) —
  * standing in for any external system whose reader can seek:
  * a keyed KV store, a time-indexed log, an object store with zone
  * maps. What matters at 100 TB is WHERE predicates execute:
  *
  *  - [[RangeScanBuilder.pushFilters]] accepts =, <, <=, >, >= on
  *    `id` and NARROWS THE SCANNED RANGE, so the reader never
  *    materializes skipped rows (RangeSourceSpec asserts this at the
  *    scan-metrics level: numOutputRows == the narrowed count, not n).
  *    Unsupported predicates (anything on `val`/`payload`) are
  *    returned as residuals for Spark to evaluate post-scan — the
  *    contract that keeps pushdown CORRECT rather than merely fast.
  *  - [[RangeScanBuilder.pruneColumns]] honors required-column
  *    pruning; a pruned read materializes only the requested fields
  *    (ReadSchema in the plan shows the narrow struct).
  *  - [[RangeScan.planInputPartitions]] splits the surviving range
  *    into `partitions` even slices, so a narrowed scan still
  *    parallelizes across executors.
  *
  * Usage:
  *   spark.read.format("graft.sources.RangeSource")
  *     .option("n", 100000).option("partitions", 8).load()
  */
class RangeSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    RangeSource.fullSchema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    new RangeTable(opts.getLong("n", 1000L),
      opts.getInt("partitions", 4))
  }
}

object RangeSource {
  val fullSchema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("val", LongType, nullable = false),
    StructField("payload", StringType, nullable = false)))

  /** Weyl-style mix — deterministic, engine-independent. */
  def valOf(id: Long): Long = (id * 2654435761L + 1013904223L) % 100000L
  def payloadOf(id: Long): String = s"row-$id"
}

private[sources] class RangeTable(n: Long, partitions: Int)
    extends Table with SupportsRead {
  override def name(): String = s"graft_range($n)"
  override def schema(): StructType = RangeSource.fullSchema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new RangeScanBuilder(n, partitions)
}

private[sources] class RangeScanBuilder(n: Long, partitions: Int)
    extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {
  private var lo = 0L
  private var hi = n // exclusive
  private var accepted = Array.empty[Filter]
  private var required: StructType = RangeSource.fullSchema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (ok, residual) = filters.partition {
      case EqualTo("id", _: java.lang.Long | _: java.lang.Integer) => true
      case GreaterThan("id", _: java.lang.Long | _: java.lang.Integer) => true
      case GreaterThanOrEqual("id",
        _: java.lang.Long | _: java.lang.Integer) => true
      case LessThan("id", _: java.lang.Long | _: java.lang.Integer) => true
      case LessThanOrEqual("id",
        _: java.lang.Long | _: java.lang.Integer) => true
      case IsNotNull("id") => true // id is never null — free to absorb
      case _ => false
    }
    def v(x: Any): Long = x match {
      case l: java.lang.Long => l.longValue()
      case i: java.lang.Integer => i.longValue()
    }
    ok.foreach {
      case EqualTo("id", x) =>
        lo = math.max(lo, v(x)); hi = math.min(hi, v(x) + 1)
      case GreaterThan("id", x) => lo = math.max(lo, v(x) + 1)
      case GreaterThanOrEqual("id", x) => lo = math.max(lo, v(x))
      case LessThan("id", x) => hi = math.min(hi, v(x))
      case LessThanOrEqual("id", x) => hi = math.min(hi, v(x) + 1)
      case _ => ()
    }
    accepted = ok
    residual
  }
  override def pushedFilters(): Array[Filter] = accepted

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan =
    new RangeScan(lo, math.max(lo, hi), partitions, required)
}

private[sources] class RangeScan(lo: Long, hi: Long, partitions: Int,
    schema: StructType) extends Scan with Batch {
  override def readSchema(): StructType = schema
  override def toBatch: Batch = this
  override def description(): String =
    s"graft_range[$lo, $hi) over $partitions slices"

  override def planInputPartitions(): Array[InputPartition] = {
    val span = hi - lo
    val k = math.max(1, math.min(partitions.toLong, math.max(span, 1L))).toInt
    (0 until k).map { i =>
      RangeSlice(lo + span * i / k, lo + span * (i + 1) / k)
    }.toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new RangeReaderFactory(schema)
}

private[sources] case class RangeSlice(from: Long, until: Long)
    extends InputPartition

private[sources] class RangeReaderFactory(schema: StructType)
    extends PartitionReaderFactory {
  override def createReader(
      partition: InputPartition): PartitionReader[InternalRow] = {
    val slice = partition.asInstanceOf[RangeSlice]
    new PartitionReader[InternalRow] {
      private var cur = slice.from - 1
      override def next(): Boolean = { cur += 1; cur < slice.until }
      override def get(): InternalRow = {
        val vals = schema.fieldNames.map {
          case "id" => cur
          case "val" => RangeSource.valOf(cur)
          case "payload" =>
            org.apache.spark.unsafe.types.UTF8String
              .fromString(RangeSource.payloadOf(cur))
        }
        new GenericInternalRow(vals.asInstanceOf[Array[Any]])
      }
      override def close(): Unit = ()
    }
  }
}
