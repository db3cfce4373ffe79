package graft.sources

import java.util
import java.util.concurrent.ConcurrentHashMap

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.{NamedReference, Transform}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** S12: native SQL `MERGE INTO` through Spark's row-level-operation
  * connector contract — the write-side sibling of [[RangeSource]] (S11,
  * the read-side pushdown row). Spark ships NO builtin table that can
  * execute MERGE (the parquet session catalog raises "MERGE INTO TABLE
  * is not supported temporarily"); the capability lives behind
  * `SupportsRowLevelOperations`, the same API Iceberg and Delta
  * implement. This catalog implements the GROUP-BASED form of that
  * contract, the one Catalyst's `RewriteMergeIntoTable` rewrites into a
  * `ReplaceData` plan: the operation's scan reads the target's row
  * groups, the rewritten child computes the post-merge image of those
  * groups (carry-over unmatched rows + WHEN MATCHED updates/deletes +
  * WHEN NOT MATCHED inserts + WHEN NOT MATCHED BY SOURCE actions), and
  * the operation's write REPLACES exactly the groups the scan read.
  * This table is a single group (`requiredMetadataAttributes` is
  * empty), so a commit swaps the full row set scanned by ITS OWN
  * operation instance — the minimal honest implementation of the
  * contract.
  *
  * Scale notes: the catalog itself is an in-memory CONTRACT
  * demonstration (rows live driver-side, like Spark's own test
  * catalogs) — the point is that the engine drives the standard plan:
  * `EXPLAIN` shows `ReplaceData` → the same rewrite a 100 TB Iceberg
  * table executes, where groups are files/partitions and the scan
  * prunes to matched groups via runtime group filtering. The MERGE
  * child plan (the join of target and source) is fully distributed
  * either way; only the demo storage is driver-bounded
  * (MergeIntoSpec + q405 keep it at the customer-dim scale).
  *
  * Registration: `spark.sql.catalog.graftmem = graft.sources.MemMergeCatalog`.
  */
class MemMergeCatalog extends TableCatalog with SupportsNamespaces {
  private var catName = "graftmem"

  override def initialize(name: String,
      options: CaseInsensitiveStringMap): Unit = { catName = name }
  override def name(): String = catName

  private def key(ident: Identifier): String =
    (ident.namespace() :+ ident.name()).mkString(".")

  override def listTables(ns: Array[String]): Array[Identifier] =
    MemMergeCatalog.tables.keySet().asScala
      .filter(_._1 == catName).map(_._2).toArray
      .filter(_.namespace().sameElements(ns))

  override def loadTable(ident: Identifier): Table = {
    val st = MemMergeCatalog.tables.get((catName, ident))
    if (st == null) throw new NoSuchTableException(ident)
    new MemMergeTable(catName, ident, st.schema)
  }

  override def createTable(ident: Identifier, columns: Array[Column],
      partitions: Array[Transform],
      properties: util.Map[String, String]): Table = {
    // (CatalogV2Util.v2ColumnsToStructType is private[sql]; the demo
    // supports plain non-default columns, so the direct mapping holds)
    val schema = StructType(columns.map(c =>
      StructField(c.name(), c.dataType(), c.nullable())))
    MemMergeCatalog.tables.put((catName, ident),
      new MemMergeCatalog.TableState(schema))
    new MemMergeTable(catName, ident, schema)
  }

  override def alterTable(ident: Identifier,
      changes: TableChange*): Table = loadTable(ident)

  override def dropTable(ident: Identifier): Boolean =
    MemMergeCatalog.tables.remove((catName, ident)) != null

  override def renameTable(from: Identifier, to: Identifier): Unit = {
    val st = MemMergeCatalog.tables.remove((catName, from))
    if (st == null) throw new NoSuchTableException(from)
    MemMergeCatalog.tables.put((catName, to), st)
  }

  // permissive namespaces: every referenced namespace exists
  override def listNamespaces(): Array[Array[String]] =
    MemMergeCatalog.tables.keySet().asScala.filter(_._1 == catName)
      .map(_._2.namespace().toSeq).toSet.map((s: Seq[String]) => s.toArray)
      .toArray
  override def listNamespaces(ns: Array[String]): Array[Array[String]] =
    Array.empty
  override def namespaceExists(ns: Array[String]): Boolean = true
  override def loadNamespaceMetadata(
      ns: Array[String]): util.Map[String, String] =
    util.Collections.emptyMap()
  override def createNamespace(ns: Array[String],
      meta: util.Map[String, String]): Unit = ()
  override def alterNamespace(ns: Array[String],
      changes: NamespaceChange*): Unit = ()
  override def dropNamespace(ns: Array[String], cascade: Boolean): Boolean = {
    if (!listNamespaces().exists(_.sameElements(ns))) {
      throw new NoSuchNamespaceException(ns)
    }
    true
  }
}

object MemMergeCatalog {
  /** Driver-side row store, keyed by (catalog, identifier). Rows are
    * plain JVM values (Long/Int/Double/String/Boolean/…µs/days) so
    * commit messages and scan partitions serialize untouched. */
  final class TableState(val schema: StructType) {
    @volatile var rows: Vector[Seq[Any]] = Vector.empty
  }
  private[sources] val tables =
    new ConcurrentHashMap[(String, Identifier), TableState]()

  private[sources] def state(cat: String, ident: Identifier): TableState = {
    val st = tables.get((cat, ident))
    if (st == null) throw new NoSuchTableException(ident)
    st
  }

  private[sources] def toPlain(schema: StructType, row: InternalRow,
      offset: Int = 0): Seq[Any] =
    schema.fields.zipWithIndex.map { case (f, j) =>
      val i = j + offset
      if (row.isNullAt(i)) null
      else f.dataType match {
        case LongType | TimestampType => row.getLong(i)
        case IntegerType | DateType => row.getInt(i)
        case DoubleType => row.getDouble(i)
        case BooleanType => row.getBoolean(i)
        case StringType => row.getUTF8String(i).toString
        case dt => throw new UnsupportedOperationException(
          s"MemMergeCatalog demo type: $dt")
      }
    }.toSeq

  private[sources] def toInternal(values: Seq[Any]): InternalRow =
    new GenericInternalRow(values.map {
      case s: String => UTF8String.fromString(s)
      case v => v
    }.toArray)
}

private[sources] class MemMergeTable(cat: String, ident: Identifier,
    tschema: StructType) extends Table
    with SupportsRead with SupportsWrite with SupportsRowLevelOperations {
  override def name(): String = s"$cat.${ident.toString}"
  override def schema(): StructType = tschema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new MemScanBuilder(cat, ident, tschema)

  /** Plain appends (INSERT INTO / DataFrameWriterV2.append). */
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite =
          new MemBatchWrite(cat, ident, tschema, info.schema(),
            replaceAll = false)
      }
    }

  /** The row-level contract: one operation instance is shared between
    * the rewrite's scan and write, so the write replaces exactly what
    * its own scan read (here: the single whole-table group). */
  override def newRowLevelOperationBuilder(
      info: RowLevelOperationInfo): RowLevelOperationBuilder =
    () => new MemRowLevelOperation(cat, ident, tschema, info.command())
}

private[sources] class MemRowLevelOperation(cat: String, ident: Identifier,
    tschema: StructType, cmd: RowLevelOperation.Command)
    extends RowLevelOperation {
  override def command(): RowLevelOperation.Command = cmd
  override def description(): String = s"MemRowLevel($cmd, $cat.$ident)"
  // single-group table: no metadata columns, whole-table rewrite
  override def requiredMetadataAttributes(): Array[NamedReference] =
    Array.empty
  override def newScanBuilder(
      options: CaseInsensitiveStringMap): ScanBuilder =
    new MemScanBuilder(cat, ident, tschema)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite =
          new MemBatchWrite(cat, ident, tschema, info.schema(),
            replaceAll = true)
      }
    }
}

private[sources] class MemScanBuilder(cat: String, ident: Identifier,
    tschema: StructType) extends ScanBuilder
    with SupportsPushDownRequiredColumns {
  private var prunedSchema: StructType = tschema
  override def pruneColumns(required: StructType): Unit =
    prunedSchema = StructType(
      tschema.fields.filter(f => required.fieldNames.contains(f.name)))
  override def build(): Scan = new Scan with Batch {
    // NB: must read the BUILDER's field — an unqualified `readSchema`
    // here resolves to this method itself and scalac compiles the
    // tail self-call into an infinite loop (bit at birth)
    private val scanSchema = prunedSchema
    override def readSchema(): StructType = scanSchema
    override def toBatch: Batch = this
    override def planInputPartitions(): Array[InputPartition] = {
      // snapshot on the driver at planning time; column-pruned
      val st = MemMergeCatalog.state(cat, ident)
      val idx = scanSchema.fieldNames
        .map(n => tschema.fieldIndex(n))
      val rows = st.rows.map(r => idx.map(r(_)).toSeq).toArray
      Array(MemInputPartition(rows))
    }
    override def createReaderFactory(): PartitionReaderFactory =
      new MemReaderFactory
  }
}

private[sources] case class MemInputPartition(rows: Array[Seq[Any]])
    extends InputPartition

private[sources] class MemReaderFactory extends PartitionReaderFactory {
  override def createReader(
      partition: InputPartition): PartitionReader[InternalRow] = {
    val rows = partition.asInstanceOf[MemInputPartition].rows
    new PartitionReader[InternalRow] {
      private var i = -1
      override def next(): Boolean = { i += 1; i < rows.length }
      override def get(): InternalRow =
        MemMergeCatalog.toInternal(rows(i))
      override def close(): Unit = ()
    }
  }
}

/** Executors buffer plain-value rows into the commit message; the
  * driver-side commit applies them — append, or (for the row-level
  * write) replace the scanned group, i.e. the whole row set. */
private[sources] case class MemCommit(rows: Array[Seq[Any]])
    extends WriterCommitMessage

private[sources] class MemBatchWrite(cat: String, ident: Identifier,
    tschema: StructType, writeSchema: StructType, replaceAll: Boolean)
    extends BatchWrite {
  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory =
    // rows arrive in the WRITE schema (the rewritten plan's output
    // order, not necessarily table order — bit at birth: ReplaceData
    // delivered UnsafeRows whose layout mismatched a table-order read);
    // extract by the write schema, store reordered into table order
    new MemWriterFactory(writeSchema,
      tschema.fieldNames.map(n => writeSchema.fieldIndex(n)))
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val st = MemMergeCatalog.state(cat, ident)
    val incoming = messages.iterator
      .flatMap(_.asInstanceOf[MemCommit].rows).toVector
    st.synchronized {
      st.rows = if (replaceAll) incoming else st.rows ++ incoming
    }
  }
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

private[sources] class MemWriterFactory(writeSchema: StructType,
    tableOrder: Array[Int]) extends DataWriterFactory {
  override def createWriter(partitionId: Int,
      taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private val buf = Vector.newBuilder[Seq[Any]]
      override def write(row: InternalRow): Unit = {
        // Group-based ReplaceData hands the MergeRows output verbatim:
        // [__row_operation, <data cols in write-schema order>] — the
        // marker distinguishes split updates for delta-aware writers
        // and is skipped here (every emitted row IS the replacement
        // image; deletes are simply not emitted). Plain appends carry
        // no marker. Bit at birth: reading table-order fields off the
        // 4-field UnsafeRow returned string-pointer words as longs.
        val extra = row.numFields - writeSchema.length
        require(extra == 0 || extra == 1,
          s"unexpected write row arity ${row.numFields} for ${writeSchema.simpleString}")
        val plain = MemMergeCatalog.toPlain(writeSchema, row, extra)
        buf += tableOrder.map(plain(_)).toSeq
      }
      override def commit(): WriterCommitMessage =
        MemCommit(buf.result().toArray)
      override def abort(): Unit = ()
      override def close(): Unit = ()
    }
}
