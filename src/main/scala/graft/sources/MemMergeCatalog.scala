package graft.sources

import java.util
import java.util.concurrent.ConcurrentHashMap

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.RowDeltaUtils
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.{Expressions, Literal, NamedReference, Transform}
import org.apache.spark.sql.connector.expressions.filter.Predicate
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
  * GROUPS (the connector analogue of Iceberg data files — every append
  * commit creates one new group), the rewritten child computes the
  * post-merge image of the scanned groups (carry-over unmatched rows +
  * WHEN MATCHED updates/deletes + WHEN NOT MATCHED inserts + WHEN NOT
  * MATCHED BY SOURCE actions), and the operation's write REPLACES
  * exactly the groups its own scan read, leaving every other group
  * byte-identical.
  *
  * r19: the table is MULTI-group. It exposes a `_group` metadata column
  * (`SupportsMetadataColumns`), declares it in the operation's
  * `requiredMetadataAttributes`, and the row-level scan implements
  * `SupportsRuntimeV2Filtering` on `_group` — so Catalyst's
  * `RowLevelOperationRuntimeGroupFiltering` rule plants a dynamic-
  * pruning IN-subquery (matched groups only) over the operation scan,
  * and the commit rewrites ONLY the pruned group set. That is the part
  * of the Iceberg-shape contract a single-group demo cannot show:
  * groups NOT scanned are NOT rewritten (MergeIntoSpec pins object
  * identity of the untouched group across a MERGE).
  *
  * Scale notes: the catalog itself is an in-memory CONTRACT
  * demonstration (rows live driver-side, like Spark's own test
  * catalogs) — the point is that the engine drives the standard plan:
  * `EXPLAIN` shows `ReplaceData` over a dynamic-pruning filter → the
  * same rewrite a 100 TB Iceberg table executes, where groups are
  * files/partitions. The MERGE child plan (the join of target and
  * source) is fully distributed either way; only the demo storage is
  * driver-bounded (MergeIntoSpec + q405 keep it at the customer-dim
  * scale).
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
    // r19 (r18 advisor): CREATE must not clobber an existing table's
    // rows — atomically claim the key and fail loudly on a duplicate
    // (Spark's CREATE TABLE IF NOT EXISTS catches this exception).
    val prev = MemMergeCatalog.tables.putIfAbsent((catName, ident),
      new MemMergeCatalog.TableState(schema))
    if (prev != null) throw new TableAlreadyExistsException(ident)
    new MemMergeTable(catName, ident, schema)
  }

  override def alterTable(ident: Identifier,
      changes: TableChange*): Table = {
    // r19 (r18 advisor): loudly refuse rather than silently ignoring
    // the requested changes (the demo table has no ALTER support)
    loadTable(ident) // NoSuchTableException first if absent
    throw new UnsupportedOperationException(
      s"MemMergeCatalog does not support ALTER TABLE (${key(ident)}: " +
        changes.mkString(", ") + ")")
  }

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
  /** The storage-bucket metadata column (the `_file` analogue). */
  val GroupCol = "_group"

  /** Driver-side row store, keyed by (catalog, identifier). Rows are
    * plain JVM values (Long/Int/Double/String/Boolean/…µs/days) so
    * commit messages and scan partitions serialize untouched. Rows
    * live in GROUPS — immutable buckets created one-per-commit (the
    * in-memory analogue of data files); a row-level replace swaps the
    * scanned group ids for one fresh group holding the post-image. */
  final class TableState(val schema: StructType) {
    @volatile var groups: Vector[(Int, Vector[Seq[Any]])] = Vector.empty
    private var nextId = 0
    /** call under `this.synchronized` */
    def nextGroup(): Int = { nextId += 1; nextId - 1 }
    /** group ids the last row-level commit actually replaced (test pin) */
    @volatile var lastReplacedGroups: Set[Int] = Set.empty
    def allRows: Vector[Seq[Any]] = groups.flatMap(_._2)
  }
  private[sources] val tables =
    new ConcurrentHashMap[(String, Identifier), TableState]()

  private[sources] def state(cat: String, ident: Identifier): TableState = {
    val st = tables.get((cat, ident))
    if (st == null) throw new NoSuchTableException(ident)
    st
  }

  /** Test hook: snapshot of a table's (groupId, rows) buckets. */
  private[graft] def groupSnapshot(cat: String, ns: Array[String],
      name: String): Vector[(Int, Vector[Seq[Any]])] =
    state(cat, Identifier.of(ns, name)).groups

  /** Test hook: group ids replaced by the last row-level commit. */
  private[graft] def lastReplacedGroups(cat: String, ns: Array[String],
      name: String): Set[Int] =
    state(cat, Identifier.of(ns, name)).lastReplacedGroups

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
    with SupportsRead with SupportsWrite with SupportsRowLevelOperations
    with SupportsMetadataColumns {
  override def name(): String = s"$cat.${ident.toString}"
  override def schema(): StructType = tschema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE).asJava

  override def metadataColumns(): Array[MetadataColumn] =
    Array(new MetadataColumn {
      override def name(): String = MemMergeCatalog.GroupCol
      override def dataType(): DataType = IntegerType
      override def isNullable: Boolean = false
      override def comment(): String = "storage group (data-file analogue)"
    })

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new MemScanBuilder(cat, ident, tschema, None)

  /** Plain appends (INSERT INTO / DataFrameWriterV2.append). */
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite =
          new MemBatchWrite(cat, ident, tschema, info.schema(), None)
      }
    }

  /** The row-level contract: one operation instance is shared between
    * the rewrite's scan and write, so the write replaces exactly what
    * its own scan read — with runtime group filtering, the matched
    * groups only. */
  override def newRowLevelOperationBuilder(
      info: RowLevelOperationInfo): RowLevelOperationBuilder =
    () => new MemRowLevelOperation(cat, ident, tschema, info.command())
}

private[sources] class MemRowLevelOperation(cat: String, ident: Identifier,
    tschema: StructType, cmd: RowLevelOperation.Command)
    extends RowLevelOperation {
  /** Group ids the operation's scan actually planned (post runtime
    * filter) — the exact set the commit is allowed to rewrite. Written
    * by the scan's `planInputPartitions` (driver), read by the write's
    * `commit` (driver); the scan always executes before the write in a
    * ReplaceData plan. None ⇒ the scan never planned (degenerate
    * empty plan) ⇒ the write conservatively replaces nothing new
    * beyond appending its rows. */
  @volatile var scannedGroups: Option[Set[Int]] = None

  override def command(): RowLevelOperation.Command = cmd
  override def description(): String = s"MemRowLevel($cmd, $cat.$ident)"
  // multi-group table: the rewrite must read the group id so runtime
  // group filtering (and the replaced-group commit) can target groups
  override def requiredMetadataAttributes(): Array[NamedReference] =
    Array(Expressions.column(MemMergeCatalog.GroupCol))
  override def newScanBuilder(
      options: CaseInsensitiveStringMap): ScanBuilder =
    new MemScanBuilder(cat, ident, tschema, Some(this))
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite =
          new MemBatchWrite(cat, ident, tschema, info.schema(), Some(
            MemRowLevelOperation.this))
      }
    }
}

private[sources] class MemScanBuilder(cat: String, ident: Identifier,
    tschema: StructType, op: Option[MemRowLevelOperation])
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private val groupField =
    StructField(MemMergeCatalog.GroupCol, IntegerType, nullable = false)
  private var prunedSchema: StructType =
    if (op.isDefined) StructType(tschema.fields :+ groupField) else tschema
  override def pruneColumns(required: StructType): Unit =
    // `required` may name the _group metadata column; preserve the
    // REQUESTED order (metadata columns are appended after data
    // columns by the analyzer, but don't assume it)
    prunedSchema = StructType(required.fieldNames.collect {
      case MemMergeCatalog.GroupCol => groupField
      case n if tschema.fieldNames.contains(n) =>
        tschema(tschema.fieldIndex(n))
    })
  override def build(): Scan = new Scan with Batch
      with SupportsRuntimeV2Filtering {
    // NB: must read the BUILDER's field — an unqualified `readSchema`
    // here resolves to this method itself and scalac compiles the
    // tail self-call into an infinite loop (bit at birth)
    private val scanSchema = prunedSchema
    // runtime group filter state (set by `filter`, read at planning)
    @volatile private var groupFilter: Option[Set[Int]] = None
    override def readSchema(): StructType = scanSchema
    override def toBatch: Batch = this

    // SupportsRuntimeV2Filtering: only the row-level operation scan
    // advertises a filterable attribute, so Catalyst's
    // RowLevelOperationRuntimeGroupFiltering plants its IN-subquery
    // on MERGE/UPDATE/DELETE scans and nowhere else.
    override def filterAttributes(): Array[NamedReference] =
      if (op.isDefined) Array(Expressions.column(MemMergeCatalog.GroupCol))
      else Array.empty
    override def filter(predicates: Array[Predicate]): Unit = {
      val groupPreds = predicates.filter(
        _.references().map(_.toString).contains(MemMergeCatalog.GroupCol))
      // prune ONLY when every _group predicate is a shape we can
      // decode (IN / =) — a missed prune is always correct (carry-
      // over rewrites the group to an identical image), a wrong
      // prune never is
      if (groupPreds.nonEmpty &&
          groupPreds.forall(p => p.name() == "IN" || p.name() == "=")) {
        val ids = groupPreds.iterator.flatMap(_.children().toSeq.collect {
          case l: Literal[_] if l.dataType == IntegerType =>
            l.value.asInstanceOf[Int]
        }).toSet
        groupFilter = Some(ids)
      }
    }

    override def planInputPartitions(): Array[InputPartition] = {
      // snapshot on the driver at planning time; column-pruned; one
      // partition per storage group (the data-file analogue), pruned
      // to the runtime group filter when one arrived
      val st = MemMergeCatalog.state(cat, ident)
      val surviving = st.groups.filter { case (gid, _) =>
        groupFilter.forall(_.contains(gid))
      }
      op.foreach(_.scannedGroups = Some(surviving.map(_._1).toSet))
      surviving.map { case (gid, rows) =>
        val out = rows.map(r => scanSchema.fieldNames.map {
          case MemMergeCatalog.GroupCol => gid: Any
          case n => r(tschema.fieldIndex(n))
        }.toSeq).toArray
        MemInputPartition(out): InputPartition
      }.toArray
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
  * driver-side commit applies them — append (one fresh group per
  * commit, like a new data file), or (for the row-level write) replace
  * exactly the groups the operation's own scan read. */
private[sources] case class MemCommit(rows: Array[Seq[Any]])
    extends WriterCommitMessage

private[sources] class MemBatchWrite(cat: String, ident: Identifier,
    tschema: StructType, writeSchema: StructType,
    op: Option[MemRowLevelOperation]) extends BatchWrite {
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
      op match {
        case Some(o) =>
          // replace EXACTLY the groups the operation's scan read;
          // untouched groups stay byte-identical (the Iceberg-shape
          // group contract MergeIntoSpec pins)
          val scanned = o.scannedGroups.getOrElse(Set.empty)
          st.groups = st.groups.filterNot(g => scanned(g._1)) ++
            (if (incoming.nonEmpty)
              Vector((st.nextGroup(), incoming)) else Vector.empty)
          st.lastReplacedGroups = scanned
        case None =>
          st.groups = st.groups :+ (st.nextGroup(), incoming)
      }
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
        // r19 (r18 advisor): the marker-at-offset-0 layout is an
        // empirical contract — pin it by VALUE, not just arity: the
        // skipped word must decode to one of RowDeltaUtils' operation
        // codes, so a marker-at-end (or delta-write) layout change
        // fails loudly here instead of silently shifting every field.
        if (extra == 1) {
          val code = row.getInt(0)
          require(code >= RowDeltaUtils.DELETE_OPERATION &&
            code <= RowDeltaUtils.WRITE_WITH_METADATA_OPERATION,
            s"field 0 is not a ${RowDeltaUtils.OPERATION_COLUMN} code: $code")
        }
        val plain = MemMergeCatalog.toPlain(writeSchema, row, extra)
        buf += tableOrder.map(plain(_)).toSeq
      }
      override def commit(): WriterCommitMessage =
        MemCommit(buf.result().toArray)
      override def abort(): Unit = ()
      override def close(): Unit = ()
    }
}
