package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Typed loaders for the driver-generated fixture tables.
  *
  * Schemas are declared explicitly (ground truth: FIXTURES.md, dumped from
  * the parquet files themselves) so a misread fails fast instead of being
  * silently inferred — SURVEY.md §1.2. All fields nullable to match parquet
  * defaults. `events.ts` has shipped as both timestamp[ns] (rounds 5–8)
  * and timestamp[us] (round 9+): its unit is detected from the parquet
  * footer per [[eventsTsUnit]], never assumed (FIXTURES.md hazard #1).
  */
object Tables {
  private def st(fields: (String, DataType)*): StructType =
    StructType(fields.map { case (n, t) => StructField(n, t, nullable = true) })

  val lineitemSchema: StructType = st(
    "l_orderkey" -> LongType, "l_partkey" -> LongType, "l_suppkey" -> LongType,
    "l_linenumber" -> IntegerType, "l_quantity" -> DoubleType,
    "l_extendedprice" -> DoubleType, "l_discount" -> DoubleType,
    "l_tax" -> DoubleType, "l_returnflag" -> StringType,
    "l_linestatus" -> StringType, "l_shipdate" -> TimestampType)

  val ordersSchema: StructType = st(
    "o_orderkey" -> LongType, "o_custkey" -> LongType,
    "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
    "o_orderdate" -> TimestampType, "o_orderpriority" -> StringType)

  val customerSchema: StructType = st(
    "c_custkey" -> LongType, "c_name" -> StringType,
    "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
    "c_mktsegment" -> StringType)

  val supplierSchema: StructType = st(
    "s_suppkey" -> LongType, "s_name" -> StringType,
    "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType)

  val partSchema: StructType = st(
    "p_partkey" -> LongType, "p_name" -> StringType, "p_brand" -> StringType,
    "p_type" -> StringType, "p_size" -> IntegerType,
    "p_retailprice" -> DoubleType)

  val nationSchema: StructType = st(
    "n_nationkey" -> IntegerType, "n_name" -> StringType,
    "n_regionkey" -> IntegerType)

  val regionSchema: StructType = st(
    "r_regionkey" -> IntegerType, "r_name" -> StringType)

  val eventsSchema: StructType = st(
    "event_id" -> LongType, "ts" -> TimestampType, "user_id" -> LongType,
    "event_type" -> StringType, "value" -> DoubleType, "props" -> StringType)

  val documentsSchema: StructType = st(
    "doc_id" -> LongType, "text" -> StringType, "lang" -> StringType,
    "source" -> StringType, "n_chars" -> LongType)

  val embeddingsSchema: StructType = st(
    "vec_id" -> LongType, "embedding" -> ArrayType(FloatType),
    "label" -> IntegerType)

  val schemas: Map[String, StructType] = Map(
    "lineitem" -> lineitemSchema, "orders" -> ordersSchema,
    "customer" -> customerSchema, "supplier" -> supplierSchema,
    "part" -> partSchema, "nation" -> nationSchema, "region" -> regionSchema,
    "events" -> eventsSchema, "documents" -> documentsSchema,
    "embeddings" -> embeddingsSchema)

  /** Raw-long read schema for the historical timestamp[ns] fixture
    * layout, which Spark 4 refuses to map to its µs TimestampType
    * (PARQUET_TYPE_ILLEGAL). Used only when [[eventsTsUnit]] detects
    * NANOS in the footer; the ns long is floor-divided to µs — the
    * identical truncation DuckDB applies on read. */
  private val eventsRawSchema: StructType = st(
    "event_id" -> LongType, "ts" -> LongType, "user_id" -> LongType,
    "event_type" -> StringType, "value" -> DoubleType, "props" -> StringType)

  /** Relation memo per (sessionUUID → (dir, table)): a DataFrame is an
    * immutable logical plan, so reuse is safe, and it keeps one
    * InMemoryFileIndex per table instead of re-listing the directory on
    * every query that mentions it (the bench's ~90 queries × ~2 tables
    * each adds up).
    *
    * Eviction discipline: the key is the session's UUID *string* — never
    * the session itself or anything the cached values reference. (A
    * WeakHashMap[SparkSession, DataFrame] is inert here: a DataFrame
    * strongly references its SparkSession through QueryExecution, so
    * every entry's value would pin its own key and nothing could ever be
    * collected.) Eviction is explicit, on two triggers:
    *  - application end: the first load on a given SparkContext
    *    registers ONE SparkListener (per context, not per session —
    *    the bus must not accumulate a listener per short-lived clone)
    *    that clears the memo when the context stops; every session of a
    *    stopped context is unusable anyway, and one context is active
    *    per JVM, so a full clear is exact. Stopped sessions and their
    *    cached plans then become collectable instead of being retained
    *    for the JVM lifetime.
    *  - LRU bound: `newSession()` clones can be dropped by the caller
    *    while the context lives on, and nothing observable marks that
    *    moment — so the session map is capped at [[MaxSessions]] with
    *    least-recently-LOADED eviction. A pathological
    *    clone-per-request service retains at most MaxSessions sessions'
    *    plans instead of growing without bound.
    * TablesMemoSpec pins eviction and the GC-collectability of an
    * evicted session. */
  private val MaxSessions = 64
  private val memo = new java.util.LinkedHashMap[
      String, scala.collection.concurrent.TrieMap[(String, String), DataFrame]](
      16, 0.75f, /* accessOrder = */ true) {
    override def removeEldestEntry(
        e: java.util.Map.Entry[String,
          scala.collection.concurrent.TrieMap[(String, String), DataFrame]]): Boolean =
      size() > MaxSessions
  }
  private val hookedContexts =
    java.util.concurrent.ConcurrentHashMap.newKeySet[org.apache.spark.SparkContext]()

  /** Test hook: is anything memoized for this session UUID? */
  private[graft] def isMemoized(sessionUUID: String): Boolean =
    memo.synchronized(memo.containsKey(sessionUUID))

  private[graft] def evict(sessionUUID: String): Unit =
    memo.synchronized(memo.remove(sessionUUID))

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val uuid = org.apache.spark.sql.GraftColumnBridge.sessionUUID(spark)
    val sc = spark.sparkContext
    if (hookedContexts.add(sc)) {
      sc.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onApplicationEnd(
            e: org.apache.spark.scheduler.SparkListenerApplicationEnd): Unit = {
          memo.synchronized(memo.clear())
          hookedContexts.remove(sc)
        }
      })
    }
    val perSession = memo.synchronized {
      val existing = memo.get(uuid)
      if (existing != null) existing
      else {
        val fresh =
          scala.collection.concurrent.TrieMap.empty[(String, String), DataFrame]
        memo.put(uuid, fresh)
        fresh
      }
    }
    // TrieMap.getOrElseUpdate is atomic; a lost race just builds the
    // same immutable plan twice, which is harmless. Plan construction
    // stays OUTSIDE the memo lock.
    perSession.getOrElseUpdate((dir, name), build(spark, dir, name))
  }

  private def build(spark: SparkSession, dir: String, name: String): DataFrame = {
      if (name == "events") {
        import org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit
        eventsTsUnit(spark, s"$dir/$name.parquet") match {
          case TimeUnit.NANOS =>
            // Spark 4 refuses TIMESTAMP(NANOS) → TimestampType
            // (PARQUET_TYPE_ILLEGAL): read the raw ns long and
            // floor-divide to µs — the same truncation DuckDB applies.
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            spark.read.schema(eventsRawSchema).parquet(s"$dir/$name.parquet")
              .withColumn("ts",
                org.apache.spark.sql.functions.timestamp_micros(
                  org.apache.spark.sql.functions.expr("ts div 1000")))
          case _ =>
            // MICROS and MILLIS both map natively to Spark's µs
            // TimestampType via the declared schema.
            spark.read.schema(eventsSchema).parquet(s"$dir/$name.parquet")
        }
      } else {
        spark.read.schema(schemas(name)).parquet(s"$dir/$name.parquet")
      }
  }

  /** The physical unit of `events.ts`, read from the parquet footers.
    *
    * The fixture generator has changed this once already (timestamp[ns]
    * through round 8's regeneration, timestamp[us] after), so the unit is
    * a property of the files on disk, not of this codebase: detect it,
    * never assume it. A bare INT64 with no logical annotation is treated
    * as the historical raw-nanosecond layout. For a directory, EVERY
    * part-file footer is inspected (footers only — no data pages) and
    * they must agree: a mixed-unit directory (partial fixture
    * regeneration, appended writes from a different writer) would
    * otherwise be silently mis-read on whichever single branch was
    * detected. FixtureContractSpec pins both branches. */
  private[graft] def eventsTsUnit(
      spark: SparkSession,
      path: String): org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit = {
    import org.apache.hadoop.fs.Path
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import org.apache.parquet.schema.LogicalTypeAnnotation
    import org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit
    val conf = spark.sessionState.newHadoopConf()
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val files =
      if (fs.getFileStatus(p).isDirectory) {
        val parts = fs.listStatus(p).map(_.getPath)
          .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_"))
        if (parts.isEmpty)
          throw new IllegalStateException(s"no parquet part files under $path")
        parts.toSeq
      } else Seq(p)
    def unitOf(file: Path): TimeUnit = {
      val reader = ParquetFileReader.open(HadoopInputFile.fromPath(file, conf))
      try {
        val schema = reader.getFooter.getFileMetaData.getSchema
        val field = schema.getType(schema.getFieldIndex("ts"))
        field.getLogicalTypeAnnotation match {
          case t: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
            t.getUnit
          case _
              if field.asPrimitiveType().getPrimitiveTypeName ==
                org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName.INT96 =>
            // Legacy Spark/Hive INT96 timestamp (no annotation): Spark's
            // reader maps it to TimestampType natively — take the µs path.
            TimeUnit.MICROS
          case _ => TimeUnit.NANOS // bare INT64: the historical raw-ns layout
        }
      } finally reader.close()
    }
    val units = files.map(f => f -> unitOf(f))
    val distinct = units.map(_._2).distinct
    if (distinct.size != 1)
      throw new IllegalStateException(
        s"mixed ts units across part files of $path: " +
          units.map { case (f, u) => s"${f.getName}=$u" }.mkString(", ") +
          " — refusing to pick one; regenerate the fixture with a single writer")
    distinct.head
  }

  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def events(s: SparkSession, d: String): DataFrame = load(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame =
    load(s, d, "embeddings")
}
