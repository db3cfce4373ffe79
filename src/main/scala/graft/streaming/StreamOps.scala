package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, GroupState, GroupStateTimeout, ListState, MapState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Event record as it arrives on the stream — mirrors the `events`
  * fixture schema (FIXTURES.md) minus the JSON props column. */
case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
    event_type: String, value: Double)

/** Funnel output: a user's first signup and first purchase at-or-after
  * it (T6, SURVEY.md §2.9). */
case class Conversion(user_id: Long, signup_ts: Timestamp,
    conv_ts: Timestamp, conv_sec: Long)

private case class FunnelState(signupUs: Long, converted: Boolean)

case class EwmaPoint(user_id: Long, ts: Timestamp, value: Double,
    ewma: Double)

/** One updated (user, event_type) counter after a micro-batch, plus the
  * user's current distinct-type count (MapState demo, §2.9 T6). */
case class TypeCount(user_id: Long, event_type: String, n_type: Long,
    n_types: Long)

/** A closed session: [start, end] span and its event count (T6 timers). */
case class TtlCount(user_id: Long, n: Long)

/** One merged equi-width bin census after a micro-batch (q357's
  * mergeable-histogram property as keyed state), with the interpolated
  * P50 read off the merged bins. */
case class HistCensus(user_id: Long, n: Long, bins: Seq[Long],
    est_p50: Double)

private case class HistState(bins: Seq[Long])

case class SessionOut(user_id: Long, start: Timestamp, end: Timestamp,
    n_events: Long)

private case class SessionState(startUs: Long, lastUs: Long, n: Long)

/** Structured Streaming operators T1–T7 + J12 (SURVEY.md §2.9). Batch
  * parity forms live in `graft.ops.EventQueries`; these take a streaming
  * (or batch — watermarks no-op there) DataFrame and return the
  * transformed stream, so callers pick source and sink.
  *
  * Scale notes: every op keys state by window/user/event_id — state
  * stores partition by the grouping key across executors, and watermarks
  * bound state size (no unbounded accumulation at 100 TB/day rates).
  */
object StreamOps {

  /** T1/T4: tumbling event-time counts with a watermark. Late rows
    * beyond `delay` are dropped; in append mode a window emits once its
    * end passes the watermark. */
  def tumblingCounts(events: DataFrame, width: String = "1 hour",
      delay: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", delay)
      .groupBy(window(col("ts"), width), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("bucket_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** T2: sliding event-time windows with a watermark — each event lands
    * in width/slide overlapping buckets (the streaming form of
    * EventQueries.q58). In append mode a bucket emits once its END
    * passes the watermark, so the overlapping buckets of one event
    * finish at different micro-batches. */
  def slidingCounts(events: DataFrame, width: String = "1 hour",
      slide: String = "15 minutes", delay: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", delay)
      .groupBy(window(col("ts"), width, slide))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("bucket_start"), col("n"))

  /** T3: gap-based session windows per user (streaming form of
    * EventQueries.q59's gaps-and-islands). */
  def sessionCounts(events: DataFrame, gap: String = "30 minutes",
      delay: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", delay)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n_events"))

  /** T5: exactly-once per event_id within the watermark horizon. */
  def dedupByEventId(events: DataFrame, delay: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", delay)
      .dropDuplicatesWithinWatermark("event_id")

  /** J12: enrich the stream with a static dimension. Broadcast by hint —
    * a static dim joined into every micro-batch should never shuffle the
    * stream side. */
  def enrichWithCustomers(events: DataFrame, customers: DataFrame): DataFrame =
    events.join(broadcast(customers),
      events("user_id") === customers("c_custkey"), "left")

  /** Stream-stream interval join: purchases matched to the same user's
    * views within `horizon` BEFORE the purchase. Both sides carry
    * watermarks and the join condition bounds view_ts on both ends, so
    * Spark can expire buffered state — the requirements for an append-
    * mode stream-stream join to be runnable at all (unbounded state
    * otherwise). Inner join: purchases with no view in the horizon drop. */
  def purchasesWithRecentViews(purchases: DataFrame, views: DataFrame,
      horizon: String = "1 hour", delay: String = "10 minutes"): DataFrame = {
    val p = purchases.withWatermark("ts", delay)
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"))
    val v = views.withWatermark("ts", delay)
      .select(col("user_id").as("v_user_id"), col("event_id").as("view_id"),
        col("ts").as("view_ts"))
    p.join(v,
      col("user_id") === col("v_user_id") &&
        col("view_ts") <= col("purchase_ts") &&
        col("view_ts") >= col("purchase_ts") - expr(s"INTERVAL $horizon"))
      .select("user_id", "purchase_id", "purchase_ts", "view_id", "view_ts")
  }

  /** [[purchasesWithRecentViews]] as a LEFT OUTER stream-stream join —
    * the attribution completeness case: every purchase must surface,
    * view-attributed or not. Outer stream-stream is the semantically
    * loaded variant: an unmatched left row CANNOT emit when it
    * arrives (a matching view may still come), so the engine holds it
    * in join state and emits the null-padded row only once the
    * watermark proves the match window closed. Same event-time range
    * condition + both-sides watermark as the inner form — that bound
    * is what makes the state (and the null-emission decision) finite. */
  def purchasesWithRecentViewsOuter(purchases: DataFrame, views: DataFrame,
      horizon: String = "1 hour", delay: String = "10 minutes"): DataFrame = {
    val p = purchases.withWatermark("ts", delay)
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"))
    val v = views.withWatermark("ts", delay)
      .select(col("user_id").as("v_user_id"), col("event_id").as("view_id"),
        col("ts").as("view_ts"))
    p.join(v,
      col("user_id") === col("v_user_id") &&
        col("view_ts") <= col("purchase_ts") &&
        col("view_ts") >= col("purchase_ts") - expr(s"INTERVAL $horizon"),
      "left_outer")
      .select("user_id", "purchase_id", "purchase_ts", "view_id", "view_ts")
  }

  /** T7+ production sink pattern: `foreachBatch` upsert into a parquet
    * "table" — each micro-batch merges keep-latest-per-key into the
    * current snapshot (read → full-outer-style coalesce via the q70
    * merge shape → rewrite). The batch function sees a BATCH DataFrame,
    * so the whole relational surface (joins, windows) applies to
    * streaming output — the reason foreachBatch is the workhorse sink
    * for warehouse merges. Rewrite-the-snapshot is the portable
    * no-table-format strategy; a real deployment swaps the body for a
    * MERGE INTO against a transactional table, same batch contract.
    * Micro-batch = atomic replace here: the snapshot is re-read each
    * batch, so the merge is idempotent per (key, ts, id) ordering.
    *
    * Durability discipline (two-rename generation swap): a bare
    * delete-then-rename has a crash window in which NEITHER directory
    * holds the merged state — a driver death between the two steps
    * would make the retried batch rebuild from empty, silently. Instead
    * the swap is snapshot→`_old`, `_tmp`→snapshot, drop `_old`; at
    * every crash point either the snapshot or `_old` holds the last
    * complete generation, and the read probe falls back to `_old`.
    * Hadoop FileSystem reports most rename/delete failures by RETURNING
    * FALSE, not throwing — every step is require()d so a failed swap
    * fails the micro-batch and the checkpoint retries it. Scratch and
    * `_old` paths are built as SIBLINGS of the normalized Path (a
    * trailing slash on snapshotDir must not nest them inside the
    * snapshot, where the recursive delete would eat them). The FS is
    * derived FROM THE PATH's scheme, never default-FS
    * `FileSystem.get` — on a cluster the snapshot lives on
    * s3a:// or hdfs://, and a default-FS probe throws "Wrong FS". */
  def upsertSink(events: DataFrame, snapshotDir: String,
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery = {
    import org.apache.spark.sql.expressions.Window
    events.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      val spark = batch.sparkSession
      val incoming = batch.select("user_id", "ts", "event_id", "value")
      val snapPath = new org.apache.hadoop.fs.Path(snapshotDir)
      val fs = snapPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val tmpPath =
        new org.apache.hadoop.fs.Path(snapPath.getParent, snapPath.getName + "_tmp")
      val oldPath =
        new org.apache.hadoop.fs.Path(snapPath.getParent, snapPath.getName + "_old")
      // read the live snapshot; fall back to the _old generation if a
      // crash landed between the two renames below. A transient read
      // failure must propagate and retry the micro-batch, never
      // silently discard the merged state.
      val src =
        if (fs.exists(snapPath)) Some(snapPath)
        else if (fs.exists(oldPath)) Some(oldPath)
        else None
      val current = src match {
        case Some(p) => spark.read.schema(incoming.schema).parquet(p.toString)
        case None => spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], incoming.schema)
      }
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").desc, col("event_id").desc)
      val merged = current.unionByName(incoming)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1).drop("rn")
      // materialize to scratch first: the snapshot read above and the
      // overwrite below cannot safely overlap in one FS path
      merged.write.mode("overwrite").parquet(tmpPath.toString)
      // generation swap; every step checked (rename into an EXISTING
      // destination dir "succeeds" by nesting, so stale dirs must be
      // cleared first and the clears must be known to have worked)
      if (fs.exists(oldPath) && fs.exists(snapPath))
        require(fs.delete(oldPath, true),
          s"could not clear stale $oldPath; failing the micro-batch to retry")
      if (fs.exists(snapPath))
        require(fs.rename(snapPath, oldPath),
          s"rename $snapPath -> $oldPath failed; failing the micro-batch to retry")
      require(fs.rename(tmpPath, snapPath),
        s"rename $tmpPath -> $snapPath failed; failing the micro-batch to retry")
      // best-effort: a surviving _old is reclaimed by the next batch
      fs.delete(oldPath, true)
      ()
    }.option("checkpointLocation", checkpointDir).start()
  }

  /** Incremental-ingest sink: append-only, exactly one row per key ever
    * — the crawl-drop pattern ("which of these documents has the corpus
    * never seen?") as a streaming sink. Each micro-batch dedups within
    * itself, routes against a bloom filter of the current corpus keys
    * (definitely-new rows skip the join; bloom has no false negatives),
    * anti-join-verifies the maybe-dups, and APPENDS only the genuinely
    * new rows — the snapshot is never rewritten, so corpus size doesn't
    * bound the batch cost ceiling the way the upsert sink's rewrite
    * does. The filter is rebuilt per batch here for simplicity;
    * production persists a mergeable sketch and unions in each batch's
    * keys — exactness is unaffected either way (the anti-join decides,
    * the bloom only routes). */
  def bloomIngestSink(events: DataFrame, keyCol: String, snapshotDir: String,
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    events.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      val spark = batch.sparkSession
      // path-derived FS (never default-FS FileSystem.get): the corpus
      // snapshot lives wherever the URI says, e.g. s3a://
      val snapPath = new org.apache.hadoop.fs.Path(snapshotDir)
      val fs = snapPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val exists = fs.exists(snapPath)
      val distinctBatch = batch.dropDuplicates(keyCol)
      val fresh =
        if (!exists) distinctBatch
        else {
          val corpus = spark.read.schema(batch.schema).parquet(snapshotDir)
          val bloom = graft.ops.BloomDedup.buildFilter(
            corpus, keyCol, expectedItems = corpus.count())
          graft.ops.BloomDedup.newAgainst(distinctBatch, corpus, keyCol, bloom)
        }
      fresh.write.mode("append").parquet(snapshotDir)
      ()
    }.option("checkpointLocation", checkpointDir).start()

  /** Exact microseconds since epoch. `Timestamp.getTime` floors to
    * milliseconds, so two events in the same millisecond but different
    * microseconds would compare equal under it — the nanos field holds
    * the sub-second truth. Every in-batch sort and µs computation below
    * goes through this so streaming folds are bit-deterministic with
    * the batch (ts, event_id) order at full µs precision. */
  private def tsMicros(t: Timestamp): Long =
    math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos.toLong / 1000L

  /** One micro-batch step of the funnel state machine — shared by both
    * arbitrary-state APIs below so their semantics can never drift.
    * Events within a batch are not ordered: signups fold in first so a
    * same-batch signup+purchase pair converts. */
  private def advanceFunnel(userId: Long, prev: FunnelState,
      evs: Seq[Ev]): (FunnelState, Seq[Conversion]) = {
    var st = prev
    val out = scala.collection.mutable.ListBuffer.empty[Conversion]
    val (signups, rest) = evs.partition(_.event_type == "signup")
    signups.foreach { e =>
      val us = tsMicros(e.ts)
      if (us < st.signupUs) st = st.copy(signupUs = us)
    }
    rest.sortBy(e => (tsMicros(e.ts), e.event_id)).foreach { e =>
      if (!st.converted && e.event_type == "purchase" &&
          st.signupUs != Long.MaxValue && tsMicros(e.ts) >= st.signupUs) {
        st = st.copy(converted = true)
        out += Conversion(userId, new Timestamp(st.signupUs / 1000), e.ts,
          (tsMicros(e.ts) - st.signupUs) / 1000000)
      }
    }
    (st, out.toSeq)
  }

  /** T6: stateful signup→purchase funnel via flatMapGroupsWithState.
    * State per user is two fields (first signup µs + converted flag);
    * emits exactly one Conversion when the first at-or-after purchase
    * arrives. NoTimeout keeps the demo deterministic; production would
    * set an event-time timeout to bound state. */
  def funnel(events: Dataset[Ev]): Dataset[Conversion] = {
    implicit val stateEnc = Encoders.product[FunnelState]
    implicit val outEnc = Encoders.product[Conversion]
    events.groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState[FunnelState, Conversion](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (userId: Long, evs: Iterator[Ev], state: GroupState[FunnelState]) =>
          val prev = state.getOption
            .getOrElse(FunnelState(Long.MaxValue, converted = false))
          val (st, out) = advanceFunnel(userId, prev, evs.toSeq)
          state.update(st)
          out.iterator
      }
  }

  /** T6 on the Spark 4 arbitrary-state API: same funnel as [[funnel]]
    * but as a `StatefulProcessor` + `transformWithState`. The typed
    * `ValueState` handle lives in the state-store layer (requires the
    * RocksDB provider — multi-column-family state); production state
    * then gets TTL, timers, and schema evolution for free. */
  class FunnelProcessor extends StatefulProcessor[Long, Ev, Conversion] {
    @transient private var st: ValueState[FunnelState] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[FunnelState]("funnel",
        Encoders.product[FunnelState], TTLConfig.NONE)
    override def handleInputRows(userId: Long, rows: Iterator[Ev],
        timerValues: TimerValues): Iterator[Conversion] = {
      val prev = if (st.exists()) st.get()
        else FunnelState(Long.MaxValue, converted = false)
      val (s, out) = advanceFunnel(userId, prev, rows.toSeq)
      st.update(s)
      out.iterator
    }
  }

  /** [[funnel]] through `transformWithState`. */
  def funnelTws(events: Dataset[Ev]): Dataset[Conversion] = {
    implicit val outEnc = Encoders.product[Conversion]
    events.groupByKey(_.user_id)(Encoders.scalaLong)
      .transformWithState(new FunnelProcessor, TimeMode.None(), OutputMode.Append())
  }

  /** The q115 EWMA recurrence in streaming form — exactly the "one
    * double of state per key" its batch scaladoc promises: per key,
    * e ← α·v + (1−α)·e over events in (ts, event_id) order. Events are
    * sorted WITHIN each micro-batch before folding (iterator order is
    * not a contract), so a stream delivering the same events in the
    * same batches is bit-deterministic with the batch fold; cross-batch
    * ordering is the source's responsibility (watermark + sorted
    * replay), as with any streaming recurrence. */
  class EwmaProcessor(alpha: Double) extends StatefulProcessor[Long, Ev, EwmaPoint] {
    @transient private var st: ValueState[Double] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[Double]("ewma",
        Encoders.scalaDouble, TTLConfig.NONE)
    override def handleInputRows(userId: Long, rows: Iterator[Ev],
        timerValues: TimerValues): Iterator[EwmaPoint] = {
      var e = if (st.exists()) Some(st.get()) else None
      val out = rows.toSeq.sortBy(r => (tsMicros(r.ts), r.event_id)).map { r =>
        val next = e match {
          case None => r.value
          case Some(prev) => alpha * r.value + (1.0 - alpha) * prev
        }
        e = Some(next)
        EwmaPoint(userId, r.ts, r.value, next)
      }
      e.foreach(st.update)
      out.iterator
    }
  }

  /** Per-key per-event-type running counts through `transformWithState`
    * MAP state — the point-update primitive the other processors don't
    * exercise: a `MapState[String, Long]` holds one counter per
    * (user, event_type), and a micro-batch touches ONLY the entries its
    * events hit (a `ValueState[Map[...]]` would deserialize + rewrite
    * the whole map per batch — the difference matters when per-key
    * sub-state is wide). Emits one row per TOUCHED type per batch with
    * the updated counter and the key's current distinct-type count,
    * sorted by type for determinism. */
  class TypeCountProcessor
      extends StatefulProcessor[Long, Ev, TypeCount] {
    @transient private var st: MapState[String, Long] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getMapState[String, Long]("type_counts",
        Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)
    override def handleInputRows(userId: Long, rows: Iterator[Ev],
        timerValues: TimerValues): Iterator[TypeCount] = {
      val batch = rows.toSeq.groupBy(_.event_type)
        .view.mapValues(_.size.toLong).toMap
      batch.foreach { case (et, n) =>
        val cur = if (st.containsKey(et)) st.getValue(et) else 0L
        st.updateValue(et, cur + n)
      }
      val nTypes = st.keys().size.toLong
      batch.keys.toSeq.sorted.iterator
        .map(et => TypeCount(userId, et, st.getValue(et), nTypes))
    }
  }

  /** Per-key distinct-type counters via [[TypeCountProcessor]]. */
  def typeCountsTws(events: Dataset[Ev]): Dataset[TypeCount] = {
    implicit val outEnc = Encoders.product[TypeCount]
    events.groupByKey(_.user_id)(Encoders.scalaLong)
      .transformWithState(new TypeCountProcessor, TimeMode.None(),
        OutputMode.Append())
  }

  /** q357's mergeable equi-width histogram as a `StatefulProcessor` —
    * the last member of the streaming-sketch symmetry (KMV, t-digest
    * and count-min already stream; r17 verdict item #7): per key a
    * `ValueState` holds the `nb`-long bin census and each micro-batch
    * ADDS its bin counts — addition IS the merge, exactly the
    * mergeable-summary property q357's quarterly rollup exploits.
    * Emits the merged census plus the q357 covering-bin interpolated
    * P50 after every batch; bin counts are exact integers independent
    * of batch boundaries, so the final streamed census must equal a
    * batch census over the same rows element-for-element
    * (StreamingSpec asserts it). State is a fixed `nb` longs per key —
    * bounded at any event rate; bounds are caller-fixed because a
    * streaming histogram cannot scan for min/max. */
  class HistogramProcessor(lo: Long, hi: Long, nb: Int)
      extends StatefulProcessor[Long, Ev, HistCensus] {
    @transient private var st: ValueState[HistState] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[HistState]("hist",
        Encoders.product[HistState], TTLConfig.NONE)
    override def handleInputRows(userId: Long, rows: Iterator[Ev],
        timerValues: TimerValues): Iterator[HistCensus] = {
      val bins = (if (st.exists()) st.get().bins
        else Seq.fill(nb)(0L)).toArray
      rows.foreach { r =>
        val b = math.min(nb - 1L,
          math.max(0L, (r.value.toLong - lo) * nb / (hi - lo + 1))).toInt
        bins(b) += 1L
      }
      st.update(HistState(bins.toSeq))
      val n = bins.sum
      // q357's covering-bin linear interpolation at p = 0.5
      val t = 0.5 * n
      val w = (hi - lo + 1).toDouble / nb
      var (cum, i, p50) = (0L, 0, lo.toDouble)
      while (i < nb) {
        if (cum < t && t <= cum + bins(i))
          p50 = lo + (i + (t - cum) / bins(i)) * w
        cum += bins(i); i += 1
      }
      Iterator.single(HistCensus(userId, n, bins.toSeq, p50))
    }
  }

  /** Per-key streaming histogram census via [[HistogramProcessor]]. */
  def histogramTws(events: Dataset[Ev], lo: Long = 1L, hi: Long = 400L,
      nb: Int = 32): Dataset[HistCensus] = {
    implicit val outEnc = Encoders.product[HistCensus]
    events.groupByKey(_.user_id)(Encoders.scalaLong)
      .transformWithState(new HistogramProcessor(lo, hi, nb),
        TimeMode.None(), OutputMode.Append())
  }

  /** Per-key running event counter whose state EXPIRES after `ttl` of
    * key inactivity — the §2.9 state-TTL surface: TTLConfig hands
    * expiry to the state store (RocksDB column-family native), so idle
    * keys cost nothing to reap — no timers, no scan — which is what
    * bounds state size on a 100 TB stream with an unbounded key space
    * (the alternative, per-key event-time timers, is the
    * SessionProcessor pattern and costs a timer entry per key).
    *
    * Semantics under TTL: a key seen again within `ttl` continues its
    * count; a key idle past `ttl` has its state reaped and restarts
    * from zero. `pureTtlCount` below is the same fold in plain Scala —
    * the batch-parity form the spec checks the processor against. */
  class TtlCountProcessor(ttl: java.time.Duration)
      extends StatefulProcessor[Long, Ev, TtlCount] {
    @transient private var st: ValueState[Long] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[Long]("n", Encoders.scalaLong,
        TTLConfig(ttl))
    override def handleInputRows(key: Long, rows: Iterator[Ev],
        timerValues: TimerValues): Iterator[TtlCount] = {
      val prev = if (st.exists()) st.get() else 0L // expired ⇒ 0
      val n = prev + rows.size
      st.update(n)
      Iterator.single(TtlCount(key, n))
    }
  }

  /** [[TtlCountProcessor]] through `transformWithState` (TTL requires
    * processing-time mode — expiry is measured from the last update's
    * batch timestamp). */
  def ttlCountsTws(events: Dataset[Ev],
      ttl: java.time.Duration): Dataset[TtlCount] = {
    implicit val outEnc = Encoders.product[TtlCount]
    events.groupByKey(_.user_id)(Encoders.scalaLong)
      .transformWithState(new TtlCountProcessor(ttl),
        TimeMode.ProcessingTime(), OutputMode.Append())
  }

  /** Batch-parity reference for the TTL fold: given per-batch counts
    * for one key and the batch processing times, the emitted counter
    * per batch — state carries forward iff the gap since the LAST
    * UPDATE is ≤ ttl (TTL is measured from update time, not read
    * time). */
  def pureTtlCount(batches: Seq[(Long, Long)], ttlMs: Long): Seq[Long] = {
    var last = Long.MinValue
    var n = 0L
    batches.map { case (tMs, cnt) =>
      if (last != Long.MinValue && tMs - last > ttlMs) n = 0L
      n += cnt
      last = tMs
      n
    }
  }

  /** Per-key streaming EWMA through `transformWithState`. */
  def ewmaTws(events: Dataset[Ev], alpha: Double): Dataset[EwmaPoint] = {
    implicit val outEnc = Encoders.product[EwmaPoint]
    events.groupByKey(_.user_id)(Encoders.scalaLong)
      .transformWithState(new EwmaProcessor(alpha), TimeMode.None(),
        OutputMode.Append())
  }

  /** Exact-µs epoch back to a µs-precision Timestamp. */
  private def usToTs(us: Long): Timestamp = {
    val t = new Timestamp(math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos((math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }

  /** Event-time SESSION aggregation with TIMER-driven, WATERMARK-GATED
    * emission — the capability `session_window` cannot give: a session
    * is emitted the moment the WATERMARK proves it over (last event +
    * gap has passed), per key, with arbitrary per-session state, not
    * only at the next aggregation flush.
    *
    * State is the full set of candidate sessions for the key, open or
    * gap-separated alike. An incoming event merges into every session
    * whose span it touches (within `gap` of [start, last]) — so an
    * allowed-late event can EXTEND a session that a newer event had
    * already gap-separated, PREPEND to one (startUs moves down), or
    * BRIDGE two sessions into one. No session is emitted from the data
    * path at all: emission happens only in `handleExpiredTimer`, and
    * only for sessions whose close horizon (last + gap) the watermark
    * has actually passed — at which point the watermark contract
    * guarantees no event that could still touch the session will be
    * admitted. With delay = 0 and in-order data this degenerates to the
    * classic one-open-session fold (q59's batch gaps-and-islands at
    * exact-µs precision, one batch later); with a positive lateness
    * bound it stays correct where an emit-on-gap design silently
    * splits sessions.
    *
    * One pending timer per key at the MINIMUM horizon over stored
    * sessions (old timers deleted before re-arming), so state-store
    * timer volume is O(active keys); sessions the fired watermark does
    * not yet prove closed stay in state and the timer re-arms at their
    * minimum horizon. */
  class SessionProcessor(gapUs: Long)
      extends StatefulProcessor[Long, Ev, SessionOut] {
    @transient private var st: ListState[SessionState] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getListState[SessionState]("sessions",
        Encoders.product[SessionState], TTLConfig.NONE)
    /** First watermark ms value that proves the session over. */
    private def horizonMs(s: SessionState): Long =
      math.floorDiv(s.lastUs + gapUs, 1000L) + 1L
    private def rearm(sessions: Seq[SessionState]): Unit = {
      getHandle.listTimers().foreach(getHandle.deleteTimer)
      if (sessions.nonEmpty) getHandle.registerTimer(sessions.map(horizonMs).min)
    }
    override def handleInputRows(userId: Long, rows: Iterator[Ev],
        timerValues: TimerValues): Iterator[SessionOut] = {
      val sessions = scala.collection.mutable.ArrayBuffer.empty[SessionState]
      sessions ++= st.get()
      rows.toSeq.sortBy(r => (tsMicros(r.ts), r.event_id)).foreach { r =>
        val us = tsMicros(r.ts)
        val (touch, rest) = sessions.partition(s =>
          us >= s.startUs - gapUs && us <= s.lastUs + gapUs)
        val merged =
          if (touch.isEmpty) SessionState(us, us, 1L)
          else SessionState(math.min(us, touch.map(_.startUs).min),
            math.max(us, touch.map(_.lastUs).max), touch.map(_.n).sum + 1L)
        sessions.clear(); sessions ++= rest; sessions += merged
      }
      st.clear()
      if (sessions.nonEmpty) st.put(sessions.toArray)
      rearm(sessions.toSeq)
      Iterator.empty
    }
    override def handleExpiredTimer(userId: Long, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[SessionOut] = {
      val wmMs = timerValues.getCurrentWatermarkInMs()
      val (closed, open) = st.get().toSeq.partition(s => horizonMs(s) <= wmMs)
      st.clear()
      if (open.nonEmpty) st.put(open.toArray)
      rearm(open)
      closed.sortBy(s => (s.startUs, s.lastUs)).iterator
        .map(s => SessionOut(userId, usToTs(s.startUs), usToTs(s.lastUs), s.n))
    }
  }

  /** Session aggregation through `transformWithState` with event-time
    * timers. `delayThreshold` is the watermark lateness bound on `ts`;
    * sessions close `gap` after their last event (watermark time). */
  def sessionsTws(events: Dataset[Ev], gapUs: Long,
      delayThreshold: String): Dataset[SessionOut] = {
    implicit val outEnc = Encoders.product[SessionOut]
    events.withWatermark("ts", delayThreshold)
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .transformWithState(new SessionProcessor(gapUs), TimeMode.EventTime(),
        OutputMode.Append())
  }
}
