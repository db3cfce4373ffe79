package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.functions._

import graft.streaming.{Ev, StreamOps}

/** Structured Streaming semantics T1, T4–T7, J12 (SURVEY.md §2.9, §5.4):
  * MemoryStream micro-batches driven explicitly so watermark advancement
  * is deterministic. */
class StreamingSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  private def newStream(): MemoryStream[Ev] = {
    implicit val sqlCtx = spark.sqlContext
    implicit val enc = org.apache.spark.sql.Encoders.product[Ev]
    MemoryStream[Ev]
  }

  test("T1+T4 tumbling window with watermark drops late rows (append mode)") {
    val in = newStream()
    val q = StreamOps.tumblingCounts(in.toDF(), "1 hour", "10 minutes")
      .writeStream.format("memory").queryName("t1_agg")
      .outputMode("append").start()
    try {
      // batch 1: two rows in [10:00,11:00) + one at 12:30 → watermark 12:20
      in.addData(
        Ev(1, ts("2024-01-01 10:05:00"), 1, "view", 1.0),
        Ev(2, ts("2024-01-01 10:10:00"), 1, "view", 1.0),
        Ev(3, ts("2024-01-01 12:30:00"), 2, "view", 1.0))
      q.processAllAvailable()
      // batch 2: late row at 10:30 (< watermark → dropped) + 14:00 row;
      // [10:00,11:00) is now emitted WITHOUT the late row
      in.addData(
        Ev(4, ts("2024-01-01 10:30:00"), 1, "view", 1.0),
        Ev(5, ts("2024-01-01 14:00:00"), 2, "view", 1.0))
      q.processAllAvailable()
      // batch 3: push watermark far ahead so 12:00 + 14:00 windows emit too
      in.addData(Ev(6, ts("2024-01-01 18:00:00"), 2, "view", 1.0))
      q.processAllAvailable()

      val out = spark.table("t1_agg")
        .select("bucket_start", "n").collect()
        .map(r => r.getTimestamp(0).toString -> r.getLong(1)).toMap
      assert(out("2024-01-01 10:00:00.0") == 2, "late row must not be counted")
      assert(out("2024-01-01 12:00:00.0") == 1)
      assert(out("2024-01-01 14:00:00.0") == 1)
    } finally q.stop()
  }

  test("T2 sliding windows emit one bucket per overlapping slide (append mode)") {
    val in = newStream()
    val q = StreamOps.slidingCounts(in.toDF(), "1 hour", "15 minutes", "10 minutes")
      .writeStream.format("memory").queryName("t2_sliding")
      .outputMode("append").start()
    try {
      // one event at 10:05 lands in the 4 sliding buckets starting
      // 09:15, 09:30, 09:45, 10:00
      in.addData(Ev(1, ts("2024-01-01 10:05:00"), 1, "view", 1.0))
      q.processAllAvailable()
      // advance the watermark past every bucket end (11:00) → all 4 emit
      in.addData(Ev(2, ts("2024-01-01 14:00:00"), 2, "view", 1.0))
      q.processAllAvailable()
      val out = spark.table("t2_sliding").collect()
        .map(r => r.getTimestamp(0).toString -> r.getLong(1)).toMap
      val expected = Seq("09:15", "09:30", "09:45", "10:00")
        .map(m => s"2024-01-01 $m:00.0")
      assert(expected.forall(out.get(_).contains(1L)),
        s"each overlapping bucket must count the event once: $out")
      assert(out.size == expected.size,
        s"the 14:00 row's buckets are still open and must not emit: $out")
    } finally q.stop()
  }

  test("T5 dropDuplicatesWithinWatermark keeps one row per event_id") {
    val in = newStream()
    val q = StreamOps.dedupByEventId(in.toDF(), "10 minutes")
      .writeStream.format("memory").queryName("t5_dedup")
      .outputMode("append").start()
    try {
      in.addData(
        Ev(1, ts("2024-01-01 10:00:00"), 1, "view", 1.0),
        Ev(1, ts("2024-01-01 10:00:30"), 1, "view", 1.0)) // same-batch dup
      q.processAllAvailable()
      in.addData(Ev(1, ts("2024-01-01 10:01:00"), 1, "view", 1.0)) // cross-batch dup
      q.processAllAvailable()
      val n = spark.table("t5_dedup").filter(col("event_id") === 1).count()
      assert(n == 1, s"expected 1 surviving row for event_id=1, got $n")
    } finally q.stop()
  }

  test("J12 stream-static join enriches events with a broadcast dimension") {
    import spark.implicits._
    val in = newStream()
    val dim = Seq((1L, "BUILDING"), (2L, "MACHINERY"))
      .toDF("c_custkey", "c_mktsegment")
    val q = StreamOps.enrichWithCustomers(in.toDF(), dim)
      .select("event_id", "user_id", "c_mktsegment")
      .writeStream.format("memory").queryName("j12_enrich")
      .outputMode("append").start()
    try {
      in.addData(
        Ev(1, ts("2024-01-01 10:00:00"), 1, "view", 1.0),
        Ev(2, ts("2024-01-01 10:01:00"), 9, "view", 1.0)) // no dim match
      q.processAllAvailable()
      val rows = spark.table("j12_enrich").collect()
        .map(r => r.getLong(0) -> Option(r.getString(2))).toMap
      assert(rows(1L).contains("BUILDING"))
      assert(rows(2L).isEmpty, "unmatched user keeps null segment (left join)")
    } finally q.stop()
  }

  test("stream-stream interval join matches views to purchases within the horizon") {
    val vIn = newStream()
    val pIn = newStream()
    val q = StreamOps.purchasesWithRecentViews(
        pIn.toDF().filter(col("event_type") === "purchase"),
        vIn.toDF().filter(col("event_type") === "view"),
        horizon = "1 hour", delay = "10 minutes")
      .writeStream.format("memory").queryName("ss_join")
      .outputMode("append").start()
    try {
      vIn.addData(
        Ev(10, ts("2024-01-01 10:00:00"), 1, "view", 1.0),  // in horizon
        Ev(11, ts("2024-01-01 08:00:00"), 1, "view", 1.0),  // too old
        Ev(12, ts("2024-01-01 10:20:00"), 2, "view", 1.0))  // other user
      pIn.addData(Ev(20, ts("2024-01-01 10:30:00"), 1, "purchase", 9.0))
      q.processAllAvailable()
      val rows = spark.table("ss_join")
        .select("purchase_id", "view_id").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toSet
      assert(rows == Set(20L -> 10L),
        s"only the in-horizon same-user view may join: $rows")
    } finally q.stop()
  }

  test("outer stream-stream join null-pads unmatched purchases only after the watermark closes the window") {
    val vIn = newStream()
    val pIn = newStream()
    val q = StreamOps.purchasesWithRecentViewsOuter(
        pIn.toDF().filter(col("event_type") === "purchase"),
        vIn.toDF().filter(col("event_type") === "view"),
        horizon = "1 hour", delay = "10 minutes")
      .writeStream.format("memory").queryName("ss_join_outer")
      .outputMode("append").start()
    try {
      vIn.addData(Ev(10, ts("2024-01-01 10:00:00"), 1, "view", 1.0))
      pIn.addData(
        Ev(20, ts("2024-01-01 10:30:00"), 1, "purchase", 9.0), // matched
        Ev(21, ts("2024-01-01 10:30:00"), 2, "purchase", 5.0)) // no view yet
      q.processAllAvailable()
      val matched = spark.table("ss_join_outer")
        .select("purchase_id", "view_id").collect()
        .map(r => r.getLong(0) -> Option(r.get(1))).toMap
      assert(matched.get(20L).flatten.contains(10L))
      assert(!matched.contains(21L),
        "an unmatched purchase must NOT emit while a view could still arrive")
      // advance both watermarks far past purchase 21's match window —
      // the engine can now prove no view will pair with it
      vIn.addData(Ev(30, ts("2024-01-01 13:00:00"), 9, "view", 1.0))
      pIn.addData(Ev(31, ts("2024-01-01 13:00:00"), 9, "purchase", 1.0))
      q.processAllAvailable()
      val fin = spark.table("ss_join_outer")
        .select("purchase_id", "view_id").collect()
        .map(r => r.getLong(0) -> Option(r.get(1))).toMap
      assert(fin.get(21L).exists(_.isEmpty),
        s"the unmatched purchase must surface null-padded once provably final: $fin")
    } finally q.stop()
  }

  test("T6 via transformWithState (Spark 4 API) matches the funnel semantics") {
    import spark.implicits._
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val in = newStream()
    val q = StreamOps.funnelTws(in.toDS())
      .writeStream.format("memory").queryName("t6_tws")
      .outputMode("append").start()
    try {
      in.addData(
        Ev(1, ts("2024-01-01 09:00:00"), 1, "purchase", 5.0), // pre-signup
        Ev(2, ts("2024-01-01 10:00:00"), 1, "signup", 0.0))
      q.processAllAvailable()
      in.addData(
        Ev(4, ts("2024-01-01 11:00:00"), 1, "purchase", 9.0), // converts
        Ev(5, ts("2024-01-01 12:00:00"), 1, "purchase", 2.0)) // ignored
      q.processAllAvailable()
      val rows = spark.table("t6_tws").collect()
      assert(rows.length == 1)
      assert(rows.head.getLong(0) == 1L && rows.head.getLong(3) == 3600L)
    } finally {
      q.stop()
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("T6 stateful funnel emits one conversion per user, after signup only") {
    import spark.implicits._
    val in = newStream()
    val q = StreamOps.funnel(in.toDS())
      .writeStream.format("memory").queryName("t6_funnel")
      .outputMode("append").start()
    try {
      in.addData(
        Ev(1, ts("2024-01-01 09:00:00"), 1, "purchase", 5.0), // pre-signup: no conversion
        Ev(2, ts("2024-01-01 10:00:00"), 1, "signup", 0.0),
        Ev(3, ts("2024-01-01 10:30:00"), 2, "view", 1.0))
      q.processAllAvailable()
      in.addData(
        Ev(4, ts("2024-01-01 11:00:00"), 1, "purchase", 9.0), // converts (3600 s)
        Ev(5, ts("2024-01-01 12:00:00"), 1, "purchase", 2.0)) // second: ignored
      q.processAllAvailable()
      val out = spark.table("t6_funnel").as[graft.streaming.Conversion].collect()
      assert(out.length == 1)
      assert(out.head.user_id == 1 && out.head.conv_sec == 3600)
    } finally q.stop()
  }

  test("T7 parquet sink with AvailableNow writes exactly the pushed rows") {
    val in = newStream()
    val dir = Files.createTempDirectory("t7_sink").toString
    in.addData(
      Ev(1, ts("2024-01-01 10:00:00"), 1, "view", 1.0),
      Ev(2, ts("2024-01-01 10:05:00"), 2, "click", 2.0))
    val q = in.toDF().writeStream.format("parquet")
      .option("path", s"$dir/data").option("checkpointLocation", s"$dir/ckpt")
      .trigger(Trigger.AvailableNow()).start()
    try q.awaitTermination(60000) finally q.stop()
    assert(spark.read.parquet(s"$dir/data").count() == 2)
  }

  test("foreachBatch upsert sink keeps latest value per user across micro-batches") {
    val in = newStream()
    val base = Files.createTempDirectory("t7_upsert").toString
    val q = StreamOps.upsertSink(in.toDF(), s"$base/snap", s"$base/ckpt")
    try {
      in.addData(
        Ev(1, ts("2024-01-01 10:00:00"), 1, "purchase", 5.0),
        Ev(2, ts("2024-01-01 10:05:00"), 2, "purchase", 7.0))
      q.processAllAvailable()
      in.addData(
        Ev(3, ts("2024-01-01 11:00:00"), 1, "purchase", 9.0),  // updates user 1
        Ev(4, ts("2024-01-01 09:00:00"), 2, "purchase", 3.0))  // older: ignored
      q.processAllAvailable()
      val snap = spark.read.parquet(s"$base/snap")
        .select("user_id", "value").collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(snap == Map(1L -> 9.0, 2L -> 7.0),
        s"latest-per-user must win across batches: $snap")
    } finally q.stop()
  }

  test("bloom-routed ingest sink appends exactly one row per key across micro-batches") {
    val in = newStream()
    val base = Files.createTempDirectory("bloom_ingest").toString
    val q = StreamOps.bloomIngestSink(in.toDF(), "event_id",
      s"$base/snap", s"$base/ckpt")
    try {
      in.addData(
        Ev(1, ts("2024-01-01 10:00:00"), 1, "doc", 1.0),
        Ev(2, ts("2024-01-01 10:01:00"), 1, "doc", 2.0),
        Ev(3, ts("2024-01-01 10:02:00"), 2, "doc", 3.0))
      q.processAllAvailable()
      in.addData(
        Ev(2, ts("2024-01-01 11:00:00"), 1, "doc", 2.5), // dup: dropped
        Ev(3, ts("2024-01-01 11:01:00"), 2, "doc", 3.5), // dup: dropped
        Ev(4, ts("2024-01-01 11:02:00"), 3, "doc", 4.0))
      q.processAllAvailable()
      in.addData(
        Ev(1, ts("2024-01-01 12:00:00"), 1, "doc", 1.5), // dup: dropped
        Ev(5, ts("2024-01-01 12:01:00"), 3, "doc", 5.0),
        Ev(5, ts("2024-01-01 12:01:30"), 3, "doc", 5.5)) // within-batch dup
      q.processAllAvailable()
      val snap = spark.read.parquet(s"$base/snap")
      assert(snap.count() == 5, "exactly one row per distinct key ever seen")
      val firstSeen = snap.select("event_id", "value").collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(firstSeen.keySet == Set(1L, 2L, 3L, 4L, 5L))
      assert(firstSeen(1L) == 1.0 && firstSeen(2L) == 2.0 && firstSeen(4L) == 4.0,
        "the batch that first carried a key must be the one kept")
    } finally q.stop()
  }

  test("upsert sink works with a fully-qualified file:/// snapshot URI") {
    // pins the ADVICE r3/r4 fix: the sink must derive its FileSystem
    // from the path's scheme (Path.getFileSystem), not the default FS —
    // a qualified URI through the old FileSystem.get(conf) probes the
    // wrong store (or throws "Wrong FS") on any cluster where the
    // snapshot is not on the default filesystem
    val in = newStream()
    val base = Files.createTempDirectory("t7_upsert_uri").toUri.toString
      .stripSuffix("/") // file:///tmp/... — scheme-qualified
    assert(base.startsWith("file:///"))
    val q = StreamOps.upsertSink(in.toDF(), s"$base/snap", s"$base/ckpt")
    try {
      in.addData(Ev(1, ts("2024-01-01 10:00:00"), 1, "purchase", 5.0))
      q.processAllAvailable()
      in.addData(Ev(2, ts("2024-01-01 11:00:00"), 1, "purchase", 9.0))
      q.processAllAvailable()
      val snap = spark.read.parquet(s"$base/snap")
        .select("user_id", "value").collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(snap == Map(1L -> 9.0), s"qualified-URI upsert broken: $snap")
    } finally q.stop()
  }

  test("upsert sink tolerates a trailing slash on the snapshot dir") {
    // scratch/_old paths are siblings of the NORMALIZED path: with a
    // raw string concat a trailing slash would nest _tmp inside the
    // snapshot, where the swap's recursive delete eats the fresh data
    val in = newStream()
    val base = Files.createTempDirectory("t7_upsert_slash").toString
    val q = StreamOps.upsertSink(in.toDF(), s"$base/snap/", s"$base/ckpt")
    try {
      in.addData(Ev(1, ts("2024-01-01 10:00:00"), 1, "purchase", 5.0))
      q.processAllAvailable()
      in.addData(Ev(2, ts("2024-01-01 11:00:00"), 1, "purchase", 9.0))
      q.processAllAvailable()
      val snap = spark.read.parquet(s"$base/snap")
        .select("user_id", "value").collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(snap == Map(1L -> 9.0), s"trailing-slash upsert broken: $snap")
    } finally q.stop()
  }

  test("upsert sink recovers merged state from the _old generation after a crash window") {
    // simulate a driver death between the two swap renames: the live
    // snapshot is gone but _old holds the last complete generation —
    // the next batch must merge on top of it, not rebuild from empty
    val in = newStream()
    val base = Files.createTempDirectory("t7_upsert_crash").toString
    val q1 = StreamOps.upsertSink(in.toDF(), s"$base/snap", s"$base/ckpt1")
    try {
      in.addData(
        Ev(1, ts("2024-01-01 10:00:00"), 1, "purchase", 5.0),
        Ev(2, ts("2024-01-01 10:05:00"), 2, "purchase", 7.0))
      q1.processAllAvailable()
    } finally q1.stop()
    // crash point: snapshot renamed away, replacement never landed
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(new org.apache.hadoop.fs.Path(s"$base/snap"),
      new org.apache.hadoop.fs.Path(s"$base/snap_old")))
    val in2 = newStream()
    val q2 = StreamOps.upsertSink(in2.toDF(), s"$base/snap", s"$base/ckpt2")
    try {
      in2.addData(Ev(3, ts("2024-01-01 11:00:00"), 1, "purchase", 9.0))
      q2.processAllAvailable()
      val snap = spark.read.parquet(s"$base/snap")
        .select("user_id", "value").collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(snap == Map(1L -> 9.0, 2L -> 7.0),
        s"state from the _old generation must survive the crash window: $snap")
      assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$base/snap_old")),
        "the recovered _old generation must be reclaimed after the swap")
    } finally q2.stop()
  }

  test("bloom ingest sink works with a fully-qualified file:/// snapshot URI") {
    val in = newStream()
    val base = Files.createTempDirectory("bloom_ingest_uri").toUri.toString
      .stripSuffix("/")
    assert(base.startsWith("file:///"))
    val q = StreamOps.bloomIngestSink(in.toDF(), "event_id",
      s"$base/snap", s"$base/ckpt")
    try {
      in.addData(Ev(1, ts("2024-01-01 10:00:00"), 1, "doc", 1.0))
      q.processAllAvailable()
      in.addData(
        Ev(1, ts("2024-01-01 11:00:00"), 1, "doc", 1.5), // dup: dropped
        Ev(2, ts("2024-01-01 11:01:00"), 2, "doc", 2.0))
      q.processAllAvailable()
      val snap = spark.read.parquet(s"$base/snap")
        .select("event_id", "value").collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(snap == Map(1L -> 1.0, 2L -> 2.0),
        s"qualified-URI bloom ingest broken: $snap")
    } finally q.stop()
  }

  test("T3 session_window groups by 30-minute gaps (batch mode)") {
    import spark.implicits._
    val df = Seq(
      Ev(1, ts("2024-01-01 10:00:00"), 1, "view", 1.0),
      Ev(2, ts("2024-01-01 10:10:00"), 1, "view", 1.0), // same session
      Ev(3, ts("2024-01-01 11:00:00"), 1, "view", 1.0), // gap 50 min → new session
      Ev(4, ts("2024-01-01 10:00:00"), 2, "view", 1.0)).toDF()
    val sessions = df.groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .count().collect()
    assert(sessions.length == 3)
  }

  test("streaming EWMA carries one double of state per key across batches") {
    import spark.implicits._
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val in = newStream()
    val q = StreamOps.ewmaTws(in.toDS(), alpha = 0.2)
      .writeStream.format("memory").queryName("ewma_tws")
      .outputMode("append").start()
    try {
      // batch 1 arrives out of order inside the batch — the processor
      // must sort by (ts, event_id) before folding
      in.addData(
        Ev(2, ts("2024-01-01 10:10:00"), 1, "m", 20.0),
        Ev(1, ts("2024-01-01 10:00:00"), 1, "m", 10.0),
        Ev(3, ts("2024-01-01 10:00:00"), 2, "m", 100.0))
      q.processAllAvailable()
      // batch 2 continues user 1 from the STORED state, not from scratch
      in.addData(Ev(4, ts("2024-01-01 10:20:00"), 1, "m", 30.0))
      q.processAllAvailable()
      val rows = spark.table("ewma_tws")
        .select("user_id", "value", "ewma").collect()
        .map(r => (r.getLong(0), r.getDouble(1)) -> r.getDouble(2)).toMap
      assert(rows((1L, 10.0)) == 10.0)                       // seed
      assert(rows((1L, 20.0)) == 0.2 * 20.0 + 0.8 * 10.0)    // in-batch fold
      assert(rows((2L, 100.0)) == 100.0)                     // per-key isolation
      val e2 = 0.2 * 20.0 + 0.8 * 10.0
      assert(rows((1L, 30.0)) == 0.2 * 30.0 + 0.8 * e2)      // cross-batch state
    } finally {
      q.stop()
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("event-time timers close sessions when the watermark passes the gap") {
    import spark.implicits._
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val in = newStream()
    val q = StreamOps.sessionsTws(in.toDS(), gapUs = 30L * 60 * 1000000,
        delayThreshold = "0 seconds")
      .writeStream.format("memory").queryName("sess_tws")
      .outputMode("append").start()
    try {
      in.addData(
        Ev(1, ts("2024-01-01 10:00:00"), 1, "view", 1.0),
        Ev(2, ts("2024-01-01 10:10:00"), 1, "view", 1.0),
        Ev(3, ts("2024-01-01 10:05:00"), 2, "view", 1.0))
      q.processAllAvailable()
      assert(spark.table("sess_tws").isEmpty,
        "no session may close before the watermark proves the gap")
      // u1's 11:00 event closes the 10:00–10:10 session IN-DATA (50 min
      // gap); the watermark moving to 11:00 fires u2's 10:35 timer
      in.addData(Ev(4, ts("2024-01-01 11:00:00"), 1, "view", 1.0))
      q.processAllAvailable()
      val mid = spark.table("sess_tws")
        .select("user_id", "start", "end", "n_events").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3)))
        .toSet
      assert(mid == Set(
        (1L, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:10:00"), 2L),
        (2L, ts("2024-01-01 10:05:00"), ts("2024-01-01 10:05:00"), 1L)),
        s"expected one in-data close and one timer close, got $mid")
      // a far-future event (any key) pushes the watermark past u1's
      // 11:30 horizon → the open 11:00 session closes by TIMER
      in.addData(Ev(5, ts("2024-01-01 23:00:00"), 2, "view", 1.0))
      q.processAllAvailable()
      val fin = spark.table("sess_tws")
        .select("user_id", "start", "end", "n_events").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3)))
        .toSet
      assert(fin.contains((1L, ts("2024-01-01 11:00:00"),
        ts("2024-01-01 11:00:00"), 1L)),
        s"open session must close once the watermark passes last+gap: $fin")
    } finally {
      q.stop()
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("MapState point-updates: per-key per-type counters across batches") {
    import spark.implicits._
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val in = newStream()
    val q = StreamOps.typeCountsTws(in.toDS())
      .writeStream.format("memory").queryName("type_counts")
      .outputMode("append").start()
    try {
      in.addData(
        Ev(1, ts("2024-01-01 10:00:00"), 1, "view", 1.0),
        Ev(2, ts("2024-01-01 10:01:00"), 1, "view", 1.0),
        Ev(3, ts("2024-01-01 10:02:00"), 1, "cart", 1.0),
        Ev(4, ts("2024-01-01 10:00:00"), 2, "view", 1.0))
      q.processAllAvailable()
      // batch 2 touches ONLY u1/"view" — the untouched "cart" entry
      // must persist in map state and keep counting distinct types
      in.addData(Ev(5, ts("2024-01-01 11:00:00"), 1, "view", 1.0))
      q.processAllAvailable()
      val rows = spark.table("type_counts")
        .select("user_id", "event_type", "n_type", "n_types").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      // batch-1 emissions
      assert(rows.contains((1L, "view", 2L, 2L)))
      assert(rows.contains((1L, "cart", 1L, 2L)))
      assert(rows.contains((2L, "view", 1L, 1L)))
      // batch-2 emission: counter accumulated, distinct count intact,
      // and no row re-emitted for the untouched "cart" key
      assert(rows.contains((1L, "view", 3L, 2L)))
      assert(rows.count(t => t._1 == 1L && t._2 == "cart") == 1)
    } finally {
      q.stop()
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("pureTtlCount reference: carry within ttl, restart past it") {
    // the batch-parity form of the TTL fold — pinned independently of
    // the streaming engine so the semantics stay spec'd even where the
    // live TTL test can't run
    assert(StreamOps.pureTtlCount(
      Seq((0L, 2L), (100L, 1L), (5000L, 1L)), 800L) == Seq(2L, 3L, 1L))
    assert(StreamOps.pureTtlCount(
      Seq((0L, 2L), (700L, 1L), (1400L, 1L)), 800L) == Seq(2L, 3L, 4L),
      "ttl measures from the LAST UPDATE, so a steadily-active key never expires")
    assert(StreamOps.pureTtlCount(Seq((0L, 1L)), 800L) == Seq(1L))
  }

  test("ValueState TTL reaps idle keys between micro-batches") {
    import org.scalatest.concurrent.TimeLimits.failAfter
    import org.scalatest.time.{Seconds, Span}
    implicit val signaler: org.scalatest.concurrent.Signaler =
      org.scalatest.concurrent.ThreadSignaler
    import spark.implicits._
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val in = newStream()
    // 5 s TTL: generous against batch-scheduling jitter (a batch that
    // stalls longer than the TTL would false-expire an active key), but
    // far below the 8 s idle gap that must expire. failAfter timeboxes
    // the whole query — prior rounds saw TTL queries hang under other
    // trigger setups, and a hang here should fail loudly, not stall CI.
    val ttl = java.time.Duration.ofSeconds(5)
    val q = StreamOps.ttlCountsTws(in.toDS(), ttl)
      .writeStream.format("memory").queryName("ttl_counts")
      .outputMode("append").start()
    // HARNESS NOTE (this was rounds 5–9's "TTL tests hang"): in
    // TimeMode.ProcessingTime the microbatch engine runs CONTINUOUS
    // empty batches so TTL expiry can advance without input — the
    // stream never goes idle, so processAllAvailable() never returns
    // (verified: batchId climbs ~3/s with numInputRows 0). Poll the
    // sink for the expected row count instead; data is picked up by
    // the next rolling batch within ~300 ms anyway.
    def awaitRows(n: Int): Unit = {
      val t0 = System.currentTimeMillis()
      while (spark.table("ttl_counts").count() < n) {
        assert(System.currentTimeMillis() - t0 < 60000,
          s"timed out waiting for $n sink rows")
        Thread.sleep(200)
      }
    }
    try {
      failAfter(Span(120, Seconds)) {
        in.addData(
          Ev(1, ts("2024-01-01 10:00:00"), 1, "view", 1.0),
          Ev(2, ts("2024-01-01 10:01:00"), 1, "view", 1.0),
          Ev(3, ts("2024-01-01 10:02:00"), 2, "view", 1.0))
        awaitRows(2)
        // immediately inside the TTL window: state carries
        in.addData(Ev(4, ts("2024-01-01 10:03:00"), 1, "view", 1.0))
        awaitRows(3)
        Thread.sleep(8000) // > ttl: both keys idle past expiry
        in.addData(
          Ev(5, ts("2024-01-01 10:04:00"), 1, "view", 1.0),
          Ev(6, ts("2024-01-01 10:05:00"), 2, "view", 1.0))
        awaitRows(5)
      }
      val byUser = spark.table("ttl_counts").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).groupBy(_._1)
        .view.mapValues(_.map(_._2).sorted.toSeq).toMap
      // u1: 2 (batch1), 3 (carried), 1 (restarted) — u2: 1, then 1 again
      assert(byUser(1L) == Seq(1L, 2L, 3L),
        s"user 1 counts must be {2 carried-to 3, then restart 1}: $byUser")
      assert(byUser(2L) == Seq(1L, 1L),
        s"user 2 must restart at 1 after idling past the TTL: $byUser")
    } finally {
      q.stop()
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("allowed-late events extend and bridge not-yet-proven sessions") {
    import spark.implicits._
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val in = newStream()
    // 4h lateness bound: a gap-separating event must NOT flush the old
    // session (an allowed-late event could still extend or bridge it)
    val q = StreamOps.sessionsTws(in.toDS(), gapUs = 30L * 60 * 1000000,
        delayThreshold = "4 hours")
      .writeStream.format("memory").queryName("sess_late")
      .outputMode("append").start()
    try {
      in.addData(
        Ev(1, ts("2024-01-01 10:00:00"), 1, "view", 1.0),
        Ev(2, ts("2024-01-01 10:00:00"), 3, "view", 1.0),
        Ev(3, ts("2024-01-01 10:50:00"), 3, "view", 1.0)) // u3: 2 sessions
      q.processAllAvailable()
      // u1's 13:00 event is 3h past 10:00 — gap-separated, but the
      // watermark (09:00) hasn't proven the 10:00 session over yet
      in.addData(Ev(4, ts("2024-01-01 13:00:00"), 1, "view", 1.0))
      q.processAllAvailable()
      assert(spark.table("sess_late").isEmpty,
        "nothing may emit while the watermark allows late extensions")
      // allowed-late arrivals (>= watermark 09:00): u1's 10:20 EXTENDS
      // the gap-separated 10:00 session; u3's 10:25 BRIDGES 10:00+10:50
      in.addData(
        Ev(5, ts("2024-01-01 10:20:00"), 1, "view", 1.0),
        Ev(6, ts("2024-01-01 10:25:00"), 3, "view", 1.0))
      q.processAllAvailable()
      // push the watermark to 14:00 — every u1/u3 horizon is passed
      in.addData(Ev(7, ts("2024-01-01 18:00:00"), 2, "view", 1.0))
      q.processAllAvailable()
      val got = spark.table("sess_late")
        .select("user_id", "start", "end", "n_events").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3)))
        .toSet
      assert(got == Set(
        (1L, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:20:00"), 2L),
        (1L, ts("2024-01-01 13:00:00"), ts("2024-01-01 13:00:00"), 1L),
        (3L, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:50:00"), 3L)),
        s"late events must extend/bridge pending sessions: $got")
    } finally {
      q.stop()
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("T3 session_window aggregates in STREAMING mode with watermark-gated emission") {
    import spark.implicits._
    val in = newStream()
    val q = in.toDF().withWatermark("ts", "0 seconds")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("session_window.start").as("start"),
        col("session_window.end").as("end"), col("user_id"), col("n"))
      .writeStream.format("memory").queryName("t3_stream")
      .outputMode("append").start()
    try {
      in.addData(
        Ev(1, ts("2024-01-01 10:00:00"), 1, "view", 1.0),
        Ev(2, ts("2024-01-01 10:10:00"), 1, "view", 1.0),
        Ev(3, ts("2024-01-01 10:05:00"), 2, "view", 1.0))
      q.processAllAvailable()
      assert(spark.table("t3_stream").isEmpty,
        "append mode may not emit a session the watermark hasn't closed")
      // 13:00 advances the watermark far past both sessions' gap end
      in.addData(Ev(4, ts("2024-01-01 13:00:00"), 3, "view", 1.0))
      q.processAllAvailable()
      val rows = spark.table("t3_stream")
        .select("user_id", "start", "n").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2))).toSet
      assert(rows == Set(
        (1L, ts("2024-01-01 10:00:00"), 2L),
        (2L, ts("2024-01-01 10:05:00"), 1L)),
        s"both closed sessions must flush, merged per gap: $rows")
    } finally q.stop()
  }

  test("t-digest sketch aggregates inside a windowed streaming query") {
    // the mergeable-sketch contract doing streaming duty: quantile state
    // per (type, window) is O(delta) centroids, merged across batches by
    // the same partial/final path batch aggs use
    import org.apache.spark.sql.functions._
    val agg = udaf(new graft.functions.TDigestAgg(100))
    val in = newStream()
    val q = in.toDF()
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(agg(col("value")).as("td"), count(lit(1)).as("n"))
      .select(col("w.start").as("bucket"), col("event_type"),
        col("td"), col("n"))
      .writeStream.format("memory").queryName("td_stream")
      .outputMode("append").start()
    try {
      in.addData((1 to 50).map(i =>
        Ev(i, ts("2024-01-01 10:05:00"), 1, "m", i.toDouble)): _*)
      q.processAllAvailable()
      in.addData((51 to 100).map(i =>
        Ev(i, ts("2024-01-01 10:40:00"), 1, "m", i.toDouble)): _*)
      q.processAllAvailable()
      // advance the watermark so the 10:00 window finalizes
      in.addData(Ev(101, ts("2024-01-01 13:00:00"), 1, "m", 0.0))
      q.processAllAvailable()
      val row = spark.table("td_stream")
        .filter(col("bucket") === ts("2024-01-01 10:00:00"))
        .select("td.means", "td.ws", "n").collect()(0)
      assert(row.getLong(2) == 100L)
      val sk = graft.functions.TDigestAgg.Sketch(
        row.getSeq[Double](0).toArray, row.getSeq[Long](1).toArray)
      assert(sk.ws.sum == 100L, "sketch must cover both micro-batches")
      val med = graft.functions.TDigestAgg.quantile(sk, 0.5)
      assert(math.abs(med - 50.5) <= 3.0, s"median estimate off: $med")
    } finally q.stop()
  }

  test("KMV distinct sketch aggregates inside a windowed streaming query") {
    // L293 (r16): the r15 KMV library doing streaming duty beside
    // L83's t-digest — distinct-count state per window is O(k) longs,
    // merged across micro-batches by the same partial/final path, and
    // (unlike t-digest) DETERMINISTIC: the k smallest distinct hashes
    // do not depend on batch boundaries, so the streamed sketch must
    // equal the batch sketch over the same rows EXACTLY, not within a
    // band.
    import org.apache.spark.sql.functions._
    val k = 64
    val agg = udaf(new graft.ops.Kmv.KmvAgg(k))
    val in = newStream()
    val q = in.toDF()
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour").as("w"))
      .agg(agg(graft.ops.Kmv.hashCol(col("user_id"))).as("kmv"),
        count(lit(1)).as("n"))
      .select(col("w.start").as("bucket"), col("kmv"), col("n"))
      .writeStream.format("memory").queryName("kmv_stream")
      .outputMode("append").start()
    try {
      // two micro-batches with OVERLAPPING user sets: distinct across
      // the window is 300, not 150 + 201
      in.addData((1 to 150).map(u =>
        Ev(u, ts("2024-01-01 10:05:00"), u, "m", 0.0)): _*)
      q.processAllAvailable()
      in.addData((100 to 300).map(u =>
        Ev(1000 + u, ts("2024-01-01 10:40:00"), u, "m", 0.0)): _*)
      q.processAllAvailable()
      in.addData(Ev(9999, ts("2024-01-01 13:00:00"), 1, "m", 0.0))
      q.processAllAvailable()
      val row = spark.table("kmv_stream")
        .filter(col("bucket") === ts("2024-01-01 10:00:00"))
        .select("kmv", "n").collect()(0)
      assert(row.getLong(1) === 351L, "both micro-batches must land")
      val sk = row.getSeq[Long](0).toArray
      assert(sk.length === k, s"sketch underfilled: ${sk.length}")
      val est = graft.ops.Kmv.estimate(sk, k)
      assert(math.abs(est / 300.0 - 1.0) < 0.35,
        s"streamed KMV estimate $est off the 300-distinct truth")
      // determinism: the streamed sketch == the batch sketch over the
      // union of the same rows, element for element
      import spark.implicits._
      val users = ((1 to 150) ++ (100 to 300)).map(_.toLong)
      val batchSk = users.toDF("user_id")
        .select(graft.ops.Kmv.hashCol(col("user_id")).as("hv"))
        .agg(agg(col("hv"))).collect()(0).getSeq[Long](0).toArray
      assert(java.util.Arrays.equals(sk, batchSk),
        "streamed sketch diverged from the batch sketch over equal rows")
    } finally q.stop()
  }

  test("equi-width histogram bins aggregate inside a windowed streaming query") {
    // r17 (r16 verdict mandate #6): q357's mergeable-histogram
    // property doing streaming duty beside KmvAgg/t-digest — the bin
    // census state per window is ≤ 32 longs, merged across
    // micro-batches by the same partial/final path, and (like KMV,
    // unlike t-digest) DETERMINISTIC: bin counts are exact integers
    // independent of batch boundaries, so the streamed census must
    // equal the batch census over the same rows element-for-element,
    // and the interpolated P50 from streamed bins must sit within one
    // bin width of the exact median (q357's structural bound).
    import org.apache.spark.sql.functions._
    // fixed bounds (a streaming histogram cannot scan for min/max):
    // values land in [1, 400], 32 equi-width bins
    val (lo, hi, nb) = (1L, 400L, 32L)
    val bin = least(lit(nb - 1),
      floor((col("value").cast("long") - lo) * nb / (hi - lo + 1)))
    val in = newStream()
    val q = in.toDF()
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour").as("w"), bin.as("bin"))
      .agg(count(lit(1)).as("c"))
      .select(col("w.start").as("bucket"), col("bin"), col("c"))
      .writeStream.format("memory").queryName("hist_stream")
      .outputMode("append").start()
    try {
      // two micro-batches over one window: counts must MERGE (40+60
      // rows, values interleaved so most bins span both batches)
      in.addData((1 to 40).map(i =>
        Ev(i, ts("2024-01-01 10:05:00"), 1, "m", (i * 7 % 400 + 1).toDouble)): _*)
      q.processAllAvailable()
      in.addData((41 to 100).map(i =>
        Ev(i, ts("2024-01-01 10:40:00"), 1, "m", (i * 7 % 400 + 1).toDouble)): _*)
      q.processAllAvailable()
      in.addData(Ev(999, ts("2024-01-01 13:00:00"), 1, "m", 1.0))
      q.processAllAvailable()
      val streamed = spark.table("hist_stream")
        .filter(col("bucket") === ts("2024-01-01 10:00:00"))
        .select("bin", "c").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(streamed.values.sum === 100L, "both micro-batches must land")
      // batch census over the identical rows, element for element
      import spark.implicits._
      val vals = (1 to 100).map(i => (i * 7 % 400 + 1).toLong)
      val batch = vals.toDF("value")
        .groupBy(least(lit(nb - 1),
          floor((col("value") - lo) * nb / (hi - lo + 1))).as("bin"))
        .agg(count(lit(1)).as("c")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(streamed === batch,
        "streamed bin census diverged from the batch census over equal rows")
      // q357's readout: interpolated P50 within one bin width of exact
      val sorted = vals.sorted
      val exactMed = (sorted(49) + sorted(50)) / 2.0
      val cumBins = streamed.toSeq.sortBy(_._1)
        .scanLeft(((-1L), 0L)) { case ((_, cum), (b, c)) => (b, cum + c) }
        .drop(1)
      val t = 0.5 * 100
      val (mb, cumAt) = cumBins.find(_._2 >= t).get
      val cBefore = cumAt - streamed(mb)
      val w = (hi - lo + 1).toDouble / nb
      val p50 = lo + (mb + (t - cBefore) / streamed(mb)) * w
      assert(math.abs(p50 - exactMed) <= w,
        s"interpolated P50 $p50 beyond one bin width of exact $exactMed")
    } finally q.stop()
  }

  test("histogram census as keyed transformWithState state merges " +
      "across micro-batches exactly") {
    // r18 (r17 verdict item #7): q357's histogram was the only sketch
    // without a transformWithState variant — KMV, t-digest and
    // count-min already stream. The processor's ValueState census must
    // MERGE by addition across batches: the final emission over the
    // same rows equals the batch groupBy census element-for-element
    // (exact integers — no batch-boundary dependence), and its
    // interpolated P50 sits within one bin width of the exact median
    // (q357's structural bound).
    import spark.implicits._
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val (lo, hi, nb) = (1L, 400L, 32)
    val in = newStream()
    val q = StreamOps.histogramTws(in.toDS(), lo, hi, nb)
      .writeStream.format("memory").queryName("hist_tws")
      .outputMode("append").start()
    try {
      val vals = (1 to 100).map(i => (i * 7 % 400 + 1).toLong)
      in.addData(vals.take(40).zipWithIndex.map { case (v, i) =>
        Ev(i, ts("2024-01-01 10:05:00"), 1, "m", v.toDouble) }: _*)
      q.processAllAvailable()
      in.addData(vals.drop(40).zipWithIndex.map { case (v, i) =>
        Ev(40 + i, ts("2024-01-01 10:40:00"), 1, "m", v.toDouble) }: _*)
      q.processAllAvailable()
      val rows = spark.table("hist_tws")
        .filter(col("user_id") === 1L).collect()
        .map(r => (r.getAs[Long]("n"),
          r.getSeq[Long](r.fieldIndex("bins")).toVector,
          r.getAs[Double]("est_p50"))).sortBy(_._1)
      assert(rows.length === 2, "one emission per micro-batch")
      assert(rows.head._1 === 40L && rows.last._1 === 100L,
        "census must accumulate, not reset, across batches")
      val streamed = rows.last._2
      // batch census over the identical rows, element for element
      val batch = vals.toDF("value")
        .groupBy(least(lit(nb - 1L),
          floor((col("value") - lo) * nb / (hi - lo + 1))).as("bin"))
        .agg(count(lit(1)).as("c")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val batchBins = (0 until nb).map(b => batch.getOrElse(b.toLong, 0L))
        .toVector
      assert(streamed === batchBins,
        "streamed census diverged from the batch census over equal rows")
      val sorted = vals.sorted
      val exactMed = (sorted(49) + sorted(50)) / 2.0
      val w = (hi - lo + 1).toDouble / nb
      assert(math.abs(rows.last._3 - exactMed) <= w,
        s"interpolated P50 ${rows.last._3} beyond one bin width of $exactMed")
    } finally {
      q.stop()
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("count-min cell census aggregates inside a windowed streaming query") {
    // r17 (r16 verdict mandate #6, second half): q358's count-min
    // rollup doing streaming duty beside the histogram/KMV/t-digest
    // members — the (j, cell) census state per window is ≤ 3·1024
    // longs merged across micro-batches by the partial/final path,
    // DETERMINISTIC like the histogram (exact integer counts), so the
    // streamed census must equal the batch census over the same rows
    // element-for-element, and a probe key's min-over-rows estimate
    // must upper-bound its exact count (the count-min guarantee).
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.Column
    val w = 64L
    def cell(j: Int, key: Column): Column =
      pmod(conv(substring(md5(concat(lit(s"cm$j:"),
        key.cast("string"))), 1, 6), 16, 10).cast("long"), lit(w))
    val in = newStream()
    val q = in.toDF()
      .withWatermark("ts", "10 minutes")
      .select(col("ts"),
        cell(0, col("user_id")).as("c0"), cell(1, col("user_id")).as("c1"),
        cell(2, col("user_id")).as("c2"))
      .selectExpr("ts", "stack(3, 0L, c0, 1L, c1, 2L, c2) as (j, cell)")
      .groupBy(window(col("ts"), "1 hour").as("win"), col("j"), col("cell"))
      .agg(count(lit(1)).as("n"))
      .select(col("win.start").as("bucket"), col("j"), col("cell"), col("n"))
      .writeStream.format("memory").queryName("cm_stream")
      .outputMode("append").start()
    try {
      // skewed stream: user 7 dominates, split across two micro-batches
      val users = (1 to 30).map(_.toLong) ++ Seq.fill(40)(7L)
      val (b1, b2) = users.splitAt(35)
      in.addData(b1.zipWithIndex.map { case (u, i) =>
        Ev(i, ts("2024-01-01 10:05:00"), u, "m", 0.0) }: _*)
      q.processAllAvailable()
      in.addData(b2.zipWithIndex.map { case (u, i) =>
        Ev(100 + i, ts("2024-01-01 10:40:00"), u, "m", 0.0) }: _*)
      q.processAllAvailable()
      in.addData(Ev(999, ts("2024-01-01 13:00:00"), 1, "m", 0.0))
      q.processAllAvailable()
      val streamed = spark.table("cm_stream")
        .filter(col("bucket") === ts("2024-01-01 10:00:00"))
        .select("j", "cell", "n").collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(streamed.values.sum === 3L * users.length,
        "both micro-batches must land in every row of the sketch")
      // batch census over the identical keys, element for element
      import spark.implicits._
      val batch = users.toDF("user_id")
        .select(cell(0, col("user_id")).as("c0"),
          cell(1, col("user_id")).as("c1"), cell(2, col("user_id")).as("c2"))
        .selectExpr("stack(3, 0L, c0, 1L, c1, 2L, c2) as (j, cell)")
        .groupBy("j", "cell").agg(count(lit(1)).as("n")).collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(streamed === batch,
        "streamed cell census diverged from the batch census")
      // the count-min guarantee on the hot probe key: est >= exact
      val probe = spark.range(7, 8).toDF("k")
        .select(cell(0, col("k")).as("c0"), cell(1, col("k")).as("c1"),
          cell(2, col("k")).as("c2")).collect()(0)
      val est = Seq(streamed.getOrElse((0L, probe.getLong(0)), 0L),
        streamed.getOrElse((1L, probe.getLong(1)), 0L),
        streamed.getOrElse((2L, probe.getLong(2)), 0L)).min
      val exact = users.count(_ == 7L).toLong
      assert(est >= exact, s"count-min must never undercount: $est < $exact")
      assert(est <= exact + users.length,
        s"estimate $est implausibly high for ${users.length} rows")
    } finally q.stop()
  }
}
