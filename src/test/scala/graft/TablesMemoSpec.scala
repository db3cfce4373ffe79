package graft

import java.lang.ref.WeakReference

import org.apache.spark.GraftTestBus

/** Pins the Tables relation-memo eviction contract (ADVICE r3/r4, the
  * one medium-severity finding): entries are keyed by sessionUUID — a
  * string the cached DataFrames do NOT reference — and are dropped when
  * the session's context fires onApplicationEnd, so a stopped,
  * dereferenced session is genuinely collectable. The old
  * WeakHashMap[SparkSession, _] scheme could never collect anything
  * because each DataFrame value strongly referenced its key session.
  */
class TablesMemoSpec extends SparkSpec {

  test("load memoizes per session UUID and application-end evicts it") {
    var child = spark.newSession()
    val uuid = org.apache.spark.sql.GraftColumnBridge.sessionUUID(child)
    assert(uuid != org.apache.spark.sql.GraftColumnBridge.sessionUUID(spark),
      "newSession must get its own UUID")

    Tables.lineitem(child, sf0001)
    assert(Tables.isMemoized(uuid), "a load must create a memo entry")

    // fire the same event SparkContext.stop() posts; the listener
    // registered by the first load for this session must evict its entry
    GraftTestBus.postApplicationEnd(spark.sparkContext)
    assert(!Tables.isMemoized(uuid),
      "application end must evict the session's memo entries")

    // the leak property itself: with the memo entry gone, nothing pins
    // the session — a dereferenced session must become collectable
    val ref = new WeakReference(child)
    child = null
    val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
    while (ref.get() != null && System.nanoTime() < deadline) {
      System.gc()
      Thread.sleep(50)
    }
    assert(ref.get() == null,
      "a stopped, dereferenced session must be GC-collectable once evicted")
  }

  test("session map is LRU-bounded: dropped clones cannot accumulate unboundedly") {
    // newSession() clones dereferenced mid-application have no stop
    // event; the cap is what bounds their retention
    val first = spark.newSession()
    val firstUuid = org.apache.spark.sql.GraftColumnBridge.sessionUUID(first)
    Tables.nation(first, sf0001)
    assert(Tables.isMemoized(firstUuid))
    for (_ <- 1 to 70) { // > MaxSessions = 64 fresh sessions
      Tables.nation(spark.newSession(), sf0001)
    }
    assert(!Tables.isMemoized(firstUuid),
      "the least-recently-loaded session must have been LRU-evicted")
  }

  test("memo survives unrelated loads and re-populates after eviction") {
    val child = spark.newSession()
    val uuid = org.apache.spark.sql.GraftColumnBridge.sessionUUID(child)
    Tables.nation(child, sf0001)
    assert(Tables.isMemoized(uuid))
    Tables.evict(uuid)
    assert(!Tables.isMemoized(uuid))
    // a fresh load after evict must work (listener re-registers)
    assert(Tables.nation(child, sf0001).count() > 0)
    assert(Tables.isMemoized(uuid))
    Tables.evict(uuid)
  }
}
