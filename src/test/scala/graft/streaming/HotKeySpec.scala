package graft.streaming

import graft.pipeline.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** The hot-key guard (VERDICT r11 #4): all four flatMapGroupsWithState
  * operators stream each group's micro-batch slice through a size-capped
  * smallest-N selection instead of materializing it, so one bot key
  * cannot OOM a task. Pins: (a) in-cap keys are bit-identical with and
  * without the guard; (b) an over-cap key is truncated to exactly its
  * cap EARLIEST events (deterministic, not arrival-order); (c) the
  * overflow counter goes loud.
  */
class HotKeySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("sessionize: over-cap key truncates to the cap earliest events; in-cap keys unchanged") {
    val s = spark
    import s.implicits._
    // hot user 1: 1000 events 10s apart (one long session under the 30min
    // gap); quiet user 2: 3 events. Cap 100 → user 1's slice truncates to
    // its 100 EARLIEST events even though the input arrives reversed.
    val hot = (0 until 1000).reverse.map(i =>
      EventStreams.EventIn(1L, i.toLong, 1000000L * 10L * i))
    val quiet = Seq(
      EventStreams.EventIn(2L, 1L, 0L),
      EventStreams.EventIn(2L, 2L, 5000000L),
      EventStreams.EventIn(2L, 3L, 99999000000L)) // second session
    val before = EventStreams.hotKeyDropped
    val out = EventStreams.sessionize((hot ++ quiet).toDS(), hotKeyCap = 100)
      .collect().groupBy(_.user_id)
    // guard kept events 0..99 → still one open session, nothing closed for
    // user 1; user 2 closes its first session exactly as uncapped
    assert(!out.contains(1L))
    assert(out(2L).map(o => (o.session_start, o.n_events)).toSeq == Seq((0L, 2L)))
    assert(EventStreams.hotKeyDropped - before == 900L)

    // same input, cap ABOVE the slice: identical to the unguarded shape
    val wide = EventStreams.sessionize((hot ++ quiet).toDS()).collect().toSet
    val exact = EventStreams.sessionize((hot ++ quiet).toDS(), hotKeyCap = 2000)
      .collect().toSet
    assert(wide == exact)
  }

  test("funnelAdvance: truncation keeps the earliest events, so a late-only funnel cannot fire") {
    val s = spark
    import s.implicits._
    // user 5: 200 'view' noise events at t=0..199, then the real
    // view→click→purchase at t=1000..1002. Cap 100 keeps only the 100
    // EARLIEST rows (the noise), so only step 1 advances — and the drop
    // is counted. In-cap user 6 completes identically to the unguarded op.
    val noise = (0 until 200).map(i => EventStreams.FunnelIn(5L, "view", i.toLong))
    val real = Seq(
      EventStreams.FunnelIn(5L, "view", 1000L), EventStreams.FunnelIn(5L, "click", 1001L),
      EventStreams.FunnelIn(5L, "purchase", 1002L),
      EventStreams.FunnelIn(6L, "view", 10L), EventStreams.FunnelIn(6L, "click", 20L),
      EventStreams.FunnelIn(6L, "purchase", 30L))
    val before = EventStreams.hotKeyDropped
    val out = EventStreams.funnelAdvance((noise ++ real).toDS(), hotKeyCap = 100)
      .collect().groupBy(_.user_id)
    assert(out(5L).map(_.step).toSeq == Seq(1)) // earliest view only
    assert(out(6L).map(_.step).sorted.toSeq == Seq(1, 2, 3))
    assert(EventStreams.hotKeyDropped - before == 103L) // 203 hot rows - cap 100
  }

  test("truncation is QUERYABLE: the hot key surfaces in hotKeyDropMetrics; in-cap keys emit nothing") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions.col
    // isolate this test's rows from earlier suites' accumulated drops by
    // flushing whatever is pending first (flush clears the accumulator)
    val preDir = java.nio.file.Files.createTempDirectory("graft-hkpre").toString + "/m"
    EventStreams.flushHotKeyDrops(spark, preDir, 0L)
    val hot = (0 until 300).map(i => EventStreams.EventIn(41L, i.toLong, 1000000L * i))
    val quiet = (0 until 5).map(i => EventStreams.EventIn(42L, i.toLong, 1000000L * i))
    EventStreams.sessionize((hot ++ quiet).toDS(), hotKeyCap = 100).collect()
    val m = EventStreams.hotKeyDropMetrics(spark)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(m == Set(("sessionize", 41L, 200L)),
      s"expected exactly the hot key's drop row, got $m") // in-cap key 42 absent
    // flush lands the relation as an idempotent batch partition and clears
    val dir = java.nio.file.Files.createTempDirectory("graft-hk").toString + "/metrics"
    EventStreams.flushHotKeyDrops(spark, dir, 7L)
    val landed = spark.read.parquet(dir)
      .select("op", "user_id", "dropped_events", "batch_id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
    assert(landed == Set(("sessionize", 41L, 200L, 7)))
    assert(EventStreams.hotKeyDropMetrics(spark).isEmpty, "flush clears the accumulator")
    // nothing pending → flush is a no-op (no empty partition)
    EventStreams.flushHotKeyDrops(spark, dir, 8L)
    assert(spark.read.parquet(dir).filter(col("batch_id") === 8).count() == 0L)
  }

  test("bounded variants: guard parity with their unbounded twins for in-cap keys") {
    val s = spark
    import s.implicits._
    val rows = (0 until 50).map(i => EventStreams.EventIn(9L, i.toLong, 1000000L * i))
    val a = EventStreams.sessionize(rows.toDS(), gapMicros = 1L).collect().toSet
    val b = EventStreams.sessionizeBounded(rows.toDS(), gapMicros = 1L, hotKeyCap = 64)
      .collect().toSet
    // batch mode: bounded form emits the same closed sessions (final
    // pending session stays open in both)
    assert(a == b)
  }

  test("per-op flush drains ONLY its operator's accumulator (r14 race fix)") {
    val s = spark
    import s.implicits._
    // drain anything earlier suites left pending
    val preDir = java.nio.file.Files.createTempDirectory("graft-hkpre2").toString + "/m"
    EventStreams.flushHotKeyDrops(spark, preDir, 0L)
    // one pending drop per operator
    val sessHot = (0 until 150).map(i => EventStreams.EventIn(61L, i.toLong, 1000000L * i))
    EventStreams.sessionize(sessHot.toDS(), hotKeyCap = 100).collect()
    val funHot = (0 until 180).map(i => EventStreams.FunnelIn(62L, "view", i.toLong))
    EventStreams.funnelAdvance(funHot.toDS(), hotKeyCap = 100).collect()
    // flushing funnelAdvance's op lands ONLY its row and leaves
    // sessionize's pending drop untouched — the failure mode the shared
    // accumulator had was exactly this wipe (snapshot→write→reset of
    // one stream erasing another's unflushed drops)
    val dirF = java.nio.file.Files.createTempDirectory("graft-hkf").toString + "/metrics"
    EventStreams.flushHotKeyDrops(spark, dirF, 1L, "funnelAdvance")
    val landed = spark.read.parquet(dirF)
      .collect().map(r => (r.getAs[String]("op"), r.getAs[Long]("user_id"),
        r.getAs[Long]("dropped_events"))).toSet
    assert(landed == Set(("funnelAdvance", 62L, 80L)))
    val pending = EventStreams.hotKeyDropMetrics(spark)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(pending == Set(("sessionize", 61L, 50L)),
      s"sessionize's drop must survive the other op's flush, got $pending")
    // its own flush then drains it
    val dirS = java.nio.file.Files.createTempDirectory("graft-hks").toString + "/metrics"
    EventStreams.flushHotKeyDrops(spark, dirS, 2L, "sessionize")
    assert(EventStreams.hotKeyDropMetrics(spark).isEmpty)
  }
}
