package graft.streaming

import graft.pipeline.SparkTestSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The streaming funnel against its batch twin: same step times and
  * depths as `RelationalQueries.funnelSteps` on identical (in-order)
  * input, in-batch disorder healed by the sort, and the per-user state
  * carrying a partial funnel across micro-batches.
  */
class FunnelStreamSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("batch parity: streamed advances reconstruct funnel_steps exactly") {
    val s = spark
    import s.implicits._
    // deliberately shuffled within the batch — the sort must heal it
    val rows = Seq(
      EventStreams.FunnelIn(1L, "click", 30L), EventStreams.FunnelIn(1L, "view", 20L),
      EventStreams.FunnelIn(1L, "purchase", 50L), EventStreams.FunnelIn(1L, "click", 10L),
      EventStreams.FunnelIn(2L, "view", 10L), EventStreams.FunnelIn(2L, "purchase", 5L),
      EventStreams.FunnelIn(3L, "view", 10L), EventStreams.FunnelIn(3L, "click", 30L),
      EventStreams.FunnelIn(3L, "purchase", 25L), EventStreams.FunnelIn(3L, "purchase", 40L))
    val advances = EventStreams.funnelAdvance(rows.toDS()).collect()

    val ev = rows.toDF("user_id", "event_type", "us")
    val batch = graft.operators.RelationalQueries.funnelSteps(ev).collect()
      .map(r => r.getLong(0) -> r).toMap

    // every batch step time must appear as exactly one streamed advance
    batch.foreach { case (uid, r) =>
      val streamed = advances.filter(_.user_id == uid).sortBy(_.step)
      val expected = Seq("t_view", "t_click", "t_purchase")
        .flatMap(c => if (r.isNullAt(r.fieldIndex(c))) None else Some(r.getAs[Long](c)))
      assert(streamed.map(_.tsMicros).toSeq == expected,
        s"user $uid: streamed ${streamed.toSeq} vs batch $expected")
      assert(streamed.map(_.step).toSeq == (1 to expected.length),
        s"user $uid: steps must be consecutive from 1")
    }
    assert(advances.map(_.user_id).toSet == batch.keySet)
  }

  test("state carries a partial funnel across micro-batches") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[(Long, String, Long)]
    val q = EventStreams.funnelAdvance(
      mem.toDS().map(t => EventStreams.FunnelIn(t._1, t._2, t._3)))
      .writeStream.format("memory").queryName("funnel").outputMode("append").start()
    try {
      mem.addData((7L, "view", 100L), (7L, "purchase", 150L)) // purchase too early: no click yet
      q.processAllAvailable()
      mem.addData((7L, "click", 200L), (7L, "purchase", 300L)) // now both advance
      q.processAllAvailable()
      val out = s.sql("SELECT step, step_type, tsMicros FROM funnel WHERE user_id = 7 ORDER BY step")
        .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
      assert(out.toSeq == Seq((1, "view", 100L), (2, "click", 200L), (3, "purchase", 300L)),
        s"cross-batch funnel state broken: ${out.toSeq}")
    } finally q.stop()
  }

  test("bounded: batch parity with funnel_steps for in-horizon events") {
    val s = spark
    import s.implicits._
    val rows = Seq(
      EventStreams.FunnelIn(1L, "click", 30L), EventStreams.FunnelIn(1L, "view", 20L),
      EventStreams.FunnelIn(1L, "purchase", 50L), EventStreams.FunnelIn(1L, "click", 10L),
      EventStreams.FunnelIn(2L, "view", 10L), EventStreams.FunnelIn(2L, "purchase", 5L),
      EventStreams.FunnelIn(3L, "view", 10L), EventStreams.FunnelIn(3L, "click", 30L),
      EventStreams.FunnelIn(3L, "purchase", 25L), EventStreams.FunnelIn(3L, "purchase", 40L))
    val advances = EventStreams.funnelAdvanceBounded(rows.toDS()).collect()

    val batch = graft.operators.RelationalQueries
      .funnelSteps(rows.toDF("user_id", "event_type", "us")).collect()
      .map(r => r.getLong(0) -> r).toMap
    batch.foreach { case (uid, r) =>
      val streamed = advances.filter(_.user_id == uid).sortBy(_.step)
      val expected = Seq("t_view", "t_click", "t_purchase")
        .flatMap(c => if (r.isNullAt(r.fieldIndex(c))) None else Some(r.getAs[Long](c)))
      assert(streamed.map(_.tsMicros).toSeq == expected,
        s"user $uid: streamed ${streamed.toSeq} vs batch $expected")
    }
    assert(advances.map(_.user_id).toSet == batch.keySet)
  }

  test("parameterized steps: 4-step streamed advances match the 4-step batch funnel") {
    val s = spark
    import s.implicits._
    val steps4 = Seq("signup", "view", "click", "purchase")
    val rows = Seq(
      EventStreams.FunnelIn(1L, "signup", 5L), EventStreams.FunnelIn(1L, "view", 10L),
      EventStreams.FunnelIn(1L, "purchase", 15L), EventStreams.FunnelIn(1L, "click", 20L),
      EventStreams.FunnelIn(1L, "purchase", 30L),
      EventStreams.FunnelIn(2L, "view", 10L), EventStreams.FunnelIn(2L, "click", 20L),
      EventStreams.FunnelIn(3L, "click", 8L), EventStreams.FunnelIn(3L, "signup", 9L),
      EventStreams.FunnelIn(3L, "view", 12L))
    val advances = EventStreams.funnelAdvance(rows.toDS(), steps = steps4).collect()
    val batch = graft.operators.RelationalQueries
      .funnelSteps(rows.toDF("user_id", "event_type", "us"), steps = steps4)
      .collect().map(r => r.getLong(0) -> r).toMap
    batch.foreach { case (uid, r) =>
      val streamed = advances.filter(_.user_id == uid).sortBy(_.step)
      val expected = steps4.map(st => s"t_$st")
        .flatMap(c => if (r.isNullAt(r.fieldIndex(c))) None else Some(r.getAs[Long](c)))
      assert(streamed.map(_.tsMicros).toSeq == expected,
        s"user $uid: streamed ${streamed.toSeq} vs batch $expected")
    }
    assert(advances.map(_.user_id).toSet == batch.keySet)
  }

  test("bounded: completion clears state; a later view opens a new cycle") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val Sec = 1000000L
    val mem = MemoryStream[(Long, String, Long)]
    val q = EventStreams.funnelAdvanceBounded(
      mem.toDS().map(t => EventStreams.FunnelIn(t._1, t._2, t._3)),
      watermarkDelay = "0 seconds")
      .writeStream.format("memory").queryName("funnel_b1").outputMode("append").start()
    try {
      mem.addData((7L, "view", 100L * Sec), (7L, "click", 200L * Sec),
        (7L, "purchase", 300L * Sec))
      q.processAllAvailable()
      // completion removed the state in the SAME batch
      val stateRows = q.lastProgress.stateOperators.head.numRowsTotal
      assert(stateRows == 0L, s"completed funnel must clear its state, found $stateRows rows")
      // a later first-step event starts a NEW cycle (re-emits step 1)
      mem.addData((7L, "view", 400L * Sec))
      q.processAllAvailable()
      val out = s.sql("SELECT step, tsMicros FROM funnel_b1 WHERE user_id = 7 ORDER BY tsMicros")
        .collect().map(r => (r.getInt(0), r.getLong(1)))
      assert(out.toSeq == Seq((1, 100L * Sec), (2, 200L * Sec), (3, 300L * Sec), (1, 400L * Sec)),
        s"post-completion view must open a fresh funnel: ${out.toSeq}")
    } finally q.stop()
  }

  test("bounded: idle partial funnel is evicted once the watermark passes the horizon") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val Sec = 1000000L
    val mem = MemoryStream[(Long, String, Long)]
    // horizon = 100 s of event time, zero-delay watermark
    val q = EventStreams.funnelAdvanceBounded(
      mem.toDS().map(t => EventStreams.FunnelIn(t._1, t._2, t._3)),
      horizonMicros = 100L * Sec, watermarkDelay = "0 seconds")
      .writeStream.format("memory").queryName("funnel_b2").outputMode("append").start()
    try {
      mem.addData((1L, "view", 1000L * Sec)) // partial funnel; timeout at 1100 s
      q.processAllAvailable()
      mem.addData((2L, "view", 2000L * Sec)) // watermark → 2000 s at end of batch
      q.processAllAvailable()
      mem.addData((3L, "view", 2100L * Sec)) // this batch fires user 1's timeout
      q.processAllAvailable()
      assert(q.lastProgress.stateOperators.head.numRowsTotal == 2L,
        "user 1 evicted past the horizon; users 2 and 3 in-horizon")
      // user 1's click would have been step 2 — state is gone, so it
      // does not match step 1 and emits nothing
      mem.addData((1L, "click", 2200L * Sec))
      q.processAllAvailable()
      val u1 = s.sql("SELECT step FROM funnel_b2 WHERE user_id = 1").collect().map(_.getInt(0))
      assert(u1.toSeq == Seq(1), s"evicted user must not advance from stale state: ${u1.toSeq}")
    } finally q.stop()
  }
}
