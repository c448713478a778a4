package graft.operators

import graft.pipeline.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Ordered-funnel semantics (`funnel_steps`): the ORDER constraint is
  * the operator — a click BEFORE the first view must not advance the
  * funnel, and each step anchors on the strictly-next event after the
  * previous step's time.
  */
class FunnelSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def ev(rows: (Long, String, Long)*) = {
    val s = spark
    import s.implicits._
    rows.toDF("user_id", "event_type", "us")
  }

  test("out-of-order events do not advance the funnel") {
    // user 1: click(10) BEFORE view(20), click(30) after → t_click = 30
    // user 2: purchase(5) then view(10), no click → depth 1, no purchase
    // user 3: full in-order funnel, with an EARLIER purchase(25) that
    //         precedes the click(30) — t_purchase must be 40, not 25
    // user 4: clicks only, never views → absent (step 1 is the anchor)
    val out = RelationalQueries.funnelSteps(ev(
      (1L, "click", 10L), (1L, "view", 20L), (1L, "click", 30L),
      (2L, "purchase", 5L), (2L, "view", 10L),
      (3L, "view", 10L), (3L, "purchase", 25L), (3L, "click", 30L), (3L, "purchase", 40L),
      (4L, "click", 10L), (4L, "click", 20L)))
      .collect().map(r => r.getLong(0) -> r).toMap

    assert(out.keySet == Set(1L, 2L, 3L), "only users with a view anchor appear")
    assert(out(1L).getAs[Long]("t_click") == 30L, "pre-view click must not count")
    assert(out(1L).getAs[Int]("funnel_depth") == 2)
    assert(out(2L).isNullAt(out(2L).fieldIndex("t_click")) &&
      out(2L).getAs[Int]("funnel_depth") == 1, "pre-view purchase advances nothing")
    assert(out(3L).getAs[Long]("t_purchase") == 40L, "purchase before the click must not count")
    assert(out(3L).getAs[Int]("funnel_depth") == 3)
  }

  test("parameterized step list: a 4-step funnel is the same operator, not a fixture") {
    // signup → view → click → purchase
    // user 1: full in-order chain, with a decoy purchase before its click
    // user 2: enters at view (no signup) → absent: step 1 anchors
    // user 3: signup then view, click BEFORE the view → depth 2
    val out = RelationalQueries.funnelSteps(ev(
      (1L, "signup", 5L), (1L, "view", 10L), (1L, "purchase", 15L),
      (1L, "click", 20L), (1L, "purchase", 30L),
      (2L, "view", 10L), (2L, "click", 20L), (2L, "purchase", 30L),
      (3L, "click", 8L), (3L, "signup", 9L), (3L, "view", 12L)),
      steps = Seq("signup", "view", "click", "purchase"))
      .collect().map(r => r.getLong(0) -> r).toMap

    assert(out.keySet == Set(1L, 3L), "only users entering at the first step appear")
    assert(out(1L).schema.fieldNames.toSeq ==
      Seq("user_id", "t_signup", "t_view", "t_click", "t_purchase", "funnel_depth"))
    assert(out(1L).getAs[Long]("t_click") == 20L &&
      out(1L).getAs[Long]("t_purchase") == 30L && out(1L).getAs[Int]("funnel_depth") == 4,
      "4-step chain must anchor each step strictly after the previous")
    assert(out(3L).getAs[Int]("funnel_depth") == 2 &&
      out(3L).isNullAt(out(3L).fieldIndex("t_click")),
      "pre-view click must not advance the 4-step funnel")
  }

  test("windowFunnel: a later anchor reaches deeper when the first anchor's window expires") {
    val W = 100L
    // user 1: first view's chain dies at the window (purchase at 150 >
    //         0+100), but the SECOND view anchors a full in-window
    //         chain — max-over-anchors must report 3 where a
    //         first-anchor-only funnel reports 2
    // user 2: full chain but the purchase lands exactly at t0+W+1 → 2
    // user 3: purchase BEFORE the click never counts → 2
    // user 4: click only, never views → absent
    val out = RelationalQueries.windowFunnel(ev(
      (1L, "view", 0L), (1L, "click", 10L), (1L, "view", 60L),
      (1L, "click", 80L), (1L, "purchase", 150L),
      (2L, "view", 0L), (2L, "click", 50L), (2L, "purchase", 101L),
      (3L, "view", 0L), (3L, "purchase", 20L), (3L, "click", 40L),
      (4L, "click", 10L)),
      windowMicros = W)
      .collect().map(r => r.getLong(0) -> r.getAs[Int]("funnel_level")).toMap
    assert(out == Map(1L -> 3, 2L -> 2, 3L -> 2),
      s"windowFunnel semantics broken: $out")
  }

  test("default step list reproduces the original 3-step schema") {
    val out = RelationalQueries.funnelSteps(ev((1L, "view", 10L)))
    assert(out.schema.fieldNames.toSeq ==
      Seq("user_id", "t_view", "t_click", "t_purchase", "funnel_depth"))
  }
}
