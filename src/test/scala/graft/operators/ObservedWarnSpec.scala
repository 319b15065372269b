package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The lazy cap-warning service's lifecycle guarantees: a zero report
  * does not disarm the renderer, the pending map is bounded, and the
  * session registry does not pin stopped/dropped sessions. */
class ObservedWarnSpec extends SparkSpec {
  import spark.implicits._

  private def poll(deadlineMs: Long = 10000)(cond: => Boolean): Boolean = {
    val end = System.nanoTime() + deadlineMs * 1000000L
    var ok = cond
    while (!ok && System.nanoTime() < end) { Thread.sleep(50); ok = cond }
    ok
  }

  test("an n == 0 report keeps the renderer armed; an n > 0 report " +
      "logs once and disarms") {
    ObservedWarn.clearFired("ow_spec_zero")
    // non-empty output (AQE keeps CollectMetrics) with a zero metric
    val df0 = ObservedWarn(
      Seq(1L, 2L, 3L).toDF("x"), "ow_spec_zero",
      sum(when(col("x") > 100L, 1L).otherwise(0L)),
      n => s"ow_spec_zero: $n")
    assert(ObservedWarn.pendingContains("ow_spec_zero"))
    df0.count()
    assert(poll()(ObservedWarn.lastFired("ow_spec_zero").contains(0L)),
      "zero metric must still report (listener is async)")
    assert(ObservedWarn.pendingContains("ow_spec_zero"),
      "a zero report must NOT consume the renderer")

    ObservedWarn.clearFired("ow_spec_pos")
    val df1 = ObservedWarn(
      Seq(1L, 200L, 300L).toDF("x"), "ow_spec_pos",
      sum(when(col("x") > 100L, 1L).otherwise(0L)),
      n => s"ow_spec_pos: $n")
    df1.count()
    assert(poll()(ObservedWarn.lastFired("ow_spec_pos").contains(2L)))
    assert(poll()(!ObservedWarn.pendingContains("ow_spec_pos")),
      "a logged warning must disarm its renderer (one-shot per name)")
  }

  test("pending renderers for never-executed frames are FIFO-bounded") {
    val df = Seq(1L).toDF("x")
    // plan-only frames: nothing ever executes these observations
    (1 to 4200).foreach { i =>
      ObservedWarn(df, "ow_spec_flood", sum(col("x")), n => s"flood: $n")
    }
    assert(ObservedWarn.pendingSize <= 4096,
      s"pending must stay bounded, saw ${ObservedWarn.pendingSize}")
  }

  test("a FIFO eviction at the cap is observable (counter + debug log), " +
      "not silent") {
    // drive the map to its cap directly (no observe plans needed) and
    // push one past it: exactly the overflow inserts must evict
    val base = ObservedWarn.evictionCount
    (1 to 4200).foreach { i =>
      ObservedWarn.putRenderer(s"ow_spec_evict#$i", n => s"evict: $n")
    }
    assert(ObservedWarn.pendingSize <= 4096)
    assert(ObservedWarn.evictionCount > base,
      "filling past the cap must record evictions, not drop silently")
  }

  test("evictions are ATTRIBUTED per renderer prefix — the deployment " +
      "can see WHICH operator's warnings are being lost") {
    // two distinct call-site prefixes flood the FIFO; each must be
    // charged its own evictions, with counts separating cleanly
    val baseA = ObservedWarn.evictionCount("ow_spec_attr_a")
    val baseB = ObservedWarn.evictionCount("ow_spec_attr_b")
    (1 to 4200).foreach { i =>
      ObservedWarn.putRenderer(s"ow_spec_attr_a#$i", n => s"a: $n")
    }
    // the a-flood saturated the FIFO: the b-flood now evicts on every
    // insert, and the early evictions it forces are charged to the
    // still-armed a-renderers ahead of it, not to b
    (1 to 100).foreach { i =>
      ObservedWarn.putRenderer(s"ow_spec_attr_b#$i", n => s"b: $n")
    }
    val aEvicted = ObservedWarn.evictionCount("ow_spec_attr_a") - baseA
    assert(aEvicted >= 100L,
      s"the a-prefix must be charged the FIFO-head evictions its " +
        s"flood plus the b-flood forced, saw $aEvicted")
    assert(ObservedWarn.evictionCount("ow_spec_attr_b") == baseB,
      "b's renderers sit at the FIFO tail — none evicted yet, so " +
        "none may be charged to b")
    assert(ObservedWarn.evictionCount("ow_spec_never_inserted") == 0L)
  }

  test("the session registry holds sessions WEAKLY — a dropped cloned " +
      "session becomes collectable") {
    val before = ObservedWarn.registeredCount
    // register a clone inside a method scope so no local ref survives
    def registerClone(): Unit = {
      val s2 = spark.newSession()
      val df2 = s2.createDataFrame(Seq(Tuple1(1L))).toDF("x")
      ObservedWarn(df2, "ow_spec_weak", sum(col("x")), n => s"weak: $n")
      ()
    }
    registerClone()
    assert(ObservedWarn.registeredCount >= before + 1,
      "clone must register its own listener entry")
    org.apache.spark.sql.SparkSession.clearActiveSession()
    val collected = poll(20000) {
      System.gc()
      ObservedWarn.registeredCount <= before
    }
    assert(collected,
      "a dropped session must be collectable from the weak registry " +
        s"(still ${ObservedWarn.registeredCount}, baseline $before)")
  }
}
