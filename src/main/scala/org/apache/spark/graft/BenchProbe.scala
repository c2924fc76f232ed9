package org.apache.spark.graft

import java.util.concurrent.atomic.LongAdder

import org.apache.spark.SparkContext
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** Per-query task-metric aggregation for `graft.Bench`.
  *
  * A timing alone cannot distinguish "the plan got slower" from "the host
  * got slower" (GC pressure, disk contention, noisy neighbor) — exactly the
  * ambiguity that left round 5's q27 regression unexplained. This listener
  * accumulates the task-level counters that tell those cases apart: CPU vs
  * wall run time (contention), GC time (heap pressure), shuffle and spill
  * bytes (plan shape / memory fit).
  *
  * Lives under `org.apache.spark` only for `listenerBus.waitUntilEmpty`
  * (the accessor is `private[spark]`); everything recorded comes from the
  * public `SparkListener` API.
  */
class BenchProbe extends SparkListener {
  private val runMs, cpuNanos, gcMs, shufReadB, shufWriteB, spillB, tasks = new LongAdder

  override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
    val m = t.taskMetrics
    if (m != null) {
      tasks.add(1)
      runMs.add(m.executorRunTime)
      // accumulate NANOS: per-task ms truncation would zero out the many
      // sub-millisecond tasks the 4 MB-split bench runs, making CPU-bound
      // queries look like pure scheduling overhead
      cpuNanos.add(m.executorCpuTime)
      gcMs.add(m.jvmGCTime)
      shufReadB.add(m.shuffleReadMetrics.totalBytesRead)
      shufWriteB.add(m.shuffleWriteMetrics.bytesWritten)
      spillB.add(m.memoryBytesSpilled + m.diskBytesSpilled)
    }
  }

  /** Drain the listener bus, then snapshot-and-reset all counters. */
  def harvest(sc: SparkContext): Map[String, Long] = {
    try sc.listenerBus.waitUntilEmpty(10000L)
    catch { case _: java.util.concurrent.TimeoutException => () }
    val out = Map(
      "tasks" -> tasks.sumThenReset(),
      "run_ms" -> runMs.sumThenReset(),
      "cpu_ms" -> cpuNanos.sumThenReset() / 1000000L,
      "gc_ms" -> gcMs.sumThenReset(),
      "shuffle_read_b" -> shufReadB.sumThenReset(),
      "shuffle_write_b" -> shufWriteB.sumThenReset(),
      "spill_b" -> spillB.sumThenReset())
    out
  }

  def install(sc: SparkContext): Unit = sc.addSparkListener(this)
}

object BenchProbe {
  /** Drain the shared listener bus (QueryExecutionListener events ride the
    * same bus) — lets tests observe asynchronously-delivered plans.
    */
  def drain(sc: SparkContext): Unit =
    try sc.listenerBus.waitUntilEmpty(10000L)
    catch { case _: java.util.concurrent.TimeoutException => () }
}
