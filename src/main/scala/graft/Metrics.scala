package graft

import org.apache.spark.SparkContext
import org.apache.spark.util.LongAccumulator

/**
 * Imperative user counters (≅ the reference's metrics.Counter /
 * metrics.Scope, metrics/metrics.go:57-93): named counters a user
 * function can bump from inside `map`/`flatMap`/`filterF`/
 * `writerFunc` closures — the way bigslice users actually count
 * malformed records — with values readable on the driver after the
 * action. [[Slice.observed]] remains the declarative form for
 * Column-expressible metrics; this is the escape hatch for arbitrary
 * closure logic.
 *
 * Built on Spark's [[LongAccumulator]]: updates merge per task on the
 * driver, exactly the reference's per-task metrics merge
 * (exec/task.go scope merging). Same caveat as the reference AND as
 * Spark itself: updates from inside TRANSFORMATIONS may be re-applied
 * if a task is retried or a stage recomputed — treat counts as
 * at-least-once diagnostics, not billing. (Counts from within
 * actions' final stage are exactly-once; Spark dedupes those.)
 */
object Metrics {

  /** A named long counter, serializable into executor closures. */
  final class Counter private[Metrics] (acc: LongAccumulator)
      extends Serializable {
    def incr(): Unit = acc.add(1L)
    def incr(n: Long): Unit = acc.add(n)
    /** Driver-side read of the merged value (call after the action). */
    def value: Long = acc.value
    def name: String = acc.name.getOrElse("")
    /** Driver-side reset (e.g. between runs of the same pipeline). */
    def reset(): Unit = acc.reset()
  }

  /** Register a new counter with the session's SparkContext. Counters
    * are cheap driver-registered objects; create one per metric, close
    * over it in user functions. */
  def counter(sc: SparkContext, name: String): Counter =
    new Counter(sc.longAccumulator(name))
}
