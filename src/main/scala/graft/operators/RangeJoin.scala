package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Range (interval) join: pair each right point with every left
 * interval of the same key containing it — `l.start <= r.ts < l.end`.
 *
 * Spark plans a raw range predicate as BroadcastNestedLoopJoin (or a
 * cartesian per key) — O(|L|×|R|) per key, dead at scale. The binned
 * formulation turns it into an EQUI-join: intervals explode to the
 * fixed-width buckets they overlap (bounded by maxSpan/bucketWidth per
 * row), points map to one bucket, the join runs hash-partitioned on
 * (key, bucket), and the exact range predicate filters residual
 * candidates. Cost ∝ matches + bucket collisions, one shuffle each
 * side — the standard interval-bucketing trade (cf. Spark's own
 * storage-partitioned range joins and interval-join literature).
 */
object RangeJoin {

  /**
   * @param left  intervals: (keys…, startCol, endCol, payload…)
   * @param right points:    (keys…, tsCol, payload…)
   * @param keys  equi-key column names present on both sides
   * @param bucketWidth bucket width in the ts unit (e.g. epoch-us/day)
   * @return left ⋈ right rows where start <= ts < end (all columns)
   */
  def intervalJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                   startCol: String, endCol: String, tsCol: String,
                   bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    // Degenerate/inverted intervals (end <= start) match no point, but
    // an unguarded sequence(lo, hi) with hi < lo auto-steps -1 and
    // silently explodes |start-end|/width spurious bucket rows (the
    // residual filter keeps results correct while the plan does wasted
    // quadratic-ish work). Drop them before exploding.
    val l = left.filter(col(endCol) > col(startCol)).withColumn("__bucket",
      explode(sequence(
        floor(col(startCol) / bucketWidth).cast("long"),
        floor((col(endCol) - 1) / bucketWidth).cast("long"))))
    val r = right.withColumn("__bucket",
      floor(col(tsCol) / bucketWidth).cast("long"))
    l.join(r, keys :+ "__bucket")
      .filter(col(tsCol) >= col(startCol) && col(tsCol) < col(endCol))
      .drop("__bucket")
  }
}
