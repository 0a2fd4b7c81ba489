package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Event-sequence analytics: ordered funnels and cohort retention —
 * the high-cardinality behavioral rollups a large event stream is
 * usually asked for.
 *
 * Both are single-pass formulations: the funnel is ONE per-user
 * window shuffle (sequential running-min windows over the same sort —
 * Spark sorts once and chains the Window operators), retention is two
 * hash aggregations and one user-keyed join. Neither materializes
 * per-user event arrays, so per-user state never exceeds a handful of
 * longs regardless of how hot a user is.
 */
object Funnel {

  /**
   * Ordered funnel with a per-step deadline: a user reaches stage i
   * (i > 0) if some `stages(i)` event happens within `withinUs`
   * micros AFTER the user's earliest qualifying stage(i-1) event.
   * Stage 0 is the entry event. Ties in `usCol` are broken by
   * `tieCol` (must be unique per row for cross-engine determinism).
   *
   * Returns one row per stage: (stage, n_users) where stage is
   * "NN_<name>" (NN = stage index zero-padded to 2 digits, so
   * lexicographic sort IS funnel order through 99 stages).
   *
   * Scale: exactly one Exchange (hash by user) + one sort; the k
   * running-min windows reuse that sort. The final count is a k-row
   * aggregate, unpivoted with ONE stack() over the one-row aggregate
   * (a union of k selects would reference — and without exchange
   * reuse, recompute — the per-user aggregation subtree k times).
   */
  def funnel(events: DataFrame, user: String, usCol: String, tieCol: String,
             typeCol: String, stages: Seq[String], withinUs: Long): DataFrame = {
    require(stages.nonEmpty, "need at least one stage")
    val w = Window.partitionBy(user).orderBy(col(usCol), col(tieCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    var df = events
    stages.zipWithIndex.foreach { case (s, i) =>
      val qual =
        if (i == 0) when(col(typeCol) === s, col(usCol))
        else when(col(typeCol) === s && col(s"__q${i - 1}").isNotNull &&
          col(usCol) - col(s"__q${i - 1}") <= withinUs, col(usCol))
      df = df.withColumn(s"__q$i", min(qual).over(w))
    }
    val flags = stages.indices.map(i =>
      max(when(col(s"__q$i").isNotNull, 1L).otherwise(0L)).as(s"__f$i"))
    val perUser = df.groupBy(col(user)).agg(flags.head, flags.tail: _*)
    val counts = stages.indices.map(i =>
      sum(col(s"__f$i")).cast("long").as(s"__n$i"))
    val one = perUser.agg(counts.head, counts.tail: _*)
    val pairs: Seq[Column] = stages.zipWithIndex.flatMap { case (s, i) =>
      Seq(lit(f"${i + 1}%02d_$s"), col(s"__n$i"))
    }
    one.select(stack((lit(stages.size) +: pairs): _*))
      .toDF("stage", "n_users")
  }

  /**
   * Cohort retention: cohort = the user's first `cohortType` event
   * bucketed to `bucketUs`; a user counts in (cohort, offset) if they
   * have ANY event in bucket cohort+offset, for offsets 0..maxOffset.
   *
   * Returns (cohort, offset, n_users) — the classic retention
   * triangle, all-integer arithmetic (exact on any engine).
   *
   * Scale: first-event-per-user and distinct (user, bucket) are each
   * one partial-agg Exchange on user; the join is user-keyed; the
   * final rollup has at most cohorts × (maxOffset+1) rows.
   */
  def retention(events: DataFrame, user: String, usCol: String,
                typeCol: String, cohortType: String, bucketUs: Long,
                maxOffset: Int): DataFrame = {
    val cohorts = events.filter(col(typeCol) === cohortType)
      .groupBy(col(user))
      .agg(floor(min(col(usCol)) / bucketUs).cast("long").as("cohort"))
    val active = events
      .select(col(user), floor(col(usCol) / bucketUs).cast("long").as("bucket"))
      .distinct()
    cohorts.join(active, user)
      .withColumn("offset", (col("bucket") - col("cohort")).cast("long"))
      .filter(col("offset") >= 0 && col("offset") <= maxOffset)
      .groupBy(col("cohort"), col("offset"))
      .agg(count(lit(1)).as("n_users"))
  }
}
