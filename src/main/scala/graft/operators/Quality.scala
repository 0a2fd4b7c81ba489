package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Row-level data-quality gates — the "expectations" pattern for
 * ingest pipelines: declare named predicates, tag every row with the
 * rules it violates, split the stream into a clean table and a
 * quarantine (kept WITH its violation reasons for triage/backfill,
 * never silently dropped). Pure column algebra: evaluation is
 * scan-speed, one pass, no shuffle; the split is two filters over the
 * same tagged frame, so a persisted tag frame costs one scan total.
 *
 * A predicate evaluating to NULL (e.g. a rule over a missing value)
 * counts as a violation — quality gates must fail closed.
 */
object Quality {

  /** Tag each row with the names of the rules it violates (empty
    * array = clean). Rule order is preserved in the array. */
  def withViolations(df: DataFrame,
                     rules: Seq[(String, Column)]): DataFrame = {
    val tags = rules.map { case (name, pred) =>
      when(!coalesce(pred, lit(false)), lit(name))
    }
    df.withColumn("violations", array_compact(array(tags: _*)))
  }

  /** (clean, quarantined) split; quarantined rows keep `violations`. */
  def quarantine(df: DataFrame,
                 rules: Seq[(String, Column)]): (DataFrame, DataFrame) = {
    val tagged = withViolations(df, rules)
    (tagged.filter(size(col("violations")) === 0).drop("violations"),
      tagged.filter(size(col("violations")) > 0))
  }

  /**
   * Column-level table profile — the ANALYZE/monitoring face of quality
   * gating: per column, row count, null count, exact distinct count,
   * and min/max rendered as strings. One row per profiled column.
   *
   * Shape at scale: the count/null/min/max block is ONE pass over the
   * table (a single agg, all columns' partials fused into one
   * map-side combine); the exact distinct counts go through Spark's
   * expand-based multi-distinct rewrite, which shuffles (col-tag,
   * value) pairs — one Exchange total, keyed finely enough that no
   * reducer sees more than one column's domain. For very-high-cardinality
   * monitoring at 100 TB, swap `countDistinct` for
   * `approx_count_distinct` via `exact = false`.
   */
  def profile(df: DataFrame, cols: Seq[String],
              exact: Boolean = true): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val aggs = cols.flatMap { c =>
      // coalesce: sum over ZERO rows is NULL, and getLong below unboxes
      Seq(count(lit(1)).as(s"${c}__n"),
        coalesce(sum(when(col(c).isNull, 1L).otherwise(0L)), lit(0L))
          .as(s"${c}__nulls"),
        (if (exact) countDistinct(col(c))
         else approx_count_distinct(col(c))).as(s"${c}__distinct"),
        min(col(c)).cast("string").as(s"${c}__min"),
        max(col(c)).cast("string").as(s"${c}__max"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    val out = cols.zipWithIndex.map { case (c, i) =>
      val b = i * 5
      (c, row.getLong(b), row.getLong(b + 1), row.getLong(b + 2),
        Option(row.getString(b + 3)), Option(row.getString(b + 4)))
    }
    spark.createDataset(out)
      .toDF("col_name", "n", "nulls", "n_distinct", "min_v", "max_v")
  }
}
