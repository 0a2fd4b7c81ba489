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
}
