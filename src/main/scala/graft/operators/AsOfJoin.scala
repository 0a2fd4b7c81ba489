package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * As-of (backward) join: for each left row, the right row with the same
 * key and the greatest right.ts <= left.ts.
 *
 * Spark lacks this operator; the naive range join explodes. This
 * implementation is the scalable union-and-carry-forward pattern:
 * tag both inputs, hash-partition by key, sort by (ts, side) within
 * partitions (right first at equal ts → inclusive match), and
 * carry the last right row forward with a window `last(ignoreNulls)`.
 * Cost: ONE shuffle + sort — the same shape as a sort-merge join,
 * independent of time-range density, so it survives 100 TB.
 *
 * Skew: one window partition per key means a pathologically hot key
 * serializes into one task — the same skew profile as a sort-merge
 * join on that key. AQE's skew handling cannot split a window
 * partition (unlike a join), so for corpora with a dominating key,
 * pre-split it by a coarse time bucket ((key, epoch-day) as the window
 * key, carrying the previous bucket's last right row in) or route the
 * hot key through [[RangeJoin.intervalJoin]] with per-bucket keys.
 */
object AsOfJoin {

  /**
   * @param left      probe side; all its columns are kept
   * @param right     reference side; `rightVals` columns are appended
   *                  (null where no right row is at or before left.ts)
   * @param keys      equi-join key column names (same names both sides)
   * @param leftTs    left ordering column (numeric or timestamp)
   * @param rightTs   right ordering column
   * @param rightVals right columns to carry (renamed as given)
   */
  def backward(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTs: String, rightTs: String,
               rightVals: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val lStruct = left.select(leftCols.map(col): _*).schema
    val rStruct = right.select(rightVals.map(col): _*).schema
    val l = left.select(
      keys.map(col) ++ Seq(
        col(leftTs).as("__ts"), lit(1).as("__side"),
        struct(leftCols.map(col): _*).as("__l"),
        lit(null).cast(rStruct).as("__r")): _*)
    val r = right.select(
      keys.map(col) ++ Seq(
        col(rightTs).as("__ts"), lit(0).as("__side"),
        lit(null).cast(lStruct).as("__l"),
        struct(rightVals.map(col): _*).as("__r")): _*)
    val combined = l.unionByName(r)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = combined
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    matched.select(
      leftCols.map(c => col("__l").getField(c).as(c)) ++
        rightVals.map(c => col("__m").getField(c).as(c)): _*)
  }
}
