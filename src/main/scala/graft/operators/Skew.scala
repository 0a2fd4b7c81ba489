package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Skew mitigation: two-phase "salted" aggregation. Hot keys that would
 * overload one reducer are split across `nSalts` sub-keys; phase 1
 * aggregates (key, salt) partitions, phase 2 merges per key. Use when
 * AQE's skew handling isn't enough (e.g. a single key holding >1
 * executor's worth of rows at 100 TB).
 */
object Skew {

  /**
   * @param partial per-(key,salt) aggregate columns (must be aliased)
   * @param merge   per-key merge of the partial columns (same aliases)
   */
  def saltedAgg(df: DataFrame, keys: Seq[String], nSalts: Int)(
      partial: Seq[Column], merge: Seq[Column]): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(xxhash64(struct(df.columns.map(col): _*)), lit(nSalts.toLong)))
    salted.groupBy((keys :+ "__salt").map(col): _*)
      .agg(partial.head, partial.tail: _*)
      .groupBy(keys.map(col): _*)
      .agg(merge.head, merge.tail: _*)
  }

  /**
   * Skew-safe equi-join: hot LEFT keys are spread across `nSalts`
   * sub-keys while the right side replicates once per salt, so a key
   * holding more rows than one executor's share fans across nSalts
   * reducers instead of serializing into one. Exact inner-join
   * semantics (each left row carries ONE salt; the right row for its
   * key exists at every salt). Use when AQE's skew-join splitting
   * can't apply — extreme single-key skew, or a disabled-AQE context;
   * cost = nSalts× replication of the RIGHT side only, so salt the
   * side with the smaller per-key payload.
   */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                 nSalts: Int): DataFrame = {
    val l = left.withColumn("__salt",
      pmod(xxhash64(struct(left.columns.map(col): _*)), lit(nSalts.toLong))
        .cast("int"))
    val r = right.withColumn("__salt",
      explode(sequence(lit(0), lit(nSalts - 1))))
    l.join(r, keys :+ "__salt").drop("__salt")
  }

  /**
   * Skew-safe GROUP TOP-K: first-n rows per group under `order`,
   * exact, without ever sorting a whole hot group in one task. The
   * naive `row_number().over(partitionBy(group))` serializes each
   * group into a single partition — a 60%-of-corpus group at 100 TB
   * is a single 60 TB sort. Here phase 1 takes the per-(group, salt)
   * top-n (hot groups fan across nSalts tasks), phase 2 re-ranks the
   * ≤ nSalts·n survivors per group — exact because the global top-n
   * of a group is contained in the union of its per-salt top-n.
   *
   * `order` must be a total order (break ties — e.g. append a unique
   * id) for deterministic output. Output = input columns + `rankCol`.
   */
  def groupTopK(df: DataFrame, groupCols: Seq[String], order: Seq[Column],
                n: Int, nSalts: Int = 16,
                rankCol: String = "rk"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val salted = df.withColumn("__salt",
      pmod(xxhash64(struct(df.columns.map(col): _*)), lit(nSalts.toLong)))
    val w1 = Window.partitionBy((groupCols :+ "__salt").map(col): _*)
      .orderBy(order: _*)
    val w2 = Window.partitionBy(groupCols.map(col): _*).orderBy(order: _*)
    salted.withColumn("__rk1", row_number().over(w1))
      .filter(col("__rk1") <= n)
      .withColumn(rankCol, row_number().over(w2))
      .filter(col(rankCol) <= n)
      .drop("__salt", "__rk1")
  }
}
