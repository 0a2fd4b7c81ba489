package graft.sources

import graft.Slice
import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Bucketed tables — the co-located-join scale path. At 100 TB the
 * dominant cost of a fact⋈fact join is shuffling both sides; writing
 * each side bucketed (and sorted) by the join key once lets every
 * subsequent join run with ZERO Exchange: Spark matches the bucket
 * spec to the join's required HashClusteredDistribution and skips the
 * shuffle (and with sortBy, the sort). This is the Spark-native
 * analog of the reference pre-partitioning data through Reshuffle and
 * relying on Dep{Shuffle:true} alignment (reshuffle.go:24-42,
 * exec/compile.go:301-316) — except persisted across jobs.
 *
 * Bucketed tables live in the session catalog (in-memory catalog +
 * parquet files under spark.sql.warehouse.dir; no Hive required).
 */
object Bucketing {

  /** Write `df` as a bucketed, bucket-sorted parquet table.
    * Pre-repartitioning on the bucket keys gives one file per bucket:
    * without it every writer task emits a file per bucket (task×bucket
    * small-files blowup at scale) AND the scan loses its sorted-output
    * guarantee (FileSourceScanExec only declares outputOrdering for
    * single-file buckets), reintroducing a Sort before every join. */
  def writeBucketed(df: DataFrame, table: String, nBuckets: Int,
                    keys: Seq[String]): Unit =
    df.repartition(nBuckets, keys.map(df.col): _*)
      .write.mode(SaveMode.Overwrite).format("parquet")
      .bucketBy(nBuckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .saveAsTable(table)

  /** [[writeBucketed]] as an EXTERNAL table at an explicit path — the
    * form persistent indexes want: the bucket-named parquet files live
    * under `path` (surviving the session), while the bucket spec is
    * registered in the catalog for shuffle-free probing. A later
    * session re-attaches the same files with
    * `CREATE TABLE … CLUSTERED BY … LOCATION` (see
    * [[graft.operators.MinhashIndex]]). */
  def writeBucketedAt(df: DataFrame, table: String, nBuckets: Int,
                      keys: Seq[String], path: String): Unit = {
    df.sparkSession.sql(s"DROP TABLE IF EXISTS `$table`")
    df.repartition(nBuckets, keys.map(df.col): _*)
      .write.mode(SaveMode.Overwrite).format("parquet")
      .bucketBy(nBuckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .option("path", path)
      .saveAsTable(table)
  }

  /** Read a catalog table back as a Slice keyed by `prefix`. */
  def readTable(spark: SparkSession, table: String, prefix: Int = 1): Slice =
    Slice(spark.table(table), prefix)

  /**
   * Join two tables bucketed on their join keys. With matching bucket
   * counts the physical plan contains no Exchange on either side
   * (asserted in BucketingSpec) — the join is executor-local per
   * bucket, which is what co-location must look like at scale.
   */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
                   keys: Seq[String], kind: String = "inner"): DataFrame =
    spark.table(left).join(spark.table(right), keys, kind)

  /**
   * 2-D Z-value: bit-interleave the low `bits` bits of two
   * non-negative integer columns (a's bit i → z bit 2i, b's bit i →
   * z bit 2i+1). Sorting by z clusters rows that are close in BOTH
   * dimensions — the multi-column data-clustering key for layouts
   * where queries range-filter on either column. Pure integer column
   * algebra (codegen'd, engine-replicable → oracle-checkable).
   */
  def zValue(a: Column, b: Column, bits: Int = 16): Column =
    zValueN(Seq(a -> bits, b -> bits))

  /**
   * d-dimensional Z-value with PER-DIMENSION bit budgets — the general
   * clustering key: each `(column, bits)` contributes its low `bits`
   * bits, interleaved round-robin from the low end (bit level 0 of
   * every dimension first, in argument order, then level 1, …);
   * dimensions whose budget is exhausted drop out of later rounds, so
   * a high-cardinality column can spend 20 bits while a coarse one
   * spends 8 and the interleave stays balanced where budgets overlap.
   * `zValue(a, b, k)` ≡ `zValueN(Seq(a -> k, b -> k))` bit for bit.
   * Budgets must sum to ≤ 63 (the z stays a non-negative long). Same
   * pure integer algebra as the 2-D form — codegen'd and
   * oracle-checkable.
   */
  def zValueN(dims: Seq[(Column, Int)]): Column = {
    require(dims.nonEmpty, "zValueN needs at least one dimension")
    require(dims.forall(_._2 >= 1), "every bit budget must be >= 1")
    require(dims.map(_._2).sum <= 63,
      s"bit budgets sum to ${dims.map(_._2).sum}, max 63")
    val maxBits = dims.map(_._2).max
    val parts = Seq.newBuilder[Column]
    var out = 0
    for (level <- 0 until maxBits; (c, b) <- dims) {
      if (level < b) {
        parts += shiftleft(
          shiftright(c.cast("long"), level).bitwiseAND(lit(1L)), out)
        out += 1
      }
    }
    parts.result().reduce(_.bitwiseOR(_))
  }

  /**
   * Z-ordered parquet layout: range-partition by z-value into nFiles
   * disjoint z-ranges, sort within each, write. Each file then holds a
   * contiguous z-region, so its parquet column stats (min/max of BOTH
   * interleaved dimensions) are narrow — range predicates on either
   * column skip most files/row groups at scan time, without
   * Hive-partitioning on either. The write is one range Exchange; at
   * 100 TB, nFiles tracks total size / target file size.
   */
  def writeZOrdered(df: DataFrame, dir: String, z: Column,
                    nFiles: Int): Unit =
    df.repartitionByRange(nFiles, z)
      .sortWithinPartitions(z)
      .write.mode(SaveMode.Overwrite).parquet(dir)
}
