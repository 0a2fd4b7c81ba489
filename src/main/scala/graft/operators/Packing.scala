package graft.operators

import org.apache.spark.TaskContext
import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/**
 * Sequence packing: assign documents (ordered by id) to fixed
 * token-budget bins — the batching step of a training-data pipeline
 * (each bin becomes one packed training sequence / shard).
 *
 * Definition: with documents in id order and S_i the EXCLUSIVE prefix
 * sum of token counts, doc i goes to bin floor(S_i / capacity) — the
 * classic greedy packing where a bin may overflow by at most one
 * document's tokens.
 *
 * Scale design — a global prefix sum WITHOUT a global single-partition
 * window (`Window.orderBy` with no partitionBy funnels the corpus into
 * ONE task): the two-pass distributed scan. Range boundaries are
 * computed ONCE as explicit quantiles of the id column and baked into
 * both passes as literals — deliberately NOT `repartitionByRange`,
 * whose boundary SAMPLING is seeded per RDD instantiation, so two jobs
 * over the same plan can disagree about which partition an edge row
 * lands in (observed as an off-by-one bin at a partition boundary at
 * sf0.1). Pass 1 aggregates one token total per partition (`parts`
 * rows of driver metadata — the MLlib-centroid stance); pass 2 turns
 * those into exclusive partition offsets and streams each sorted
 * partition once, accumulating locally. Rows within a shuffled
 * partition arrive in nondeterministic order, but ids are unique and
 * each partition is sorted before use, so both passes see identical
 * state. Cost: two bucket shuffles of an (id, token-count) projection +
 * one tiny agg — no corpus materialization between passes, no skew
 * (quantile buckets are balanced by construction).
 */
object Packing {

  /**
   * @param capacity bin token budget
   * @param parts    range partitions (≅ parallelism of the scan)
   * @return (id, tokens, bin) — deterministic: depends only on the
   *         id order and token counts, not on `parts` or cluster shape.
   *         `id` must be numeric, unique and non-null; `tokens`
   *         non-null.
   */
  def packBins(df: DataFrame, id: String, tokens: String, capacity: Long,
               parts: Int = 32): DataFrame = {
    require(capacity > 0, "capacity must be positive")
    val spark = df.sparkSession
    val base = df.select(col(id), col(tokens).cast("long").as("__tok"))
    // Deterministic range boundaries: approx quantiles of id (the
    // Greenwald-Khanna sketch has no RNG), one small extra job.
    val bounds: Array[Double] =
      if (parts <= 1) Array.empty
      else base.stat.approxQuantile(id,
        (1 until parts).map(_.toDouble / parts).toArray, 0.001)
    val bucket: Column =
      if (bounds.isEmpty) lit(0)
      else bounds.map(b =>
        when(col(id).cast("double") > lit(b), 1).otherwise(0))
        .reduce(_ + _)
    val sch = base.schema
    // bucket b → partition b EXACTLY (hash repartition would merge
    // buckets and break range contiguity); both instantiations of this
    // plan are deterministic because the boundaries are literals.
    def ranged: DataFrame = {
      val rdd = base.withColumn("__b", bucket).rdd
        .map(r => (r.getInt(2), Row(r.get(0), r.get(1))))
        .partitionBy(new org.apache.spark.Partitioner {
          override def numPartitions: Int = parts
          override def getPartition(key: Any): Int = key.asInstanceOf[Int]
        })
        .map(_._2)
      spark.createDataFrame(rdd, sch).sortWithinPartitions(col(id))
    }
    // pass 1: per-partition token totals — `parts` rows on the driver
    val sums = ranged.groupBy(spark_partition_id().as("pid"))
      .agg(sum(col("__tok")).as("t")).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val offsets = (0 until parts).map(p => sums.getOrElse(p, 0L))
      .scanLeft(0L)(_ + _).take(parts).toArray
    val bc = spark.sparkContext.broadcast(offsets)
    // pass 2: stream each sorted partition once with a running total
    val outSchema = StructType(Seq(sch.fields(0),
      StructField(tokens, LongType, nullable = false),
      StructField("bin", LongType, nullable = false)))
    implicit val enc: org.apache.spark.sql.Encoder[Row] = Encoders.row(outSchema)
    ranged.mapPartitions { it =>
      var cum = bc.value(TaskContext.getPartitionId())
      it.map { r =>
        val t = r.getLong(1)
        val bin = cum / capacity
        cum += t
        Row(r.get(0), t, bin)
      }
    }
  }
}
