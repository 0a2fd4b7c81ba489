package graft.operators

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Encoders, Row}
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
 * ONE task): two-pass distributed scan instead. Pass 1 range-partitions
 * by id and aggregates one token total per partition (`parts` rows of
 * driver metadata — the MLlib-centroid stance); pass 2 turns those into
 * exclusive partition offsets and streams each sorted partition once,
 * accumulating locally. Total cost: one range shuffle + one tiny agg —
 * same shape at 100 TB, no driver data materialization, no skew
 * (ranges are sampled to balance).
 */
object Packing {

  /**
   * @param capacity bin token budget
   * @param parts    range partitions (≅ parallelism of the scan)
   * @return (id, tokens, bin) — deterministic: depends only on the
   *         id order and token counts, not on `parts` or cluster shape
   */
  def packBins(df: DataFrame, id: String, tokens: String, capacity: Long,
               parts: Int = 32): DataFrame = {
    require(capacity > 0, "capacity must be positive")
    val spark = df.sparkSession
    val ranged = df.select(col(id), col(tokens).cast("long").as("__tok"))
      .repartitionByRange(parts, col(id))
      .sortWithinPartitions(col(id))
    // pass 1: per-partition token totals — `parts` rows on the driver
    val sums = ranged.groupBy(spark_partition_id().as("pid"))
      .agg(sum(col("__tok")).as("t")).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val offsets = (0 until parts).map(p => sums.getOrElse(p, 0L))
      .scanLeft(0L)(_ + _).take(parts).toArray
    val bc = spark.sparkContext.broadcast(offsets)
    // pass 2: stream each sorted partition once with a running total
    val schema = StructType(ranged.schema.fields.dropRight(1) ++
      Seq(StructField(tokens, LongType, nullable = false),
        StructField("bin", LongType, nullable = false)))
    implicit val enc: org.apache.spark.sql.Encoder[Row] = Encoders.row(schema)
    ranged.mapPartitions { it =>
      var cum = bc.value(TaskContext.getPartitionId())
      it.map { r =>
        val t = r.getLong(r.length - 1)
        val bin = cum / capacity
        cum += t
        Row.fromSeq(r.toSeq.dropRight(1) ++ Seq(t, bin))
      }
    }
  }
}
