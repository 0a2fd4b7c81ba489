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

  /** Shared two-pass skeleton: range-partition by id (deterministic
    * literal boundaries), sort within partitions, and compute exclusive
    * per-partition prefix offsets. Returns the ranged frame (id, __tok)
    * and the partition offset table for the streaming pass. */
  private def rangedPrefix(df: DataFrame, id: String, tokens: String,
                           parts: Int): (DataFrame, Array[Long]) = {
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
    // length parts + 1: offsets(p) = exclusive start of partition p,
    // offsets(parts) = the grand total
    val offsets = (0 until parts).map(p => sums.getOrElse(p, 0L))
      .scanLeft(0L)(_ + _).toArray
    (ranged, offsets)
  }

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
    val (ranged, offsets) = rangedPrefix(df, id, tokens, parts)
    val bc = spark.sparkContext.broadcast(offsets)
    // pass 2: stream each sorted partition once with a running total
    val outSchema = StructType(Seq(ranged.schema.fields(0),
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

  /**
   * Systematic PPS (probability-proportional-to-size) sampling: pick
   * ~`m` documents with inclusion proportional to token count — the
   * token-budgeted corpus subsample ("give me an m-document sample
   * whose selection chance tracks how much a doc contributes to
   * training"). The classic survey-sampling construction: lay all W
   * tokens on a line in id order, drop a grid of points spaced
   * step = ⌊W/m⌋ apart at a hash-derived offset, and keep each doc once
   * per grid point inside its token interval [c_i, c_i + w_i) — docs
   * longer than `step` get a proportional multiplicity (`copies`),
   * exactly like [[graft.operators.Sampling.mixtureUpsample]]'s epochs.
   *
   * Everything is 64-bit integer arithmetic over the same two-pass
   * prefix sum as [[packBins]] (never a single-partition window), plus
   * one tiny total aggregate — so the sample is deterministic,
   * partitioning-independent, and cross-engine EXACT: the DuckDB oracle
   * recomputes the grid with integer division and matches hash-for-hash.
   *
   * @param m target sample size (grid count is in [m, m + m) of it;
   *          exact count = ⌈(W − off) / step⌉)
   * @return (id, tokens, copies) for rows with copies ≥ 1
   */
  def ppsSample(df: DataFrame, id: String, tokens: String, m: Int,
                salt: String = "pps", parts: Int = 32): DataFrame = {
    require(m > 0, "m must be positive")
    val spark = df.sparkSession
    val (ranged, offsets) = rangedPrefix(df, id, tokens, parts)
    val total = offsets.last
    val step = math.max(1L, total / m)
    // hash-derived grid offset in [0, step): md5 of the salt, exactly
    // Sampling.hashBucket's recipe, so the oracle reproduces it
    val off = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(salt.getBytes("UTF-8")).take(4)
        .map(b => f"$b%02x").mkString, 16) % step
    val bc = spark.sparkContext.broadcast(offsets)
    val outSchema = StructType(Seq(ranged.schema.fields(0),
      StructField(tokens, LongType, nullable = false),
      StructField("copies", LongType, nullable = false)))
    implicit val enc: org.apache.spark.sql.Encoder[Row] = Encoders.row(outSchema)
    // f(x) = #grid points < x; copies_i = f(c_i + w_i) − f(c_i)
    def gridBefore(x: Long): Long =
      if (x <= off) 0L else 1L + (x - 1 - off) / step
    ranged.mapPartitions { it =>
      var cum = bc.value(TaskContext.getPartitionId())
      it.flatMap { r =>
        val t = r.getLong(1)
        val copies = gridBefore(cum + t) - gridBefore(cum)
        cum += t
        if (copies > 0) Some(Row(r.get(0), t, copies)) else None
      }
    }
  }
}
