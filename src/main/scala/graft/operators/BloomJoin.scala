package graft.operators

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.graft.shims
import org.apache.spark.sql.types.BinaryType
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Bloom-filter semi-join reduction — THE join-side pruning trick for
 * 100 TB facts: build a Bloom filter over the (small) build side's
 * join keys, pre-filter the fact side BEFORE its shuffle, then run
 * the real join to drop the Bloom's false positives. The fact rows
 * that shuffle are only those that (probably) have a partner — on a
 * selective build side that is a 10-1000× shuffle reduction for the
 * cost of a few MB broadcast. Spark's own AQE injects this shape as
 * "runtime filtering" only for eligible shuffle-join patterns; this
 * operator makes it an explicit, composable primitive (usable in
 * front of aggregations, writes, or joins AQE can't see through).
 *
 * Exactness contract: the Bloom pass can only over-keep (false
 * positives, bounded by fpp), never drop a matching row, and the
 * verifying join removes the over-kept rows — so `semiJoinReduced`
 * returns exactly the plain semi-join result (oracle-checked as
 * op_bloom_join, and asserted against the unfiltered join in
 * ScaleSpec).
 *
 * Mechanics: the sketch is built distributed (partial per partition,
 * merged — `df.stat.bloomFilter` runs a treeAggregate), then embedded
 * as a binary literal in a native `BloomFilterMightContain` predicate
 * (codegen'd; the same expression Spark's runtime filtering plants),
 * so the probe-side filter runs inside whole-stage codegen, not a UDF.
 */
object BloomJoin {

  /** Serialized Bloom filter over the build side's LONG join key.
    * Driver-side bytes (a sketch — same legitimacy class as broadcast
    * hash relations; size set by expectedItems/fpp, not data size). */
  def buildFilter(build: DataFrame, key: String,
                  expectedItems: Long, fpp: Double): Array[Byte] = {
    val bf = build.stat.bloomFilter(col(key).cast("long"), expectedItems, fpp)
    val bos = new ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  /** `might_contain(filter, key)` as a native codegen'd predicate. */
  def mightContain(filterBytes: Array[Byte], key: Column): Column =
    shims.column(new BloomFilterMightContain(
      Literal(filterBytes, BinaryType),
      shims.expression(key.cast("long"))))

  /** Probe side pre-filtered by a Bloom filter of the build side's
    * keys: keeps every matching row, plus ≤ fpp false positives. */
  def bloomFiltered(probe: DataFrame, probeKey: String,
                    build: DataFrame, buildKey: String,
                    expectedItems: Long = 1000000L,
                    fpp: Double = 0.01): DataFrame =
    probe.filter(mightContain(buildFilter(build, buildKey, expectedItems, fpp),
      col(probeKey)))

  /**
   * Exact semi join with the fact-side shuffle bounded by the Bloom
   * pass: `probe SEMI JOIN build` where only Bloom-surviving probe
   * rows reach the join. Identical output to a plain semi join.
   */
  def semiJoinReduced(probe: DataFrame, probeKey: String,
                      build: DataFrame, buildKey: String,
                      expectedItems: Long = 1000000L,
                      fpp: Double = 0.01): DataFrame = {
    val pre = bloomFiltered(probe, probeKey, build, buildKey, expectedItems, fpp)
    pre.join(build.select(col(buildKey).as("__bk")).distinct(),
      pre(probeKey) === col("__bk"), "left_semi")
  }
}
