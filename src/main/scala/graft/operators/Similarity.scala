package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Similarity search over embedding columns (ARRAY<FLOAT>).
 *
 * Brute-force cosine top-k is the exact baseline (broadcast the query
 * set, never the corpus). The scale path is LSH bucketing (random
 * hyperplanes) — candidates only from matching buckets, then exact
 * re-ranking, the standard recall/throughput trade.
 */
object Similarity {

  /**
   * Dot product of two fixed-dim vector columns as an explicit
   * left-associated sum of element products. For small fixed dims this
   * unrolls into whole-stage codegen (no lambda-function overhead) and
   * its float semantics are reproducible across engines.
   */
  def dotUnrolled(a: Column, b: Column, dim: Int): Column =
    (1 to dim).map(i =>
      element_at(a, i).cast("double") * element_at(b, i).cast("double"))
      .reduce(_ + _)

  /** Lambda-based dot product for dynamic dims. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column, dim: Int): Column = sqrt(dotUnrolled(a, a, dim))

  def cosine(a: Column, b: Column, dim: Int): Column =
    dotUnrolled(a, b, dim) / (norm(a, dim) * norm(b, dim))

  /**
   * Exact cosine top-k: for each query vector, the k nearest corpus
   * vectors (self excluded). The query side is broadcast — the corpus
   * (the 100 TB side) streams through one stage; ranking is a window
   * over query id.
   */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, id: String,
                     vec: String, dim: Int, k: Int): DataFrame = {
    val q = broadcast(queries.select(col(id).as("query_id"), col(vec).as("qv")))
    val c = corpus.select(col(id).as("neighbor_id"), col(vec).as("cv"))
    val scored = c.join(q, col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", cosine(col("qv"), col("cv"), dim))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("rnk"), col("neighbor_id"), col("cos"))
  }

  // Deterministic pseudo-random hyperplane component r_{p,i} in
  // {-1, +1}, derived from a fixed splitmix64-style mix of (p, i).
  private def planeSign(p: Int, i: Int): Column = {
    var z = (p.toLong << 32) ^ (i.toLong + 0x9E3779B97F4A7C15L)
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z = z ^ (z >>> 31)
    if ((z & 1L) == 0L) lit(-1.0) else lit(1.0)
  }

  /** Random-hyperplane (sign) LSH signature: nPlanes sign bits packed
    * into a long. Deterministic across runs. */
  def hyperplaneSig(vec: Column, dim: Int, nPlanes: Int): Column =
    (0 until nPlanes).map { p =>
      val proj = (1 to dim).map(i =>
        element_at(vec, i).cast("double") * planeSign(p, i)).reduce(_ + _)
      when(proj > 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }.reduce(_.bitwiseOR(_))

  /**
   * LSH-bucketed approximate top-k: 16-bit hyperplane signature split
   * into `nBands` bands; vectors sharing any band bucket become
   * candidates; exact cosine re-ranks candidates. Recall < 1 by
   * design; throughput scales with bucket occupancy, not corpus².
   */
  def lshTopK(corpus: DataFrame, queries: DataFrame, id: String,
              vec: String, dim: Int, k: Int,
              nPlanes: Int = 24, nBands: Int = 8): DataFrame = {
    val rows = nPlanes / nBands
    def banded(df: DataFrame, side: String) =
      df.select(col(id).as(s"${side}_id"), col(vec).as(s"${side}_v"),
        hyperplaneSig(col(vec), dim, nPlanes).as("sig"))
        .select(col(s"${side}_id"), col(s"${side}_v"), posexplode(array(
          (0 until nBands).map(b =>
            shiftright(col("sig"), b * rows)
              .bitwiseAND(lit((1L << rows) - 1))): _*)))
        .toDF(s"${side}_id", s"${side}_v", "band", "bucket")
    val c = banded(corpus, "neighbor")
    val q = banded(queries, "query")
    val cand = c.join(q, Seq("band", "bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "query_v", "neighbor_id", "neighbor_v")
      .distinct()
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    cand.withColumn("cos", cosine(col("query_v"), col("neighbor_v"), dim))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("rnk"), col("neighbor_id"), col("cos"))
  }

  /** Embedding near-duplicate pairs: all (a,b) with cosine >= minCos.
    * Exact (block-nested via broadcast when one side is small; at 100 TB
    * swap the exact join for [[lshTopK]]-style bucketing). */
  def cosineDupPairs(df: DataFrame, id: String, vec: String, dim: Int,
                     minCos: Double): DataFrame = {
    val a = df.select(col(id).as("a"), col(vec).as("va"))
    val b = df.select(col(id).as("b"), col(vec).as("vb"))
    a.join(b, col("a") < col("b"))
      .withColumn("cos", cosine(col("va"), col("vb"), dim))
      .filter(col("cos") >= minCos)
      .select(col("a"), col("b"), col("cos"))
  }
}
