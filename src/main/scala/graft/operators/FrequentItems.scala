package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/**
 * Exact heavy hitters at scale: a Misra-Gries sketch pass proposes a
 * small candidate set, an exact counting pass verifies it — the
 * sketch bounds the SHUFFLE, the verify pass guarantees the ANSWER.
 *
 * Why not a plain `groupBy(token).count`? At 100 TB that shuffles the
 * entire token stream keyed by a Zipf-distributed vocabulary (billions
 * of group keys, the hot key is the shuffle skew). Here:
 *
 *   pass 1 (narrow): Misra-Gries summaries per partition, merged by
 *     Spark's partial/final aggregation into ONE k-entry summary — no
 *     shuffle of token rows at all, a single sketch row reaches the
 *     driver. MG guarantees every item with true count > n/(cap+1)
 *     survives (Misra & Gries 1982; merge-then-trim keeps the bound,
 *     Agarwal et al., "Mergeable Summaries", PODS'12).
 *   pass 2 (bounded): exact counts of candidate tokens only — the
 *     aggregate's group-key domain is ≤ cap, so the shuffle carries
 *     only candidate-token rows partially pre-aggregated per partition.
 *
 * The output is therefore EXACT (sketch false positives are filtered
 * by their exact counts; false negatives are impossible by the MG
 * bound when cap >= 2/minFreq), which is what lets the query carry a
 * plain SQL oracle. Reference has no sketch/agg surface at all
 * (SURVEY §2.2: no HLL, no distinct-agg); this is the beyond-reference
 * frequent-items member of that family.
 */
object FrequentItems {

  /** Misra-Gries summary buffer: parallel key/count arrays (kept as
    * arrays for a plain product encoder — the buffer is tiny, ≤ cap
    * entries, and lives as a deserialized object inside
    * ObjectHashAggregate between updates). */
  case class MGBuf(keys: Array[String], counts: Array[Long])

  /** Typed Aggregator form of Misra-Gries(cap): usable as a regular
    * typed column — Catalyst runs it partial (per partition) + final
    * (merge), exactly the classic distributed-sketch shape. */
  class MisraGries(cap: Int)
      extends Aggregator[String, MGBuf, Array[String]] with Serializable {

    // Per-element update scans the key array (O(cap), cap is small by
    // construction). ObjectHashAggregate keeps the buffer deserialized
    // between updates, so there is no per-row encoder cost; a
    // throughput-tuned variant would pre-aggregate per partition with
    // a hash map in mapPartitions and feed ONLY the per-partition
    // summaries to this Aggregator — same bound, same merge.
    override def zero: MGBuf = MGBuf(Array.empty, Array.empty)

    override def reduce(b: MGBuf, x: String): MGBuf = {
      val i = b.keys.indexOf(x)
      if (i >= 0) { b.counts(i) += 1; b }
      else if (b.keys.length < cap)
        MGBuf(b.keys :+ x, b.counts :+ 1L)
      else {
        // classic MG step: decrement every counter, drop zeros
        var j = 0
        while (j < b.counts.length) { b.counts(j) -= 1; j += 1 }
        val keep = b.counts.zipWithIndex.filter(_._1 > 0).map(_._2)
        MGBuf(keep.map(b.keys), keep.map(b.counts))
      }
    }

    override def merge(x: MGBuf, y: MGBuf): MGBuf = {
      val m = scala.collection.mutable.LinkedHashMap[String, Long]()
      var i = 0
      while (i < x.keys.length) { m.update(x.keys(i), x.counts(i)); i += 1 }
      i = 0
      while (i < y.keys.length) {
        m.update(y.keys(i), m.getOrElse(y.keys(i), 0L) + y.counts(i)); i += 1
      }
      if (m.size <= cap) MGBuf(m.keys.toArray, m.values.toArray)
      else {
        // subtract the (cap+1)-th largest count from all, keep positives
        // (the mergeable-summaries trim; error stays <= n/(cap+1))
        val d = m.values.toArray.sorted(Ordering[Long].reverse)(cap)
        val kept = m.iterator.map { case (k, c) => (k, c - d) }
          .filter(_._2 > 0).toArray
        MGBuf(kept.map(_._1), kept.map(_._2))
      }
    }

    override def finish(b: MGBuf): Array[String] = b.keys.sorted

    override def bufferEncoder: Encoder[MGBuf] = Encoders.product[MGBuf]
    override def outputEncoder: Encoder[Array[String]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[String]]()
  }

  /**
   * Exact tokens with relative frequency > minFreq, as
   * (tok, cnt, freq). `items` is a one-column frame of occurrences
   * (e.g. exploded tokens). Two bounded passes, never a full
   * vocabulary shuffle; candidate ids are driver metadata (≤ cap
   * strings — same legitimacy class as IVF centroids).
   */
  def heavyHitters(items: DataFrame, colName: String,
                   minFreq: Double): DataFrame = {
    require(minFreq > 0 && minFreq < 1, s"minFreq must be in (0,1): $minFreq")
    val cap = math.max(math.ceil(2.0 / minFreq).toInt, 8)
    val spark = items.sparkSession
    import spark.implicits._
    val ds = items.select(col(colName).cast("string").as("x")).as[String]
    val mg = new MisraGries(cap)
    val candidates: Seq[String] = ds.select(mg.toColumn.name("cands")).head()
    // exact verify: count ONLY candidate tokens; total via a 1-row
    // broadcast cross join so the whole query stays one DataFrame
    val total = items.agg(count(lit(1)).as("total"))
    items.select(col(colName).cast("string").as("tok"))
      .filter(col("tok").isin(candidates: _*))
      .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(total))
      .filter(col("cnt").cast("double") > lit(minFreq) * col("total").cast("double"))
      .withColumn("freq", col("cnt").cast("double") / col("total").cast("double"))
      .select(col("tok"), col("cnt"), col("freq"))
  }
}
