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

  /** Mergeable-summaries combine of two MG buffers: add counts, and if
    * over cap, subtract the (cap+1)-th largest from all and keep
    * positives — error stays <= n/(cap+1) (Agarwal et al., PODS'12). */
  private[graft] def mergeBufs(x: MGBuf, y: MGBuf, cap: Int): MGBuf = {
    val m = scala.collection.mutable.LinkedHashMap[String, Long]()
    var i = 0
    while (i < x.keys.length) { m.update(x.keys(i), x.counts(i)); i += 1 }
    i = 0
    while (i < y.keys.length) {
      m.update(y.keys(i), m.getOrElse(y.keys(i), 0L) + y.counts(i)); i += 1
    }
    if (m.size <= cap) MGBuf(m.keys.toArray, m.values.toArray)
    else {
      val d = m.values.toArray.sorted(Ordering[Long].reverse)(cap)
      val kept = m.iterator.map { case (k, c) => (k, c - d) }
        .filter(_._2 > 0).toArray
      MGBuf(kept.map(_._1), kept.map(_._2))
    }
  }

  /**
   * One Misra-Gries pass over a partition with a hash map:
   * O(1) amortized per element (the decrement-all step runs at
   * most n/(cap+1) times and is charged to the insertions it undoes),
   * zero per-element allocation — versus the Aggregator form's O(cap)
   * `indexOf` scan and array-append garbage per new key, which at
   * cap=200 (minFreq 1%) was up to 200 string compares per token.
   */
  private[graft] def partitionSummary(it: Iterator[String],
                                          cap: Int): MGBuf = {
    val m = new java.util.HashMap[String, Array[Long]](cap * 2)
    while (it.hasNext) {
      val x = it.next()
      val cell = m.get(x)
      if (cell != null) cell(0) += 1
      else if (m.size < cap) m.put(x, Array(1L))
      else {
        // classic MG step: decrement every counter, drop zeros (the
        // incoming element's implicit count of 1 is dropped with them)
        val del = m.entrySet().iterator()
        while (del.hasNext) {
          val e = del.next()
          e.getValue()(0) -= 1
          if (e.getValue()(0) == 0) del.remove()
        }
      }
    }
    val keys = new Array[String](m.size)
    val counts = new Array[Long](m.size)
    var i = 0
    val es = m.entrySet().iterator()
    while (es.hasNext) {
      val e = es.next(); keys(i) = e.getKey; counts(i) = e.getValue()(0); i += 1
    }
    MGBuf(keys, counts)
  }

  /** Typed Aggregator form of Misra-Gries(cap): usable as a regular
    * typed column — Catalyst runs it partial (per partition) + final
    * (merge), exactly the classic distributed-sketch shape. Kept as
    * the readable reference implementation; [[heavyHitters]] runs the
    * throughput path ([[partitionSummary]] + [[MGMerge]]) whose final
    * output is identical (PropertySpec asserts it). */
  class MisraGries(cap: Int)
      extends Aggregator[String, MGBuf, Array[String]] with Serializable {

    // Per-element update scans the key array — O(cap) per new key.
    // ObjectHashAggregate keeps the buffer deserialized between
    // updates, so there is no per-row encoder cost.
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

    override def merge(x: MGBuf, y: MGBuf): MGBuf = mergeBufs(x, y, cap)

    override def finish(b: MGBuf): Array[String] = b.keys.sorted

    override def bufferEncoder: Encoder[MGBuf] = Encoders.product[MGBuf]
    override def outputEncoder: Encoder[Array[String]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[String]]()
  }

  /** Merge-only Aggregator over per-partition MG summaries — the final
    * step of the throughput path. Inputs are ≤ one MGBuf per partition,
    * so this aggregate touches O(partitions) rows, not O(n). */
  class MGMerge(cap: Int)
      extends Aggregator[MGBuf, MGBuf, Array[String]] with Serializable {
    override def zero: MGBuf = MGBuf(Array.empty, Array.empty)
    override def reduce(b: MGBuf, x: MGBuf): MGBuf = mergeBufs(b, x, cap)
    override def merge(x: MGBuf, y: MGBuf): MGBuf = mergeBufs(x, y, cap)
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
    val candidates: Seq[String] = mgCandidates(ds, cap)
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

  /** Sketch pass of [[heavyHitters]], throughput form: one hash-map MG
    * per partition (mapPartitions, O(1)/element), then a merge-only
    * aggregate over the ≤numPartitions summaries. Same n/(cap+1) bound
    * as the all-Aggregator form ([[mgCandidatesViaAggregator]]) — both
    * candidate sets contain every true heavy hitter, and the exact
    * verify pass makes the final answers identical. */
  private[graft] def mgCandidates(
      ds: org.apache.spark.sql.Dataset[String], cap: Int): Seq[String] = {
    implicit val bufEnc: Encoder[MGBuf] = Encoders.product[MGBuf]
    ds.mapPartitions(it => Iterator.single(partitionSummary(it, cap)))
      .select(new MGMerge(cap).toColumn.name("cands")).head()
  }

  /** Readable reference form of the sketch pass (kept for the
    * PropertySpec cross-check): Catalyst partial+final over the typed
    * [[MisraGries]] Aggregator, O(cap) per element. */
  private[graft] def mgCandidatesViaAggregator(
      ds: org.apache.spark.sql.Dataset[String], cap: Int): Seq[String] =
    ds.select(new MisraGries(cap).toColumn.name("cands")).head()
}
