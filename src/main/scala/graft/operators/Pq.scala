package graft.operators

import graft.functions.{PqAdcDot, PqBooks, PqEncode, PqEncodeArr, PqLuts}
import graft.functions.VectorExpressions.{dotF, normF}
import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.shims

/**
 * Product-quantized similarity search — the memory/IO scale path for
 * ANN over a 100 TB embedding corpus.
 *
 * Brute force streams 4·dim bytes per corpus row per query batch
 * (256 B at dim 64); IVF prunes which rows are read but not their
 * width. PQ compresses each vector to `m` one-byte codes (+1 stored
 * norm) — 32× narrower at dim 64, m 8 — and scores candidates with
 * per-query lookup tables (ADC): m table adds per pair instead of dim
 * multiplies. The ADC top `k·refine` candidates are re-ranked with
 * exact cosine over the full vectors (fetched by a broadcast-hash
 * candidate join — the corpus is never shuffled), so emitted scores
 * are exact and only RECALL is approximate; reference design: Jégou
 * et al., PAMI 2011 (public). Reference-surface anchor: the reference
 * has no ANN operator at all (its closest shape is the generic
 * Cogroup, /root/reference/cogroup.go) — this family is part of the
 * builder-brief LLM-pipeline extension, sized for the same
 * embeddings table the other sim_topk_* queries use.
 *
 * Everything data-sized is one scan wide: training sweeps are
 * posexplode + groupBy(subspace, code) partial/final aggregates
 * (m·ksub result rows — driver metadata), encoding is a single
 * codegen'd kernel, ADC scoring is a broadcast nested-loop against a
 * query batch that is small by the same contract as every other
 * sim_topk_* formulation.
 */
object Pq {

  /**
   * Deterministic per-subspace Lloyd k-means. Seeds = the `ksub`
   * lowest-id vectors' subspace slices (same stance as
   * [[Similarity.trainCentroids]]). Each iteration is ONE scan of the
   * TRAINING SET: encode with the current books (codegen'd kernel),
   * posexplode the m codes, aggregate per (subspace, code)
   * subspace-mean. Empty cells keep their previous entry. Collected
   * result is m×ksub rows — bounded metadata.
   *
   * `sampleFraction` trains on a deterministic hash-sample of the
   * corpus instead of every row — codebooks are STATISTICS, not
   * membership, so at 100 TB a per-mille sample gives the same
   * centroid estimates at a thousandth of the sweep cost (the full
   * corpus is still ENCODED with the resulting books; only training
   * reads the sample). Hash-sampling on the id (not `TABLESAMPLE`/
   * `df.sample`) keeps the set stable across retries and engines.
   */
  def trainBooks(corpus: DataFrame, id: String, vec: String, dim: Int,
                 m: Int, ksub: Int, iters: Int = 2,
                 sampleFraction: Option[Double] = None): PqBooks = {
    require(m > 0 && dim % m == 0, s"dim $dim must be divisible by m $m")
    require(sampleFraction.forall(f => f > 0 && f <= 1),
      s"sampleFraction must be in (0, 1]: $sampleFraction")
    val train = sampleFraction match {
      case Some(f) if f < 1.0 =>
        val buckets = 1 << 20
        corpus.filter(
          pmod(xxhash64(col(id)), lit(buckets.toLong)) < (f * buckets).toLong)
      case _ => corpus
    }
    val dsub = dim / m
    // seeds stay corpus-lowest-id (deterministic whether or not the
    // sample happens to contain them)
    val seedRows = corpus.orderBy(col(id)).limit(ksub).select(col(vec))
      .collect().map(_.getSeq[Float](0).map(_.toDouble).toArray)
    require(seedRows.nonEmpty, "empty corpus")
    def sub(v: Array[Double], s: Int): Array[Double] =
      (0 until dsub).map(i =>
        if (s * dsub + i < v.length) v(s * dsub + i) else 0.0).toArray
    var books: Array[Array[Array[Double]]] =
      Array.tabulate(m, ksub)((s, j) => sub(seedRows(j % seedRows.length), s))
    for (_ <- 1 to iters) {
      val bc = booksBroadcast(new PqBooks(books))
      val avgs = (1 to dsub).map(i =>
        avg(element_at(col("sv"), i).cast("double")).as(s"c$i"))
      val updated = train
        .select(posexplode(encodeArrF(col(vec), bc)).as(Seq("s", "code")),
          col(vec))
        .select(col("s"), col("code"),
          slice(col(vec), col("s") * dsub + 1, lit(dsub)).as("sv"))
        .groupBy(col("s"), col("code"))
        .agg(avgs.head, avgs.tail: _*)
        .collect()
        .map(r => (r.getInt(0), r.getInt(1)) ->
          (1 to dsub).map(i => r.getDouble(i + 1)).toArray)
        .toMap
      books = Array.tabulate(m, ksub)((s, j) =>
        updated.getOrElse((s, j), books(s)(j)))
    }
    new PqBooks(books)
  }

  /** Corpus rows as (id, codes BINARY(m), norm) — the persisted /
    * streamed representation. `norm` is the EXACT vector norm, stored
    * once at encode time so ADC can rank by approximate cosine. */
  def encode(corpus: DataFrame, id: String, vec: String,
             books: PqBooks): DataFrame = {
    val bc = booksBroadcast(books)
    corpus.select(col(id), encodeF(col(vec), bc).as("codes"),
      normF(col(vec)).as("norm"))
  }

  /**
   * PQ ANN top-k: train books, encode the corpus once, ADC-score the
   * code stream against per-query lookup tables, exact-re-rank the
   * top `k·refine` ADC candidates. Output schema matches the other
   * sim_topk_* queries: (query_id, rnk, neighbor_id, cos) with EXACT
   * cosine values.
   */
  def adcTopK(corpus: DataFrame, queries: DataFrame, id: String,
              vec: String, dim: Int, k: Int, m: Int = 8, ksub: Int = 32,
              iters: Int = 2, refine: Int = 8): DataFrame = {
    val spark = corpus.sparkSession
    val books = trainBooks(corpus, id, vec, dim, m, ksub, iters)
    val bBc = booksBroadcast(books)
    val enc = corpus.select(col(id).cast("long").as("neighbor_id"),
      encodeF(col(vec), bBc).as("codes"), normF(col(vec)).as("cn"))

    // Query batches are small by the sim_topk contract (every
    // formulation broadcasts them); their vectors become driver-side
    // ADC lookup tables, one flat m×ksub row each.
    val qRows = queries.select(col(id).cast("long"), col(vec))
      .orderBy(col(id)).collect()
    val luts = qRows.map { r =>
      val q = r.getSeq[Float](1).map(_.toDouble).toArray
      lutFor(q, books)
    }
    val lutsBc = lutsBroadcast(spark, new PqLuts(luts, ksub))
    import spark.implicits._
    val qDf = broadcast(
      qRows.map(_.getLong(0)).zipWithIndex.toSeq.toDF("query_id", "qidx"))

    // ADC pass: the corpus side carries (8-byte id, m-byte codes,
    // 8-byte norm) — at dim 64, m 8 that is ~9% of the brute-force
    // stream — and each pair costs m lookups. Zero-norm rows pin to
    // -inf so they deterministically rank last.
    val wAdc = Window.partitionBy(col("query_id"))
      .orderBy(col("adc").desc, col("neighbor_id"))
    val cand = enc.join(qDf, col("query_id") =!= col("neighbor_id"))
      .withColumn("adc",
        when(col("cn") === 0.0, lit(Double.NegativeInfinity))
          .otherwise(adcDotF(col("codes"), col("qidx"), lutsBc) / col("cn")))
      .withColumn("r", row_number().over(wAdc))
      .filter(col("r") <= k * refine)
      .select("query_id", "neighbor_id")

    // Exact re-rank: candidates (≤ queries·k·refine rows) broadcast
    // back against the corpus — a broadcast-hash join, the corpus
    // streams and is never shuffled.
    val cv = corpus.select(col(id).cast("long").as("neighbor_id"),
      col(vec).as("cv"), normF(col(vec)).as("cn"))
    val qv = broadcast(queries.select(col(id).cast("long").as("query_id"),
      col(vec).as("qv"), normF(col(vec)).as("qn")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    cv.join(broadcast(cand), Seq("neighbor_id"))
      .join(qv, Seq("query_id"))
      .withColumn("cos", dotF(col("qv"), col("cv")) / (col("qn") * col("cn")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("rnk"), col("neighbor_id"), col("cos"))
  }

  /** ADC table for one query: lut(s·ksub + j) = dot(q_sub(s), book(s)(j)),
    * left-associated double sums, missing query elements contribute 0. */
  private[graft] def lutFor(q: Array[Double], books: PqBooks): Array[Double] = {
    val lut = new Array[Double](books.m * books.ksub)
    var s = 0
    while (s < books.m) {
      var j = 0
      while (j < books.ksub) {
        val e = books.books(s)(j)
        var dot = 0.0
        var i = 0
        while (i < books.dsub) {
          val qi = s * books.dsub + i
          val x = if (qi < q.length) q(qi) else 0.0
          dot += x * e(i)
          i += 1
        }
        lut(s * books.ksub + j) = dot
        j += 1
      }
      s += 1
    }
    lut
  }

  // --- Column entry points (broadcast handles only in the plan) -------
  private[graft] def encodeF(v: Column, bc: Broadcast[PqBooks]): Column =
    shims.column(PqEncode(shims.expression(v), bc))
  private[graft] def encodeArrF(v: Column, bc: Broadcast[PqBooks]): Column =
    shims.column(PqEncodeArr(shims.expression(v), bc))
  private[graft] def adcDotF(codes: Column, qidx: Column,
                             bc: Broadcast[PqLuts]): Column =
    shims.column(PqAdcDot(shims.expression(codes), shims.expression(qidx), bc))

  // --- Content-keyed broadcast memos (one executor-resident copy per
  // distinct codebook / LUT set; equal content → the SAME handle, so
  // equal plans stay case-class-equal — same stance as
  // Similarity.centroidBroadcast). ---------------------------------------
  private final class BooksKey(val app: String, val b: Array[Array[Array[Double]]]) {
    override val hashCode: Int = app.hashCode * 31 +
      java.util.Arrays.deepHashCode(b.asInstanceOf[Array[AnyRef]])
    override def equals(o: Any): Boolean = o match {
      case k: BooksKey => k.app == app && java.util.Arrays.deepEquals(
        k.b.asInstanceOf[Array[AnyRef]], b.asInstanceOf[Array[AnyRef]])
      case _ => false
    }
  }
  private val bookBcs = new java.util.concurrent.ConcurrentHashMap[BooksKey,
    Broadcast[PqBooks]]()
  private[graft] def booksBroadcast(books: PqBooks): Broadcast[PqBooks] = {
    val sc = SparkSession.active.sparkContext
    if (bookBcs.size > 64) bookBcs.clear()
    bookBcs.computeIfAbsent(new BooksKey(sc.applicationId, books.books),
      _ => sc.broadcast(books))
  }
  private final class LutsKey(val app: String, val l: Array[Array[Double]]) {
    override val hashCode: Int = app.hashCode * 31 +
      java.util.Arrays.deepHashCode(l.asInstanceOf[Array[AnyRef]])
    override def equals(o: Any): Boolean = o match {
      case k: LutsKey => k.app == app && java.util.Arrays.deepEquals(
        k.l.asInstanceOf[Array[AnyRef]], l.asInstanceOf[Array[AnyRef]])
      case _ => false
    }
  }
  private val lutBcs = new java.util.concurrent.ConcurrentHashMap[LutsKey,
    Broadcast[PqLuts]]()
  private[graft] def lutsBroadcast(spark: SparkSession, luts: PqLuts): Broadcast[PqLuts] = {
    val sc = spark.sparkContext
    if (lutBcs.size > 64) lutBcs.clear()
    lutBcs.computeIfAbsent(new LutsKey(sc.applicationId, luts.luts),
      _ => sc.broadcast(luts))
  }
}
