package graft

import graft.functions.{Multimodal, TextFunctions => TF}
import graft.operators.{Dedup, Packing, Sampling, Similarity}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the LLM-pipeline operators: sketches are checked
  * against their exact baselines (the correctness bar a sketch owes). */
class PipelineSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  val sf = "/root/testdata/sf0.001"
  lazy val docs = Tables.load(spark, sf, "documents")
  lazy val emb = Tables.load(spark, sf, "embeddings")

  test("minhash LSH finds exactly the exact-jaccard pairs at j>=0.5") {
    val exact = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minhashDupPairs(docs, "doc_id", "text", 3, 64, 2, 0.5)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh == exact) // no false positives (verified) AND full recall here
    assert(exact.nonEmpty) // the corpus has planted near-dups
  }

  test("connectedComponents: chains, cliques, singleton-pair components") {
    import spark.implicits._
    // chain 1-2-3-4, clique 10-11-12, pair 20-21
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L),
      (10L, 12L), (20L, 21L)).toDF("a", "b")
    val got = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expect = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L)
    assert(got == expect)
  }

  test("connectedComponentsStar: long chain in O(log n) rounds; agrees with propagation") {
    import spark.implicits._
    // 120-node chain — diameter FAR beyond propagation's default
    // iteration budget (which now fails loudly instead of mislabeling)
    val chain = (1L until 120L).map(i => (i, i + 1)).toDF("a", "b")
    val star = Dedup.connectedComponentsStar(chain)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(star.keySet == (1L to 120L).toSet)
    assert(star.values.forall(_ == 1L))
    intercept[IllegalArgumentException] {
      Dedup.connectedComponents(chain, maxIter = 10).collect()
    }
    // shallow random graph: both algorithms agree
    val rnd = new scala.util.Random(7)
    val pairs = Seq.fill(60)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter { case (x, y) => x != y }.toDF("a", "b")
    val prop = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val star2 = Dedup.connectedComponentsStar(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(star2 == prop)
  }

  test("minhash signature similarity estimates jaccard") {
    val sigs = Dedup.minhashSignatures(docs, "doc_id", "text", 3, 64)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val exact = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(exact.nonEmpty)
    exact.foreach { case (a, b, j) =>
      val est = sigs(a).zip(sigs(b)).count { case (x, y) => x == y } / 64.0
      assert(math.abs(est - j) < 0.25, s"pair ($a,$b): est $est vs exact $j")
    }
  }

  test("simhash: near-dup docs have small hamming distance, random pairs large") {
    val exact = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sh = Dedup.simhash(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dupDists = exact.toSeq.map { case (a, b) =>
      java.lang.Long.bitCount(sh(a) ^ sh(b)) }
    assert(dupDists.nonEmpty && dupDists.forall(_ <= 16),
      s"near-dup hamming too large: $dupDists")
    // shared-vocabulary corpus → random pairs correlate too; require
    // clear separation between near-dup and random-pair means.
    val ids = sh.keys.toSeq.sorted.take(40)
    val rnd = for (a <- ids; b <- ids if a < b && !exact((a, b)))
      yield java.lang.Long.bitCount(sh(a) ^ sh(b))
    val dupMean = dupDists.sum.toDouble / dupDists.size
    val rndMean = rnd.sum.toDouble / rnd.size
    assert(dupMean + 5 < rndMean, s"no separation: dup $dupMean vs random $rndMean")
  }

  test("simhashDupPairs returns verified pairs within maxDist") {
    val pairs = Dedup.simhashDupPairs(docs, "doc_id", "text", maxDist = 8)
      .collect()
    assert(pairs.forall(_.getInt(2) <= 8) || pairs.forall(r => r.getLong(2) <= 8))
  }

  test("LSH top-k recall vs brute force >= 0.6 at these parameters") {
    val queries = emb.filter(col("vec_id") < 20)
    val bf = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 64, 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val lsh = Similarity.lshTopK(emb, queries, "vec_id", "embedding", 64, 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (bf & lsh).size.toDouble / bf.size
    assert(recall >= 0.6, s"LSH recall $recall too low")
  }

  test("quantized-LSH top-k: candidates honest (no better neighbor missing within candidates), recall floor") {
    val queries = emb.filter(col("vec_id") < 20)
    val bf = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 64, 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val got = Similarity.lshTopKQuantized(emb, queries, "vec_id",
      "embedding", 64, 5).collect()
    // ranking well-formed: ranks 1..n contiguous per query, cos
    // non-increasing within each query
    got.groupBy(_.getLong(0)).values.foreach { rs =>
      val sorted = rs.sortBy(_.getInt(1))
      assert(sorted.map(_.getInt(1)).toSeq == (1 to sorted.length))
      val cs = sorted.map(_.getDouble(3)).toSeq
      assert(cs.zip(cs.tail).forall { case (a, b) => a >= b })
    }
    val recall = (bf & got.map(r => (r.getLong(0), r.getLong(2))).toSet)
      .size.toDouble / bf.size
    assert(recall >= 0.3, s"quantized-LSH recall $recall too low")
  }

  test("IVF top-k recall vs brute force >= 0.6; exactly k per query") {
    val queries = emb.filter(col("vec_id") < 20)
    val bf = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 64, 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val ivf = Similarity.ivfTopK(emb, queries, "vec_id", "embedding", 64, 5)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(ivf.length == ivf.distinct.length, "duplicate (query, neighbor)")
    val perQuery = ivf.groupBy(_._1).values.map(_.size)
    assert(perQuery.forall(_ <= 5))
    val recall = (bf & ivf.toSet).size.toDouble / bf.size
    assert(recall >= 0.6, s"IVF recall $recall too low")
  }

  test("incremental IVF index top-k recall vs brute force >= 0.6; exactly k per query") {
    val queries = emb.filter(col("vec_id") < 20)
    val bf = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 64, 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    // the sim_topk_ivf_idx shape: build on 80%, append 20%, query
    val dir = java.nio.file.Files
      .createTempDirectory("graft_ivf_recall").toString + "/idx"
    val cfg = graft.operators.IvfIndex.Config(dim = 64, nList = 16, iters = 2)
    graft.operators.IvfIndex.build(spark,
      emb.filter(col("vec_id") % 5 =!= 0), "vec_id", "embedding", dir, cfg)
    graft.operators.IvfIndex.append(spark, dir,
      emb.filter(col("vec_id") % 5 === 0), "vec_id", "embedding", cfg)
    val ivf = graft.operators.IvfIndex.topK(spark, dir, queries,
      "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(ivf.length == ivf.distinct.length, "duplicate (query, neighbor)")
    assert(ivf.groupBy(_._1).values.forall(_.size <= 5))
    val recall = (bf & ivf.toSet).size.toDouble / bf.size
    assert(recall >= 0.6, s"incremental-IVF recall $recall too low")
  }

  test("PQ encode: deterministic, m bytes per row, codes < ksub") {
    import graft.operators.Pq
    val books = Pq.trainBooks(emb, "vec_id", "embedding", 64, m = 8, ksub = 16)
    val a = Pq.encode(emb, "vec_id", "embedding", books)
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    val b = Pq.encode(emb, "vec_id", "embedding", books)
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    assert(a.keySet == b.keySet && a.forall { case (k, v) =>
      java.util.Arrays.equals(v, b(k)) }, "encode not deterministic")
    assert(a.values.forall(_.length == 8), "codes must be m bytes")
    assert(a.values.forall(_.forall(c => (c & 0xFF) < 16)), "code out of ksub range")
  }

  test("PQ books trained on a hash sample keep the recall gate (the 100 TB training path)") {
    import graft.operators.Pq
    // half-corpus sample: books are statistics — the recall gate must
    // hold without sweeping every row per Lloyd iteration
    val books = Pq.trainBooks(emb, "vec_id", "embedding", 64, m = 8,
      ksub = 16, iters = 2, sampleFraction = Some(0.5))
    val enc = Pq.encode(emb, "vec_id", "embedding", books)
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    assert(enc.values.forall(_.length == 8))
    // deterministic: the hash sample is stable across runs
    val books2 = Pq.trainBooks(emb, "vec_id", "embedding", 64, m = 8,
      ksub = 16, iters = 2, sampleFraction = Some(0.5))
    val enc2 = Pq.encode(emb, "vec_id", "embedding", books2)
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    assert(enc.forall { case (k, v) => java.util.Arrays.equals(v, enc2(k)) },
      "sampled training not deterministic")
    // recall through the IVF-PQ index path with sampled training
    import graft.operators.IvfIndex
    val dir = java.nio.file.Files
      .createTempDirectory("graft_pq_sample").toString + "/idx"
    val cfg = IvfIndex.Config(dim = 64, nList = 8, iters = 2,
      pq = Some(IvfIndex.PqConfig(m = 8, ksub = 16,
        trainSampleFraction = Some(0.5))))
    IvfIndex.build(spark, emb, "vec_id", "embedding", dir, cfg)
    val queries = emb.filter(col("vec_id") < 20)
    val bf = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 64, 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val got = IvfIndex.topK(spark, dir, queries, "vec_id", "embedding", 5,
        nProbe = 8)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (bf & got).size.toDouble / bf.size
    assert(recall >= 0.6, s"sampled-training recall $recall too low")
  }

  test("PQ ADC top-k: recall vs brute force >= 0.6; emitted cosines EXACT; <= k per query") {
    import graft.operators.Pq
    val queries = emb.filter(col("vec_id") < 20)
    val bf = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 64, 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val pq = Pq.adcTopK(emb, queries, "vec_id", "embedding", 64, k = 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(pq.map(t => (t._1, t._3)).distinct.length == pq.length,
      "duplicate (query, neighbor)")
    assert(pq.groupBy(_._1).values.forall(_.size <= 5))
    val recall = (bf & pq.map(t => (t._1, t._3)).toSet).size.toDouble / bf.size
    assert(recall >= 0.6, s"PQ recall $recall too low")
    // Re-ranked cosines must be EXACT — same arithmetic as FloatVecDot:
    // left-associated double sums of (double)a[i]*(double)b[i].
    val vecs = emb.select(col("vec_id"), col("embedding"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < math.min(a.length, b.length)) {
        s += a(i).toDouble * b(i).toDouble; i += 1
      }
      s
    }
    pq.foreach { case (q, _, n, cos) =>
      val (qv, nv) = (vecs(q), vecs(n))
      val expect = dot(qv, nv) /
        (math.sqrt(dot(qv, qv)) * math.sqrt(dot(nv, nv)))
      assert(cos == expect, s"cos not exact for ($q,$n): $cos vs $expect")
    }
  }

  test("semDedup (Lloyd path, iters=2): witness rule exact against a driver recompute") {
    import graft.operators.Similarity
    val tau = 0.45
    val out = Similarity.semDedup(emb, "vec_id", "embedding", 64,
      nClusters = 8, iters = 2, tau = tau)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getBoolean(2)))
    // partitions the corpus: every row present exactly once
    val ids = emb.select("vec_id").collect().map(_.getLong(0)).toSet
    assert(out.map(_._1).toSet == ids && out.length == ids.size)
    // recompute the witness rule from the EMITTED assignment with
    // plain driver arithmetic: drop x iff some y < x in x's cluster
    // has cos(x, y) >= tau
    val vecs = emb.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val byCluster = out.groupBy(_._2)
    assert(byCluster.size > 1, "Lloyd clustering degenerated to one cluster")
    byCluster.values.foreach { members =>
      val sorted = members.sortBy(_._1)
      sorted.foreach { case (id, _, keep) =>
        val hasWitness = sorted.iterator.takeWhile(_._1 < id)
          .exists(w => cos(vecs(id), vecs(w._1)) >= tau)
        assert(keep == !hasWitness,
          s"vec $id: keep=$keep but lower-id witness=$hasWitness")
      }
    }
    // kept set is never empty and drops only happen when a near-dup
    // pair actually exists in the corpus (sf fixture plants them)
    assert(out.count(_._3) > 0)
  }

  test("int8 quantize/dequantize: bounded range, small cosine error") {
    val q = Similarity.int8Quantize(col("embedding"))
    val frame = emb.withColumn("__q", q)
      .withColumn("deq", Similarity.int8Dequantize(col("__q.q"), col("__q.scale")))
    // quantized values within [-127, 127]
    val bounds = frame.select(
      array_min(col("__q.q")).as("lo"), array_max(col("__q.q")).as("hi"))
      .agg(min(col("lo")), max(col("hi"))).collect()(0)
    assert(bounds.getInt(0) >= -127 && bounds.getInt(1) <= 127, bounds)
    // reconstruction: cosine(original, dequantized) ≈ 1 per vector
    val minCos = frame.select(
      (Similarity.dot(col("embedding"), col("deq")) /
        (sqrt(Similarity.dot(col("embedding"), col("embedding"))) *
          sqrt(Similarity.dot(col("deq"), col("deq"))))).as("c"))
      .agg(min(col("c"))).collect()(0).getDouble(0)
    assert(minCos > 0.999, s"worst reconstruction cosine $minCos")
  }

  test("cosineDupPairsLSH == exact block-pair pairs at separated thresholds") {
    import spark.implicits._
    // 30 random 32-dim vectors + 10 noisy copies: dup pairs at cos≈0.999,
    // background pairs concentrate near 0 (sd ≈ 1/√32) — the separated
    // regime where banded LSH prunes without losing recall.
    val rnd = new scala.util.Random(42)
    val base = Array.fill(30)(Array.fill(32)(rnd.nextGaussian().toFloat))
    val dups = base.take(10).map(_.map(x => x + 0.02f * rnd.nextGaussian().toFloat))
    val vecs = base.zipWithIndex.map { case (v, i) => (i.toLong, v.toSeq) } ++
      dups.zipWithIndex.map { case (v, i) => (100L + i, v.toSeq) }
    val df = vecs.toSeq.toDF("id", "vec")
    def asPairs(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val exact = asPairs(Similarity.cosineDupPairs(df, "id", "vec", 32, 0.8, blocks = 4))
    val lsh = asPairs(Similarity.cosineDupPairsLSH(df, "id", "vec", 32, 0.8))
    assert(exact.size >= 10, s"expected the 10 planted dup pairs, got ${exact.size}")
    assert(lsh == exact) // exact verify → no false positives; bands → full recall here
  }

  test("redactPii scrubs planted PII; keepCanonical keeps min-id per cluster") {
    import spark.implicits._
    val d = Seq((1L, "write to alice.smith@example.org or call 5551234567 now"),
      (2L, "no pii here at all")).toDF("doc_id", "text")
    val clean = d.orderBy("doc_id")
      .select(TF.redactPii(col("text"))).collect().map(_.getString(0))
    assert(clean(0) == "write to <EMAIL> or call <NUM> now")
    assert(clean(1) == "no pii here at all")

    val corpus = Seq(1L, 2L, 3L, 4L, 10L, 20L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 20L)).toDF("a", "b")
    val kept = Dedup.keepCanonical(corpus, "doc_id", pairs)
      .collect().map(_.getLong(0)).toSet
    // clusters {1,2,3} and {10,20} keep their min; 4 was never a dup
    assert(kept == Set(1L, 4L, 10L))
  }

  test("assignSplit: deterministic, near-declared fractions, stable under repartition") {
    val split = Sampling.assignSplit(docs, "doc_id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .select("doc_id", "split")
    val m = split.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val n = m.size
    val train = m.values.count(_ == "train").toDouble / n
    assert(train > 0.7 && train < 0.9, s"train fraction $train")
    assert(m.values.toSet == Set("train", "val", "test"))
    // membership is a function of the KEY: any partitioning agrees
    val re = Sampling.assignSplit(docs.repartition(7), "doc_id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .select("doc_id", "split")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(re == m)
    // hashSample keeps exactly the keys below the fraction cut
    val kept = Sampling.hashSample(docs, "doc_id", 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept.subsetOf(m.keySet) && kept.nonEmpty && kept.size < n)
  }

  test("cluster-keyed split: every member of a dup cluster gets the same split") {
    val pairs = Dedup.minhashDupPairs(docs, "doc_id", "text", 3, 64, 2, 0.5, 100)
    val comp = Dedup.connectedComponents(pairs)
    val withComp = docs.select(col("doc_id"))
      .join(comp, Seq("doc_id"), "left")
      .withColumn("component", coalesce(col("component"), col("doc_id")))
    val split = Sampling.assignSplit(withComp, "component",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val perCluster = split.groupBy("component")
      .agg(countDistinct(col("split")).as("n"))
      .agg(max(col("n"))).collect()(0).getLong(0)
    assert(perCluster == 1L) // no cluster straddles splits — no leakage
    assert(split.select("split").distinct().count() >= 2)
  }

  test("packBins: greedy token packing — exclusive prefix sum, parts-independent") {
    import spark.implicits._
    val withN = docs.select(col("doc_id"),
      TF.wsTokenCount(col("text")).cast("long").as("n"))
    def run(parts: Int): Seq[(Long, Long, Long)] =
      Packing.packBins(withN, "doc_id", "n", capacity = 512, parts = parts)
        .orderBy("doc_id")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val got = run(8)
    // reference: in-memory exclusive prefix sum over id order
    val inMem = withN.orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    var cum = 0L
    val expect = inMem.map { case (id, t) =>
      val bin = cum / 512; cum += t; (id, t, bin)
    }.toSeq
    assert(got == expect)
    // deterministic in `parts` (cluster shape must not change packing)
    assert(run(1) == got && run(3) == got)
    // bins are filled: every bin except the last starts before capacity
    val binStarts = expect.groupBy(_._3).view.mapValues(_.map(_._2).sum)
    assert(binStarts.values.forall(_ > 0))
  }

  test("ppsSample: grid count exact, copies == driver recompute, parts-independent") {
    val withN = docs.select(col("doc_id"),
      TF.wsTokenCount(col("text")).cast("long").as("n"))
    val m = 50
    def run(parts: Int): Seq[(Long, Long, Long)] =
      Packing.ppsSample(withN, "doc_id", "n", m, parts = parts)
        .orderBy("doc_id")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val got = run(8)
    // independent driver recompute of the whole grid construction
    val inMem = withN.orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val total = inMem.map(_._2).sum
    val step = math.max(1L, total / m)
    val off = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest("pps".getBytes("UTF-8")).take(4)
        .map(b => f"$b%02x").mkString, 16) % step
    def f(x: Long): Long = if (x <= off) 0L else 1L + (x - 1 - off) / step
    var cum = 0L
    val expect = inMem.flatMap { case (id, t) =>
      val c = f(cum + t) - f(cum); cum += t
      if (c > 0) Some((id, t, c)) else None
    }.toSeq
    assert(got == expect)
    // total multiplicity = exact number of grid points in [0, W)
    val gridPoints = if (total <= off) 0L else 1L + (total - 1 - off) / step
    assert(got.map(_._3).sum == gridPoints)
    assert(gridPoints >= m) // step = floor(W/m) ⇒ at least m points
    // cluster shape must not change the sample
    assert(run(1) == got && run(3) == got)
    // PPS law: every doc with n >= step is certainly included
    val certain = inMem.filter(_._2 >= step).map(_._1).toSet
    assert(certain.subsetOf(got.map(_._1).toSet))
  }

  test("native FloatVecDot/HyperplaneSig == unrolled Column formulations") {
    import graft.functions.VectorExpressions.{dotF, hyperplaneSigF}
    val pairs = emb.limit(40).select(col("vec_id"), col("embedding").as("a"))
      .crossJoin(emb.limit(3).select(col("embedding").as("b")))
    val dots = pairs.select(
      dotF(col("a"), col("b")).as("native"),
      Similarity.dotUnrolled(col("a"), col("b"), 64).as("unrolled")).collect()
    assert(dots.nonEmpty)
    dots.foreach(r => assert(r.getDouble(0) == r.getDouble(1))) // bit-equal
    val sigs = emb.limit(60).select(
      hyperplaneSigF(col("embedding"), 24).as("native"),
      Similarity.hyperplaneSigUnrolled(col("embedding"), 64, 24).as("unrolled"))
      .collect()
    sigs.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("native ShingleArray/WsTokenCount kernels == Column formulations") {
    import graft.functions.ShingleFunctions.{shingleArrF, tokenCountF}
    import spark.implicits._
    // corpus text plus adversarial whitespace/UTF-8 shapes
    val edge = Seq("", "   ", "a", "a b", "a b c", "  a\tb\nc  d\r\ne ",
      "x x x x x", "héllo wörld déjà vu déjà vu", "ab\fc d e",
      "ab ab ab ab").toDF("text").withColumn("doc_id", lit(0L))
    val cases = docs.select("doc_id", "text").unionByName(edge.select("doc_id", "text"))
    val cnt = cases.select(
      tokenCountF(col("text")).as("native"),
      size(TF.tokens(col("text"))).as("column")).collect()
    cnt.foreach(r => assert(r.getInt(0) == r.getInt(1)))
    for (k <- Seq(1, 3, 8)) {
      val kern = Dedup.shingleArrays(cases, "doc_id", "text", k)
        .select("sharr").collect().map(_.getSeq[String](0))
      val cols = Dedup.shingleArraysColumns(cases, "doc_id", "text", k)
        .select("sharr").collect().map(_.getSeq[String](0))
      assert(kern.length == cols.length, s"k=$k row count")
      kern.zip(cols).foreach { case (a, b) => assert(a == b, s"k=$k") }
    }
  }

  test("native MinHashSignature kernel == 64×min(xxhash64) aggregate formulation") {
    val sh = Dedup.shingles(docs, "doc_id", "text", 3)
    val agg = Dedup.minhashSignaturesAgg(sh, "doc_id", 64).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val kernel = Dedup.minhashSignatures(docs, "doc_id", "text", 3, 64).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(kernel.keySet == agg.keySet)
    // element-for-element bit equality: the kernel must reproduce the
    // exact xxhash64 seed chain, or LSH buckets (and recall) drift
    kernel.foreach { case (id, sig) => assert(sig == agg(id), s"doc $id") }
    assert(kernel.nonEmpty)
    // empty-array neutral element: all-MaxValue signature
    import spark.implicits._
    val empty = Seq(Seq.empty[String]).toDF("sharr")
      .select(graft.functions.MinhashFunctions.minhashSigF(col("sharr"), 8))
      .collect()(0).getSeq[Long](0)
    assert(empty == Seq.fill(8)(Long.MaxValue))
  }

  test("dot/cosine: unrolled == lambda variant") {
    val both = emb.limit(50).select(
      Similarity.dotUnrolled(col("embedding"), col("embedding"), 64).as("u"),
      Similarity.dot(col("embedding"), col("embedding")).as("l")).collect()
    both.foreach(r => assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-9))
  }

  test("multimodal: resize + frameSample stubs keep shape contracts") {
    import graft.functions.Multimodal
    val assets = Multimodal.synthesizeAssets(docs, "doc_id", "text")
    val resized = Multimodal.resize(assets, "doc_id", "payload", 8, 8).collect()
    assert(resized.nonEmpty)
    resized.foreach { r =>
      val n = r.getInt(2)
      assert(n <= 64 && n >= 1 && r.getAs[Array[Byte]](1).length == n)
    }
    val frames = Multimodal.frameSample(assets, "doc_id", "payload", 256, 4)
    val perDoc = frames.groupBy("doc_id").count().collect()
    assert(perDoc.nonEmpty && perDoc.forall(_.getLong(1) >= 1))
  }

  test("multimodal: feature extraction plumbing (schema, values)") {
    val assets = Multimodal.synthesizeAssets(docs, "doc_id", "text")
    assert(assets.schema("payload").dataType ==
      org.apache.spark.sql.types.BinaryType)
    val feats = Multimodal.extractFeatures(assets, "doc_id", "payload")
    val row = feats.filter(col("id") === 0).collect().head
    val text0 = docs.filter(col("doc_id") === 0).collect().head.getString(1)
    assert(row.getLong(1) == text0.length) // ASCII: bytes == chars
    assert(row.getLong(2) == text0.map(_.toLong).sum)
    assert(row.getSeq[Long](3).sum == text0.length) // histogram mass
    val meta = row.getStruct(4)
    assert(meta.getInt(0) == (text0.head.toInt % 64) + 1)
  }

  test("text functions: deterministic and sane on corpus") {
    val r = docs.select(
      TF.wsTokenCount(col("text")).as("n"),
      TF.langId(col("text")).as("lang"),
      TF.qualityScore(col("text")).as("q"),
      TF.fingerprintRolling(col("text")).as("fp")).collect()
    assert(r.forall(_.getInt(0) > 0))
    assert(r.forall(x => x.getDouble(2) >= 0 && x.getDouble(2) <= 1))
    // rolling fingerprint is whitespace-normalizing: same tokens → same fp
    val fp1 = docs.select(TF.fingerprintRolling(lit("a b  c")).as("f")).head().getLong(0)
    val fp2 = docs.select(TF.fingerprintRolling(lit("a b c")).as("f")).head().getLong(0)
    assert(fp1 == fp2)
  }

  test("exact dedup keeps one representative per digest") {
    val d = Dedup.exact(docs, "doc_id", "text")
    assert(d.count() == docs.select("text").distinct().count())
    assert(d.agg(sum("n_copies")).head().getLong(0) == docs.count())
  }
}
