package graft

import graft.operators.{Chunking, Retrieval}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics tests on hand-computable inputs for the round-8 retrieval
  * and selection operators: exact duplicate-span removal (ExactSubstr
  * shape), hybrid reciprocal-rank fusion, DSIR importance weights. */
class RetrievalSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private def docsDf(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  // --- dupSpanRemove ------------------------------------------------------

  test("dupSpanRemove: cross-document span cut everywhere but first occurrence") {
    // docs 1 and 2 share the 4-token span "p q r s"; doc 1 is first
    val df = docsDf(Seq(
      (1L, "a b p q r s c d"),
      (2L, "x p q r s y"),
      (3L, "u v w")))
    val got = Chunking.dupSpanRemove(df, "doc_id", "text", 4)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getString(5)))
    // doc 1: first occurrence kept in full
    assert(got(0) == ((1L, 8L, 5L, 0L, 0L, "a b p q r s c d")))
    // doc 2: exactly the shared window "p q r s" (positions 2..5) cut
    assert(got(1) == ((2L, 6L, 3L, 1L, 4L, "x y")))
    // doc 3: shorter than w → zero windows, text token-rejoined
    assert(got(2) == ((3L, 3L, 0L, 0L, 0L, "u v w")))
  }

  test("dupSpanRemove: self-repetition within one document is cut too") {
    // "m n o p" occurs twice inside doc 1 (positions 1 and 5)
    val df = docsDf(Seq((1L, "m n o p m n o p")))
    val got = Chunking.dupSpanRemove(df, "doc_id", "text", 4)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3), r.getLong(4),
        r.getString(5)))
    // second occurrence (positions 5..8) cut; first kept
    assert(got(0) == ((1L, 8L, 1L, 4L, "m n o p")))
  }

  test("dupSpanRemove: overlapping duplicated windows cut their union of positions") {
    // doc 2 repeats a 6-token span; with w=4 that is three duplicated
    // windows whose union covers all 6 positions (not 3×4 = 12)
    val df = docsDf(Seq(
      (1L, "a b c d e f"),
      (2L, "z a b c d e f z2")))
    val got = Chunking.dupSpanRemove(df, "doc_id", "text", 4)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getLong(4), r.getString(5)))
    assert(got(0) == ((1L, 0L, 0L, "a b c d e f")))
    assert(got(1) == ((2L, 3L, 6L, "z z2")))
  }

  // --- hybridRrf ----------------------------------------------------------

  test("hybridRrf: doc on both lists outranks single-list docs; rrf is the scaled sum") {
    import spark.implicits._
    // corpus: doc 10 shares text AND embedding direction with probe 0;
    // doc 11 shares only text; doc 12 shares only embedding direction
    val corpusText = Seq(
      (10L, "alpha beta gamma delta"),
      (11L, "alpha beta zeta eta"),
      (12L, "one two three four")).toDF("doc_id", "text")
    val probeText = Seq((0L, "alpha beta gamma")).toDF("doc_id", "text")
    val corpusEmb = Seq(
      (10L, Array(1f, 0f, 0f)),
      (11L, Array(0f, 1f, 0f)),
      (12L, Array(0.9f, 0.1f, 0f))).toDF("doc_id", "embedding")
    val probeEmb = Seq((0L, Array(1f, 0f, 0f))).toDF("doc_id", "embedding")
    val got = Retrieval.hybridRrf(corpusText, probeText, corpusEmb, probeEmb,
      "doc_id", "text", "embedding", dim = 3, kInner = 3, k = 3)
      .orderBy("rank").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    // doc 10 is rank 1 on both rankers → rrf = 2 * (1000000 div 61)
    assert(got.head == ((1L, 10L, 2L * (1000000L / 61))))
    // every other doc appears on at most one list → strictly less
    assert(got.tail.forall(_._3 < got.head._3))
    // ranks are 1..3 and all three corpus docs fused in
    assert(got.map(_._1).toSeq == Seq(1L, 2L, 3L))
    assert(got.map(_._2).toSet == Set(10L, 11L, 12L))
  }

  test("hybridRrfIndexed == hybridRrf when the dense probe covers every list") {
    // real corpus slice: docs 10.. are the corpus, docs < 10 the
    // probes (disjoint, so the self-exclusion filter is inert on both
    // paths); embeddings ride the same ids. TermIndex is exact by
    // contract; IvfIndex with nProbe == nList scans every list → its
    // candidate set is the whole corpus → == bruteForceTopK. The fused
    // outputs must therefore be identical row-for-row.
    val sf = "/root/testdata/sf0.001"
    val d = Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("text"))
    val e = Tables.load(spark, sf, "embeddings")
      .withColumnRenamed("vec_id", "doc_id")
      .select(col("doc_id"), col("embedding"))
    val (ct, pt) = (d.filter(col("doc_id") >= 10 && col("doc_id") < 90),
      d.filter(col("doc_id") < 5))
    val (ce, pe) = (e.filter(col("doc_id") >= 10 && col("doc_id") < 90),
      e.filter(col("doc_id") < 5))
    val base = java.nio.file.Files
      .createTempDirectory("graft_rrf_idx").toString
    val tCfg = graft.operators.TermIndex.Config(buckets = 4)
    graft.operators.TermIndex.build(spark, ct, "doc_id", "text",
      s"$base/t", tCfg)
    graft.operators.IvfIndex.build(spark, ce, "doc_id", "embedding",
      s"$base/v", graft.operators.IvfIndex.Config(dim = 64, nList = 4,
        iters = 1))
    val want = Retrieval.hybridRrf(ct, pt, ce, pe, "doc_id", "text",
        "embedding", dim = 64, kInner = 10, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    val got = Retrieval.hybridRrfIndexed(spark, s"$base/t", s"$base/v",
        pt, pe, "doc_id", "text", "embedding", kInner = 10, k = 5,
        termCfg = tCfg, nProbe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(got === want)
    assert(got.nonEmpty)
    spark.catalog.clearCache()
  }

  test("hybridRrfIndexed probe-cost gate: document-shaped batch falls back to the dense leg; search probes fuse both legs") {
    import spark.implicits._
    val base = java.nio.file.Files
      .createTempDirectory("graft_rrf_gate").toString
    // synthetic corpus with rare tokens (so positive-idf mass exists)
    // + deterministic embeddings on the same ids
    val corpusT = (0L until 60L).map(i => (i, s"common u$i s${i % 12}"))
      .toDF("doc_id", "text")
    val corpusE = (0L until 60L).map(i =>
      (i, Array.tabulate(8)(d => ((i * 3 + d) % 7).toFloat)))
      .toDF("doc_id", "embedding")
    val tCfg = graft.operators.TermIndex.Config(buckets = 8) // gate on
    graft.operators.TermIndex.build(spark, corpusT, "doc_id", "text",
      s"$base/t", tCfg)
    graft.operators.IvfIndex.build(spark, corpusE, "doc_id", "embedding",
      s"$base/v", graft.operators.IvfIndex.Config(dim = 8, nList = 2,
        iters = 1))
    val probesEmb = Seq(
      (100L, Array.tabulate(8)(d => (d % 7).toFloat)),
      (101L, Array.tabulate(8)(d => ((d + 3) % 7).toFloat)))
      .toDF("doc_id", "embedding")
    def run(texts: Seq[String]): Set[(Long, Long, Long, Long)] =
      Retrieval.hybridRrfIndexed(spark, s"$base/t", s"$base/v",
          texts.zipWithIndex.map { case (t, i) => (100L + i, t) }
            .toDF("doc_id", "text"),
          probesEmb, "doc_id", "text", "embedding", kInner = 10, k = 5,
          termCfg = tCfg, nProbe = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSet
    // document-shaped batch: priced above the gate → dense-only fusion
    val docText = (0 until 60).map(i => s"u$i").mkString(" ")
    val gotGated = run(Seq(docText, docText))
    assert(Retrieval.lastGateDecision.isDefined,
      "document-shaped batch must trip the gate")
    assert(Retrieval.lastGateDecision.get.candidateFraction > 0.25)
    // equality check for the fallback: probes whose terms are UNKNOWN
    // cost zero (not gated) and produce an empty sparse leg — the
    // fusion must be identical to the gated batch's dense-only fusion
    val wantDense = run(Seq("zzz qqq", "zzz qqq"))
    assert(Retrieval.lastGateDecision.isEmpty,
      "zero-cost probes must not trip the gate")
    assert(gotGated == wantDense && gotGated.nonEmpty)
    // search-shaped probes pass untouched and the sparse leg
    // CONTRIBUTES: u7's unique doc must surface for probe 100
    val gotSearch = run(Seq("u7", "u13"))
    assert(Retrieval.lastGateDecision.isEmpty,
      "search probes must not trip the gate")
    assert(gotSearch.exists { case (p, _, d, _) => p == 100L && d == 7L },
      s"sparse hit for the rare term must fuse in: $gotSearch")
    spark.catalog.clearCache()
  }

  // --- dsirWeights --------------------------------------------------------

  test("dsirWeights: target-typical docs score above off-target docs") {
    // target vocabulary {aa..ad}, off-target {zz..zc}; doc 5 is a raw
    // doc written in target vocabulary, doc 6 in off-target vocabulary
    val tgtText = "aa ab ac ad aa ab ac ad"
    val offText = "zz za zb zc zz za zb zc"
    val df = docsDf(Seq(
      (1L, tgtText), (2L, tgtText), (3L, offText), (4L, offText),
      (5L, "aa ab ac ad"), (6L, "zz za zb zc")))
      .withColumn("is_tgt", col("doc_id") <= 2)
    val got = Retrieval.dsirWeights(df, "doc_id", "text", col("is_tgt"),
      buckets = 64)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got(5) > got(6),
      s"target-vocabulary doc must outscore off-target doc: $got")
    assert(got(1) > got(3), s"pure target doc vs pure off-target doc: $got")
  }

  test("dsirWeights: weight is content-determined, not membership-determined") {
    // two docs with IDENTICAL text, one inside the target slice, one
    // outside — their weights must be equal (the target flag shapes
    // the reference distribution, not the individual score)
    val df = docsDf(Seq(
      (1L, "aa ab ac ad"), (2L, "aa ab ac ad"),
      (3L, "zz za zb zc"), (4L, "qq qa qb qc")))
      .withColumn("is_tgt", col("doc_id") === 1)
    val got = Retrieval.dsirWeights(df, "doc_id", "text", col("is_tgt"),
      buckets = 64)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got(1) == got(2), s"identical text must score identically: $got")
  }
}
