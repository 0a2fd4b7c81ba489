package graft.examples

import graft.{GraftSession, Tables}
import graft.operators.{IvfIndex, Retrieval, TermIndex}
import org.apache.spark.sql.functions._

/**
 * The steady-state RAG first stage end to end: ingest a corpus ONCE
 * into the two persisted retrieval indexes (lexical BM25 — TermIndex;
 * dense ANN — IvfIndex), then serve hybrid probes forever off index
 * reads alone — no corpus re-scan, re-tokenize, or re-embed per query
 * batch:
 *
 *   1. build both indexes (batch here; `Streams.cdcRetrievalStream
 *      Indexed` / `cdcStreamIndexed` are the continuous forms)
 *   2. a probe batch arrives → `Retrieval.hybridRrfIndexed` fuses
 *      TermIndex.topK (max-score pruned, exact) with IvfIndex.topK
 *      (list-pruned ANN) by all-integer reciprocal-rank fusion
 *   3. the corpus grows → `IvfIndex.retrain` is the scheduled
 *      maintenance rewrite that keeps dense probe cost O(√n)
 *
 * At 100 TB this is the serving topology: probes cost index reads
 * ∝ probe vocabulary (BM25 buckets) + probed lists (ANN), and the
 * amortized retrain is the only corpus-sized job.
 *
 * Run: sbt "runMain graft.examples.RagRetrieval [sfDir]"
 */
object RagRetrieval {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession.local()

    val docs = Tables.load(spark, sfDir, "documents")
      .select("doc_id", "text")
    val emb = Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id").as("doc_id"), col("embedding"))
    val corpusD = docs.filter(col("doc_id") >= 10)
    val corpusE = emb.filter(col("doc_id") >= 10)
    val (probesD, probesE) =
      (docs.filter(col("doc_id") < 10), emb.filter(col("doc_id") < 10))

    val base = java.nio.file.Files.createTempDirectory("graft_rag")
    val (tDir, vDir) = (s"$base/bm25", s"$base/ann")
    val tCfg = TermIndex.Config(buckets = 8)
    val vCfg = IvfIndex.Config(dim = 64, nList = 8, iters = 2)
    TermIndex.build(spark, corpusD, "doc_id", "text", tDir, tCfg)
    IvfIndex.build(spark, corpusE, "doc_id", "embedding", vDir, vCfg)
    println(s"indexes built under $base")

    // the serving call: both rankers probe their index, ranks fuse
    val fused = Retrieval.hybridRrfIndexed(spark, tDir, vDir,
      probesD, probesE, "doc_id", "text", "embedding",
      kInner = 10, k = 3, termCfg = tCfg, nProbe = 4)
    fused.show(15, truncate = false)

    // corpus growth → scheduled √n retrain bounds dense probe cost
    val v = IvfIndex.retrain(spark, vDir, vCfg)
    val lists = IvfIndex.readCentroids(spark, vDir, v).length
    println(s"retrained to $lists lists at version $v")
    val again = Retrieval.hybridRrfIndexed(spark, tDir, vDir,
      probesD, probesE, "doc_id", "text", "embedding",
      kInner = 10, k = 3, termCfg = tCfg, nProbe = lists)
    println(s"post-retrain fused rows: ${again.count()}")
    spark.stop()
  }
}
