package graft.examples

import graft.{GraftSession, Tables}
import graft.operators.{Cms, Hll, IvfIndex, TermIndex}
import org.apache.spark.sql.functions._

/**
 * The standing-index MAINTENANCE loop — what an operator runs on a
 * cadence once continuous ingest (see [[IncrementalRefresh]] /
 * `Streams.cdc*StreamIndexed`) is the steady state:
 *
 *   1. ingest absorbs append-only batches (LSM segments, tiered
 *      compaction bounds write volume to O(N));
 *   2. `retrain` re-clusters the ANN index on a schedule, growing the
 *      list count with √corpus so per-list candidate work — and probe
 *      cost — stays O(√n) instead of O(n) under a frozen layout;
 *   3. `compact` folds outstanding tombstones physically after a big
 *      delete, `gc` bounds disk to the retained replayable versions;
 *   4. the sketch family (deterministic HLL / count-min) profiles the
 *      indexed corpus in one cheap pass each — the health numbers a
 *      100 TB deployment trends per day.
 *
 * Everything here is delta- or metadata-sized except the scheduled
 * retrain, which is the ONE amortized full rewrite the √n growth
 * policy rides on.
 *
 * Run: sbt "runMain graft.examples.IndexMaintenance [sfDir]"
 */
object IndexMaintenance {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession.local()
    import spark.implicits._

    val docs = Tables.load(spark, sfDir, "documents")
      .select("doc_id", "text")
    val emb = Tables.load(spark, sfDir, "embeddings")
      .select("vec_id", "embedding")
    val base = java.nio.file.Files.createTempDirectory("graft_maint")
    val (tDir, vDir) = (s"$base/bm25", s"$base/ann")

    // -- day 0: build, then a week of appends --------------------------
    val dim = emb.select(size(col("embedding"))).first().getInt(0)
    val annCfg = IvfIndex.Config(dim = dim, nList = 4, iters = 2)
    IvfIndex.build(spark, emb.filter(col("vec_id") % 8 === 0),
      "vec_id", "embedding", vDir, annCfg)
    TermIndex.build(spark, docs.filter(col("doc_id") % 8 === 0),
      "doc_id", "text", tDir)
    (1 to 7).foreach { d =>
      IvfIndex.append(spark, vDir, emb.filter(col("vec_id") % 8 === d),
        "vec_id", "embedding", annCfg)
      TermIndex.append(spark, tDir, docs.filter(col("doc_id") % 8 === d),
        "doc_id", "text")
    }
    println(s"after 7 appends: ann v${IvfIndex.latestVersion(spark, vDir)}" +
      s" (${IvfIndex.readCentroids(spark, vDir,
        IvfIndex.latestVersion(spark, vDir)).length} lists), " +
      s"bm25 v${TermIndex.latestVersion(spark, tDir)}")

    // -- scheduled retrain: the sqrt(n) growth step --------------------
    // balanced ingest never trips the drift guard, so a deployment
    // retrains on a cadence; the rewrite is the one O(N) pass and the
    // probe cost it buys stays O(sqrt n)
    val vAfter = IvfIndex.retrain(spark, vDir, annCfg)
    println(s"retrain -> v$vAfter with " +
      s"${IvfIndex.readCentroids(spark, vDir, vAfter).length} lists " +
      s"(sqrt growth over ${emb.count()} rows)")

    // -- delete a slice, fold it physically, bound disk ----------------
    TermIndex.delete(spark, tDir,
      docs.filter(col("doc_id") % 11 === 5).select("doc_id"))
    TermIndex.compact(spark, tDir)
    IvfIndex.delete(spark, vDir,
      emb.filter(col("vec_id") % 11 === 5).select("vec_id"), "vec_id")
    IvfIndex.compact(spark, vDir)
    TermIndex.gc(spark, tDir, retainLast = 2)
    IvfIndex.gc(spark, vDir, retainLast = 2)
    println(s"post-compact+gc: bm25 v${TermIndex.latestVersion(spark, tDir)}" +
      s", ann v${IvfIndex.latestVersion(spark, vDir)} " +
      "(older versions reaped, tombstones folded)")

    // -- probes on the maintained indexes ------------------------------
    val probes = docs.limit(3)
    TermIndex.topK(spark, tDir, probes, "doc_id", "text", 3)
      .orderBy("probe_id", "rank").show(9, truncate = false)
    IvfIndex.topK(spark, vDir, emb.limit(3), "vec_id", "embedding", 3)
      .orderBy("query_id", "rnk").show(9, truncate = false)

    // -- sketch-pass health numbers ------------------------------------
    val live = docs.join(docs.filter(col("doc_id") % 11 === 5)
      .select("doc_id"), Seq("doc_id"), "left_anti")
    Hll.approxDistinct(live.withColumn("g", lit("live_docs")),
      Seq("g"), col("doc_id")).show(truncate = false)
    val sketch = Cms.build(
      live.select(explode(split(lower(col("text")), "\\s+")).as("tok"))
        .filter(length(col("tok")) > 0), col("tok"))
    Cms.pointEstimates(sketch,
      Seq("the", "of", "zyzzyva").toDF("pk"), "pk")
      .orderBy("pk").show(truncate = false)

    spark.stop()
  }
}
