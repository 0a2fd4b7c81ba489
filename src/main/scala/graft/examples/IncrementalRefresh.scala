package graft.examples

import graft.{GraftSession, Tables}
import graft.operators.{Diff, DigestIndex, Ivm, IvfIndex, MinhashIndex, TermIndex}
import org.apache.spark.sql.functions._

/**
 * The incremental corpus-refresh loop end to end: a new corpus
 * snapshot arrives, [[Diff.snapshot]] classifies every doc against the
 * indexed one, and the delta — never the corpus — flows into all
 * four persisted indexes:
 *
 *   - removed  → tombstones (TermIndex/IvfIndex/DigestIndex.delete,
 *                MinhashIndex.deleteFromIndex — all id-list commits)
 *   - changed  → one-commit upserts (applyCdc: tombstone + segment)
 *   - added    → the same applyCdc segment
 *
 * At 100 TB this is the shape that matters: a daily 0.1% delta costs
 * delta-sized index work (plus the narrow doc-stats scans the exact
 * BM25 re-normalization needs), not a rebuild. Probes afterwards are
 * verified against the refreshed snapshot inline.
 *
 * Run: sbt "runMain graft.examples.IncrementalRefresh [sfDir]"
 */
object IncrementalRefresh {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession.local()

    val docsV1 = Tables.load(spark, sfDir, "documents")
      .select("doc_id", "text", "lang")
    val embV1 = Tables.load(spark, sfDir, "embeddings")
      .select("vec_id", "embedding")

    // ------------------------------------------------------------------
    // Day 0: build the standing indexes over snapshot v1.
    // ------------------------------------------------------------------
    val base = java.nio.file.Files.createTempDirectory("graft_refresh")
    val (tDir, vDir, mDir, dDir) =
      (s"$base/bm25", s"$base/ann", s"$base/neardup", s"$base/exact")
    val tCfg = TermIndex.Config(buckets = 8)
    val vCfg = IvfIndex.Config(dim = 64, nList = 8, iters = 2)
    val mCfg = MinhashIndex.Config()
    TermIndex.build(spark, docsV1, "doc_id", "text", tDir, tCfg)
    IvfIndex.build(spark, embV1, "vec_id", "embedding", vDir, vCfg)
    MinhashIndex.build(spark, docsV1, "doc_id", "text", mDir, mCfg)
    DigestIndex.build(spark, docsV1, "doc_id", "text", dDir).unpersist()

    // ------------------------------------------------------------------
    // Day 1: snapshot v2 (here a deterministic mutation; in production,
    // today's crawl): some docs retired, some revised, some new.
    // ------------------------------------------------------------------
    val docsV2 = docsV1.filter(col("doc_id") % 17 =!= 3)
      .select(col("doc_id"),
        when(col("doc_id") % 13 === 5, concat(col("text"), lit(" revised")))
          .otherwise(col("text")).as("text"), col("lang"))
      .unionByName(docsV1.filter(col("doc_id") % 19 === 7)
        .select((col("doc_id") + 1000000L).as("doc_id"),
          col("text"), col("lang")))

    val delta = Diff.snapshot(docsV1, docsV2,
      keyCols = Seq("doc_id"), compareCols = Seq("text", "lang")).persist()
    val byStatus = delta.groupBy("status").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    println(s"delta: $byStatus")

    val removed = delta.filter(col("status") === "removed").select("doc_id")
    val upserts = docsV2.join(
      delta.filter(col("status").isin("changed", "added")),
      Seq("doc_id"), "left_semi")

    // BM25: the WHOLE delta lands in ONE commit — a single tombstone
    // masks removed + replaced copies, one segment carries the new
    // rows, and scores re-normalize exactly (N, tokens, df).
    TermIndex.applyCdc(spark, tDir, upserts, removed,
      "doc_id", "text", tCfg)

    // ANN: same one-commit shape on the embedding side (revised docs
    // re-embed; the deterministic stand-in flips the sign).
    val changedIds = delta.filter(col("status") === "changed")
      .select(col("doc_id").as("vec_id"))
    val embUpserts = embV1.join(changedIds, Seq("vec_id"), "left_semi")
      .select(col("vec_id"),
        org.apache.spark.sql.functions.transform(
          col("embedding"), x => -x).as("embedding"))
    IvfIndex.applyCdc(spark, vDir, embUpserts,
      removed.select(col("doc_id").as("vec_id")), "vec_id", "embedding",
      vCfg)

    // Near-dup: delete the removals, then replace the delta texts
    // (delete-any-old-copies + ingest; the emitted pairs go to triage).
    MinhashIndex.deleteFromIndex(spark, mDir, removed, "doc_id", mCfg)
    val pairs = MinhashIndex.replaceInIndex(spark, mDir, upserts,
      "doc_id", "text", mCfg)
    val nPairs = pairs.count(); pairs.unpersist()

    // Exact dedup: the same one-commit CDC shape — retired and revised
    // ids tombstone, the revised/new texts' digests enter, and the
    // returned pairs say which "new" docs are byte-identical to
    // something already live (cheap triage before the near-dup pass).
    val exactPairs = DigestIndex.applyCdc(spark, dDir, upserts, removed,
      "doc_id", "text")
    val nExact = exactPairs.count(); exactPairs.unpersist()

    // Maintained view (the DOWNSTREAM consumer of the same delta):
    // per-language corpus stats stay exact across the refresh in
    // O(delta) — deletes carry the v1 BEFORE-IMAGES (removed docs and
    // the old rows of changed docs), inserts carry the v2 rows of
    // changed + added docs. Without this, "docs/chars per language
    // after today's refresh" re-aggregates the corpus.
    val statsOf = (df: org.apache.spark.sql.DataFrame) =>
      df.select(col("lang"), col("doc_id"),
        length(col("text")).cast("long").as("n_chars"))
    val viewDir = s"$base/lang_stats"
    Ivm.create(spark, viewDir, statsOf(docsV1).schema, Ivm.Spec(
      groupCols = Seq("lang"),
      aggs = Seq(Ivm.Count("docs"), Ivm.Sum("n_chars", "chars"))))
    Ivm.applyDelta(spark, viewDir, statsOf(docsV1),
      statsOf(docsV1).limit(0))
    val viewTouched = delta.filter(col("status").isin("removed", "changed"))
      .select("doc_id")
    Ivm.applyDelta(spark, viewDir,
      statsOf(upserts),
      statsOf(docsV1.join(viewTouched, Seq("doc_id"), "left_semi")))

    // ------------------------------------------------------------------
    // Audit: the refreshed indexes answer for snapshot v2.
    // ------------------------------------------------------------------
    val probes = docsV2.filter(col("doc_id") % 29 === 0)
    val hits = TermIndex.topK(spark, tDir, probes, "doc_id", "text", 3, tCfg)
      .persist()
    val nHits = hits.count()
    val removedSet = removed.collect().map(_.getLong(0)).toSet
    val leaked = hits.filter(col("doc_id").isin(removedSet.toSeq: _*)).count()
    hits.unpersist()
    delta.unpersist()
    println(s"refresh: ${byStatus.getOrElse("removed", 0L)} removed, " +
      s"${byStatus.getOrElse("changed", 0L)} re-embedded/re-indexed, " +
      s"${byStatus.getOrElse("added", 0L)} added; " +
      s"near-dup pairs from the delta: $nPairs, exact dups: $nExact")
    println(s"post-refresh bm25 probe rows: $nHits " +
      s"(hits on retired docs: $leaked — must be 0)")
    require(leaked == 0, "a retired doc answered a probe")
    // exact-dedup audit: a byte-copy of every live v2 doc must answer,
    // and never with a retired id
    val copies = docsV2.filter(col("doc_id") % 29 === 0)
      .select((col("doc_id") + 5000000L).as("doc_id"), col("text"))
    val exact = DigestIndex.dupPairs(spark, dDir, copies, "doc_id", "text")
      .persist()
    val nCopies = copies.count(); val nAnswered = exact.count()
    val exactLeaked = exact
      .filter(col("dup_of").isin(removedSet.toSeq: _*)).count()
    exact.unpersist()
    println(s"exact-dup audit: $nAnswered/$nCopies copies answered " +
      s"(hits on retired docs: $exactLeaked — must be 0)")
    require(exactLeaked == 0, "a retired doc answered an exact-dup probe")
    // view audit: the incrementally-maintained stats equal a
    // from-scratch aggregation of snapshot v2
    val viewGot = Ivm.readView(spark, viewDir)
    val viewWant = statsOf(docsV2).groupBy("lang")
      .agg(count(lit(1)).as("docs"), sum("n_chars").as("chars"))
    val viewExact = viewGot.exceptAll(viewWant).isEmpty &&
      viewWant.exceptAll(viewGot).isEmpty
    println(s"view audit: maintained lang stats == v2 recompute: $viewExact")
    require(viewExact, "maintained view diverged from the v2 recompute")
    spark.stop()
  }
}
