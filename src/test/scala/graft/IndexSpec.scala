package graft

import graft.operators.{Dedup, MinhashIndex}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Index-backed incremental dedup contracts:
 *  - probe == [[Dedup.minhashIncremental]] pair-for-pair (including
 *    jaccard values), on real data AND on a corpus engineered so the
 *    batch pushes a shingle over the df cap (the newly-hot recompute
 *    path);
 *  - appendToIndex leaves the index IDENTICAL to a fresh build over
 *    corpus ∪ batch, table for table — appends never drift;
 *  - the probe's plan reads ONLY the index and the batch: the corpus
 *    text parquet appears in no file scan (the whole point of the
 *    index — per-ingest I/O is index+batch, not corpus text);
 *  - versions chain: two ingests == two incremental probes, and old
 *    versions stay readable until LATEST flips.
 */
class IndexSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .getOrCreate()

  val sf = "/root/testdata/sf0.001"

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def pairSet(df: DataFrame): Set[(Long, Long, Double)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  /** All parquet root paths the plan would scan, including scans hidden
    * inside cached (InMemoryRelation) subtrees and behind AQE nodes. */
  private def physicalScanPaths(
      p: org.apache.spark.sql.execution.SparkPlan): Seq[String] = {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    p.collect {
      case f: FileSourceScanExec => f.relation.location.rootPaths.map(_.toString)
      case a: AdaptiveSparkPlanExec => physicalScanPaths(a.executedPlan)
      case m: InMemoryTableScanExec => physicalScanPaths(m.relation.cachedPlan)
    }.flatten
  }

  private def scanPaths(df: DataFrame): Seq[String] = {
    import org.apache.spark.sql.execution.columnar.InMemoryRelation
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    df.queryExecution.optimizedPlan.collect {
      case l: LogicalRelation => l.relation match {
        case h: HadoopFsRelation => h.location.rootPaths.map(_.toString)
        case _ => Seq.empty[String]
      }
      case m: InMemoryRelation => physicalScanPaths(m.cachedPlan)
    }.flatten
  }

  private def docs(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toSeq.toDF("doc_id", "text")
  }

  test("probe == minhashIncremental on the documents corpus") {
    val d = Tables.load(spark, sf, "documents")
    val cut = graft.operators.Sampling.cuts(Seq(0.9))(1)
    val isNew = graft.operators.Sampling.hashBucket(col("doc_id")) >= lit(cut)
    val existing = d.filter(!isNew)
    val batch = d.filter(isNew)
    val cfg = MinhashIndex.Config() // defaults match dedup_incremental
    val dir = tmp("graft_mhidx")
    MinhashIndex.build(spark, existing, "doc_id", "text", dir, cfg)
    val fromIdx = Dedup.minhashIncrementalFromIndex(spark, dir, batch,
      "doc_id", "text", cfg)
    val inline = Dedup.minhashIncremental(existing, batch, "doc_id", "text")
    val (i, n) = (pairSet(fromIdx), pairSet(inline))
    assert(i == n, s"index=${i.toSeq.sorted} inline=${n.toSeq.sorted}")
    assert(i.nonEmpty, "degenerate test: no incremental pairs at all")
  }

  test("newly-hot shingle: batch pushes a shingle over the cap; probe still exact") {
    // "x y z" has df=3 in the corpus (== cap, kept at build) and df=4
    // once the batch lands (> cap) — the three corpus docs' capped sets
    // all change, exercising the affected-doc band recompute.
    val existing = docs(
      1L -> "x y z a b c d e f",
      2L -> "x y z a b c d e g",
      3L -> "x y z q r s t u v")
    val batch = docs(4L -> "x y z q r s t u w")
    val cfg = MinhashIndex.Config(k = 3, numPerms = 16, bandRows = 2,
      minJ = 0.3, maxShingleDf = 3, nBuckets = 4)
    val dir = tmp("graft_mhidx_hot")
    MinhashIndex.build(spark, existing, "doc_id", "text", dir, cfg)
    val fromIdx = MinhashIndex.incrementalDupPairs(spark, dir, batch,
      "doc_id", "text", cfg)
    val inline = Dedup.minhashIncremental(existing, batch, "doc_id", "text",
      k = 3, numPerms = 16, bandRows = 2, minJ = 0.3, maxShingleDf = 3)
    assert(pairSet(fromIdx) == pairSet(inline))
    assert(pairSet(fromIdx).exists { case (a, b, _) => b == 4L || a == 4L })
  }

  test("appendToIndex == fresh build over corpus ∪ batch, table for table") {
    val existing = docs(
      1L -> "x y z a b c d e f",
      2L -> "x y z a b c d e g",
      3L -> "x y z q r s t u v")
    val batch = docs(4L -> "x y z q r s t u w")
    val cfg = MinhashIndex.Config(k = 3, numPerms = 16, bandRows = 2,
      minJ = 0.3, maxShingleDf = 3, nBuckets = 4)
    val appended = tmp("graft_mhidx_app")
    val fresh = tmp("graft_mhidx_fresh")
    MinhashIndex.build(spark, existing, "doc_id", "text", appended, cfg)
    val v2 = MinhashIndex.appendToIndex(spark, appended, batch, "doc_id", "text", cfg)
    assert(v2 == 2 && MinhashIndex.latestVersion(spark, appended) == 2)
    MinhashIndex.build(spark, existing.unionByName(batch), "doc_id", "text",
      fresh, cfg)
    def t(dir: String, v: Int, comp: String): Set[Seq[Any]] =
      spark.read.parquet(f"$dir/v$v%05d/$comp")
        .collect().map(_.toSeq).toSet
    // the stale bands of docs 1-3 (computed WITH "x y z") must have
    // been replaced — band-table equality with the fresh build proves
    // the newly-hot recompute rewrote exactly what it had to
    assert(t(appended, 2, "bands") == t(fresh, 1, "bands"))
    assert(t(appended, 2, "docs") == t(fresh, 1, "docs"))
    assert(t(appended, 2, "df") == t(fresh, 1, "df"))
    assert(t(appended, 2, "hot") == t(fresh, 1, "hot"))
    assert(t(appended, 2, "warm") == t(fresh, 1, "warm"))
  }

  test("deleteFromIndex: tombstone commit is O(delete); probes exact; compact folds == fresh build") {
    val d = Tables.load(spark, sf, "documents")
    val cut = graft.operators.Sampling.cuts(Seq(0.9))(1)
    val isNew = graft.operators.Sampling.hashBucket(col("doc_id")) >= lit(cut)
    val existing = d.filter(!isNew)
    val batch = d.filter(isNew)
    val delIds = existing.filter(col("doc_id") % 7 === 2).select("doc_id")
    val reduced = existing.join(delIds, Seq("doc_id"), "left_anti")
    val cfg = MinhashIndex.Config()
    val dir = tmp("graft_mhidx_del")
    val fresh = tmp("graft_mhidx_del_fresh")
    MinhashIndex.build(spark, existing, "doc_id", "text", dir, cfg)
    assert(MinhashIndex.deleteFromIndex(spark, dir, delIds, "doc_id", cfg) == 2)
    MinhashIndex.build(spark, reduced, "doc_id", "text", fresh, cfg)
    // the delete commit is a TOMBSTONE: no corpus table in its version
    // directory (the write volume is the id list + batch-sized
    // corrections), and a BASE pointer to the physical tables
    val v2 = new java.io.File(f"$dir/v00002")
    assert(new java.io.File(v2, "BASE").exists(), "delete must write BASE")
    assert(new java.io.File(v2, "tomb").exists())
    Seq("docs", "df", "bands").foreach { comp =>
      assert(!new java.io.File(v2, comp).exists(),
        s"tombstone commit must not rewrite $comp")
    }
    // the probe contract holds over the reduced corpus (masked views)
    val fromIdx = Dedup.minhashIncrementalFromIndex(spark, dir, batch,
      "doc_id", "text", cfg)
    val inline = Dedup.minhashIncremental(reduced, batch, "doc_id", "text")
    assert(pairSet(fromIdx) == pairSet(inline))
    assert(pairSet(fromIdx).nonEmpty, "degenerate: no pairs after delete")
    // compact folds the layer physically: table-for-table == fresh build
    assert(MinhashIndex.compact(spark, dir, cfg) == 3)
    def t(dir: String, v: Int, comp: String): Set[Seq[Any]] =
      spark.read.parquet(f"$dir/v$v%05d/$comp")
        .collect().map(_.toSeq).toSet
    Seq("docs", "df", "hot", "warm", "bands").foreach { comp =>
      assert(t(dir, 3, comp) == t(fresh, 1, comp), s"$comp drifted")
    }
    // compact on a physical version is a no-op
    assert(MinhashIndex.compact(spark, dir, cfg) == 3)
    // gc keeps the base of a retained tombstone version alive: re-probe
    // v2 after a gc that would otherwise reap v1
    MinhashIndex.gc(spark, dir, retainLast = 2)
    assert(new java.io.File(f"$dir/v00001").exists(),
      "gc reaped a BASE version still referenced by retained v2")
    val replay = MinhashIndex.replayDupPairsAt(spark, dir, 2, batch,
      "doc_id", "text", cfg)
    assert(pairSet(replay) == pairSet(inline))
    replay.unpersist()
    spark.catalog.clearCache()
  }

  test("chained tombstone deletes accumulate against one base; append folds all of them") {
    val d = Tables.load(spark, sf, "documents").select("doc_id", "text")
    val del1 = d.filter(col("doc_id") % 7 === 2).select("doc_id")
    val del2 = d.filter(col("doc_id") % 7 === 3).select("doc_id")
    val batch = d.filter(col("doc_id") % 7 === 4)
      .select(col("doc_id") + 1000000L as "doc_id",
        concat(col("text"), lit(" chained")).as("text"))
    val reduced = d.filter(col("doc_id") % 7 =!= 2 && col("doc_id") % 7 =!= 3)
    val cfg = MinhashIndex.Config()
    val dir = tmp("graft_mhidx_chain")
    val fresh = tmp("graft_mhidx_chain_fresh")
    MinhashIndex.build(spark, d, "doc_id", "text", dir, cfg)
    assert(MinhashIndex.deleteFromIndex(spark, dir, del1, "doc_id", cfg) == 2)
    assert(MinhashIndex.deleteFromIndex(spark, dir, del2, "doc_id", cfg) == 3)
    // both tombstone versions share base v1; the second's layer is
    // cumulative
    def base(v: Int): String = {
      val src = scala.io.Source.fromFile(f"$dir/v$v%05d/BASE")
      try src.mkString.trim finally src.close()
    }
    assert(base(2) == "1" && base(3) == "1")
    // probe at v3 == inline over corpus minus BOTH delete sets
    val fromIdx = Dedup.minhashIncrementalFromIndex(spark, dir, batch,
      "doc_id", "text", cfg)
    val inline = Dedup.minhashIncremental(reduced, batch, "doc_id", "text")
    assert(pairSet(fromIdx) == pairSet(inline))
    // an append folds the whole layer physically == fresh build over
    // reduced ∪ batch
    assert(MinhashIndex.appendToIndex(spark, dir, batch,
      "doc_id", "text", cfg) == 4)
    assert(!new java.io.File(f"$dir/v00004/BASE").exists(),
      "append must fold, not chain")
    MinhashIndex.build(spark, reduced.unionByName(batch), "doc_id", "text",
      fresh, cfg)
    def t(dir: String, v: Int, comp: String): Set[Seq[Any]] =
      spark.read.parquet(f"$dir/v$v%05d/$comp")
        .collect().map(_.toSeq).toSet
    Seq("docs", "df", "hot", "warm", "bands").foreach { comp =>
      assert(t(dir, 4, comp) == t(fresh, 1, comp), s"$comp drifted")
    }
    spark.catalog.clearCache()
  }

  test("replaceInIndex == fresh build over the updated corpus, table for table") {
    val d = Tables.load(spark, sf, "documents").select("doc_id", "text")
    val changed = d.filter(col("doc_id") % 5 === 1)
      .select(col("doc_id"), concat(col("text"), lit(" rewritten")).as("text"))
    val updated = d.filter(col("doc_id") % 5 =!= 1).unionByName(changed)
    val cfg = MinhashIndex.Config()
    val dir = tmp("graft_mhidx_repl")
    val fresh = tmp("graft_mhidx_repl_fresh")
    MinhashIndex.build(spark, d, "doc_id", "text", dir, cfg)
    val pairs = MinhashIndex.replaceInIndex(spark, dir, changed,
      "doc_id", "text", cfg)
    pairs.unpersist()
    assert(MinhashIndex.latestVersion(spark, dir) == 3) // delete + ingest
    MinhashIndex.build(spark, updated, "doc_id", "text", fresh, cfg)
    def t(dir: String, v: Int, comp: String): Set[Seq[Any]] =
      spark.read.parquet(f"$dir/v$v%05d/$comp")
        .collect().map(_.toSeq).toSet
    Seq("docs", "df", "hot", "warm", "bands").foreach { comp =>
      assert(t(dir, 3, comp) == t(fresh, 1, comp), s"$comp drifted")
    }
    spark.catalog.clearCache()
  }

  test("deleteFromIndex un-hot transition: a shingle falls back under the cap; bands recomputed") {
    // "x y z" has df=4 > cap=3 at build (hot, excluded from capped
    // sets). Deleting docs 3 and 4 drops it to df=2 — cold again — so
    // docs 1,2 regain it and their bands/jaccards must be recomputed;
    // the inline recompute over the reduced corpus is the oracle.
    val existing = docs(
      1L -> "x y z a b c d e f",
      2L -> "x y z a b c d e g",
      3L -> "x y z q r s t u v",
      4L -> "x y z m n o p q r")
    val batch = docs(5L -> "x y z a b c h i j")
    val cfg = MinhashIndex.Config(k = 3, numPerms = 16, bandRows = 2,
      minJ = 0.3, maxShingleDf = 3, nBuckets = 4)
    val dir = tmp("graft_mhidx_unhot")
    MinhashIndex.build(spark, existing, "doc_id", "text", dir, cfg)
    val hotV1 = spark.read.parquet(f"$dir/v00001/hot")
      .collect().map(_.getString(0)).toSet
    assert(hotV1.contains("x y z"), "fixture: shingle must start hot")
    val delIds = docs(3L -> "", 4L -> "").select("doc_id")
    MinhashIndex.deleteFromIndex(spark, dir, delIds, "doc_id", cfg)
    val hotV2 = spark.read.parquet(f"$dir/v00002/hot")
      .collect().map(_.getString(0)).toSet
    assert(!hotV2.contains("x y z"), "shingle must fall back under the cap")
    val reduced = existing.filter(col("doc_id") < 3)
    val fromIdx = MinhashIndex.incrementalDupPairs(spark, dir, batch,
      "doc_id", "text", cfg)
    val inline = Dedup.minhashIncremental(reduced, batch, "doc_id", "text",
      k = 3, numPerms = 16, bandRows = 2, minJ = 0.3, maxShingleDf = 3)
    assert(pairSet(fromIdx) == pairSet(inline))
    assert(pairSet(fromIdx).nonEmpty, "fixture should pair 5 with 1/2")
  }

  test("warm-slice fallback: a low-df shingle crossing the cap via a shingle-heavy batch") {
    // cap=3 → warm holds df > 1 and the warm path requires
    // max(bdf) <= 2. "p q r" has corpus df=1 (NOT in warm) and bdf=3:
    // only the full-df fallback can see it cross (1+3 > 3). The guard
    // must pick the fallback and stay pair-for-pair exact.
    val existing = docs(
      1L -> "p q r a b c d e f",
      2L -> "m n o a b c d e g")
    val batch = docs(
      4L -> "p q r s t u v w x",
      5L -> "p q r s t u v w y",
      6L -> "p q r s t u v w z")
    val cfg = MinhashIndex.Config(k = 3, numPerms = 16, bandRows = 2,
      minJ = 0.3, maxShingleDf = 3, nBuckets = 4)
    val dir = tmp("graft_mhidx_warmfb")
    MinhashIndex.build(spark, existing, "doc_id", "text", dir, cfg)
    val fromIdx = MinhashIndex.incrementalDupPairs(spark, dir, batch,
      "doc_id", "text", cfg)
    val inline = Dedup.minhashIncremental(existing, batch, "doc_id", "text",
      k = 3, numPerms = 16, bandRows = 2, minJ = 0.3, maxShingleDf = 3)
    assert(pairSet(fromIdx) == pairSet(inline))
    assert(pairSet(fromIdx).nonEmpty, "fixture should produce batch pairs")
  }

  test("probe plan reads ONLY the index and the batch — never corpus text") {
    val d = Tables.load(spark, sf, "documents")
    val cut = graft.operators.Sampling.cuts(Seq(0.9))(1)
    val isNew = graft.operators.Sampling.hashBucket(col("doc_id")) >= lit(cut)
    // batch gets its own parquet dir so path provenance is unambiguous
    val batchDir = tmp("graft_mhidx_batch")
    d.filter(isNew).write.mode("overwrite").parquet(batchDir)
    val batch = spark.read.parquet(batchDir)
    val dir = tmp("graft_mhidx_plan")
    MinhashIndex.build(spark, d.filter(!isNew), "doc_id", "text", dir,
      MinhashIndex.Config())
    val probe = MinhashIndex.incrementalDupPairs(spark, dir, batch,
      "doc_id", "text", MinhashIndex.Config())
    val paths = scanPaths(probe)
    assert(paths.nonEmpty)
    val offenders = paths.filterNot(p => p.contains(dir) || p.contains(batchDir))
    assert(offenders.isEmpty,
      s"probe scanned outside index+batch: $offenders")
    assert(!paths.exists(_.contains(sf)), s"corpus parquet scanned: $paths")
    // the index-side bands scan keeps its bucket layout — the corpus
    // side of the candidate join is never re-shuffled per ingest
    val out = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(out)) { probe.explain("formatted") }
    val f = out.toString
    assert(f.contains("Bucketed: true"),
      s"bands scan lost its bucket layout:\n$f")
  }

  test("crashed append leaves the index untouched; the retry lands cleanly") {
    val existing = docs(
      1L -> "x y z a b c d e f",
      2L -> "x y z a b c d e g")
    val batch = docs(3L -> "x y z a b c d e h")
    val cfg = MinhashIndex.Config(k = 3, numPerms = 16, bandRows = 2,
      minJ = 0.3, maxShingleDf = 100, nBuckets = 4)
    val dir = tmp("graft_mhidx_crash")
    MinhashIndex.build(spark, existing, "doc_id", "text", dir, cfg)
    // simulate an append that died after writing some of v2 but BEFORE
    // flipping LATEST: garbage v2 data must be invisible to probes
    val v2dir = new java.io.File(s"$dir/v00002/docs")
    v2dir.mkdirs()
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/v00002/docs/part-garbage.parquet"),
      "not parquet".getBytes)
    assert(MinhashIndex.latestVersion(spark, dir) == 1, "LATEST must still be v1")
    val pairs1 = MinhashIndex.incrementalDupPairs(spark, dir, batch,
      "doc_id", "text", cfg)
    val inline = Dedup.minhashIncremental(existing, batch, "doc_id", "text",
      k = 3, numPerms = 16, bandRows = 2, minJ = 0.3, maxShingleDf = 100)
    assert(pairSet(pairs1) == pairSet(inline), "probe must read v1 only")
    // the retried append overwrites the partial v2 and commits
    val v2 = MinhashIndex.appendToIndex(spark, dir, batch, "doc_id", "text", cfg)
    assert(v2 == 2 && MinhashIndex.latestVersion(spark, dir) == 2)
    val fresh = tmp("graft_mhidx_crash_fresh")
    MinhashIndex.build(spark, existing.unionByName(batch), "doc_id", "text",
      fresh, cfg)
    def t(d: String, v: Int, comp: String): Set[Seq[Any]] =
      spark.read.parquet(f"$d/v$v%05d/$comp").collect().map(_.toSeq).toSet
    assert(t(dir, 2, "docs") == t(fresh, 1, "docs"),
      "retry must fully replace the crashed partial write")
  }

  test("replay probe at a pinned version == the original ingest's pairs; gc retains the replay window") {
    val existing = docs(
      10L -> "p q r s t u v w x",
      11L -> "p q r s t u v w y")
    val b1 = docs(12L -> "p q r s t u v w z")
    val b2 = docs(13L -> "p q r s t u v w x") // dup of 10
    val cfg = MinhashIndex.Config(k = 3, numPerms = 16, bandRows = 2,
      minJ = 0.3, maxShingleDf = 100, nBuckets = 4)
    val dir = tmp("graft_mhidx_replay")
    MinhashIndex.build(spark, existing, "doc_id", "text", dir, cfg)
    val p1 = pairSet(MinhashIndex.ingest(spark, dir, b1, "doc_id", "text", cfg))
    val p2 = pairSet(MinhashIndex.ingest(spark, dir, b2, "doc_id", "text", cfg))
    assert(MinhashIndex.latestVersion(spark, dir) == 3)
    // at-least-once redelivery: re-probing the version each ingest ran
    // against reproduces its pairs exactly, read-only
    assert(pairSet(MinhashIndex.incrementalDupPairsAt(
      spark, dir, 2, b2, "doc_id", "text", cfg)) == p2)
    assert(pairSet(MinhashIndex.incrementalDupPairsAt(
      spark, dir, 1, b1, "doc_id", "text", cfg)) == p1)
    assert(MinhashIndex.latestVersion(spark, dir) == 3, "replay is read-only")
    // gc keeps the last 2 versions (the replay window) and drops v1
    MinhashIndex.gc(spark, dir, retainLast = 2)
    assert(!new java.io.File(f"$dir/v00001").exists())
    assert(new java.io.File(f"$dir/v00002").exists())
    assert(pairSet(MinhashIndex.incrementalDupPairsAt(
      spark, dir, 2, b2, "doc_id", "text", cfg)) == p2, "retained version probes")
  }

  test("ingest chains versions: probe against v2 == minhashIncremental on the grown corpus") {
    val existing = docs(
      10L -> "p q r s t u v w x",
      11L -> "p q r s t u v w y",
      12L -> "m n o j k l h i g")
    val b1 = docs(13L -> "p q r s t u v w z")
    val b2 = docs(
      14L -> "m n o j k l h i f",
      15L -> "p q r s t u v w x") // dup of 10
    val cfg = MinhashIndex.Config(k = 3, numPerms = 16, bandRows = 2,
      minJ = 0.3, maxShingleDf = 100, nBuckets = 4)
    val dir = tmp("graft_mhidx_chain")
    MinhashIndex.build(spark, existing, "doc_id", "text", dir, cfg)
    val p1 = MinhashIndex.ingest(spark, dir, b1, "doc_id", "text", cfg)
    assert(MinhashIndex.latestVersion(spark, dir) == 2)
    val p2 = MinhashIndex.ingest(spark, dir, b2, "doc_id", "text", cfg)
    assert(MinhashIndex.latestVersion(spark, dir) == 3)
    val i1 = Dedup.minhashIncremental(existing, b1, "doc_id", "text",
      k = 3, numPerms = 16, bandRows = 2, minJ = 0.3, maxShingleDf = 100)
    val i2 = Dedup.minhashIncremental(existing.unionByName(b1), b2,
      "doc_id", "text",
      k = 3, numPerms = 16, bandRows = 2, minJ = 0.3, maxShingleDf = 100)
    assert(pairSet(p1) == pairSet(i1))
    assert(pairSet(p2) == pairSet(i2))
    // the exact dup (10,15) must surface through the index path
    assert(pairSet(p2).exists { case (a, b, j) => a == 10L && b == 15L && j == 1.0 })
  }
}
