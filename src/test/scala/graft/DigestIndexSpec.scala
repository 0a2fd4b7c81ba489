package graft

import graft.operators.DigestIndex
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Persisted exact-dedup digest index: the load-bearing contract is
 * (id, dup_of) equality with an independent md5-groupBy recompute over
 * the live corpus, under the seen-first-wins ingestion order — across
 * appends, deletes (re-add revival included), compaction, pinned
 * replay, and the bloom fast path (exactness never depends on fpp).
 */
class DigestIndexSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  import spark.implicits._

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("graft_didx").toString

  /** texts chosen so several ids share a text (exact dups) and most
    * don't — ids deliberately NOT aligned with ingestion order. */
  private def doc(id: Long, text: String): (Long, String) = (id, text)

  private def df(rows: Seq[(Long, String)]): DataFrame =
    rows.toDF("doc_id", "text")

  private def pairSet(p: DataFrame): Set[(Long, Long)] =
    p.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  /** Independent recompute of the expected dup pairs for `batch`
    * probed against live index rows `idx` (digest -> canonical id). */
  private def expected(idx: Map[String, Long],
                       batch: Seq[(Long, String)]): Set[(Long, Long)] = {
    val bmin = batch.groupBy(_._2).map { case (t, rs) => t -> rs.map(_._1).min }
    batch.flatMap { case (id, t) =>
      idx.get(md5Hex(t)) match {
        case Some(c) => Some((id, c))
        case None => if (bmin(t) < id) Some((id, bmin(t))) else None
      }
    }.toSet
  }

  private def md5Hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    d.map("%02x".format(_)).mkString
  }

  test("build emits within-corpus pairs; ingest probes are exact against the live digest set") {
    val dir = tmpDir()
    val corpus = Seq(
      doc(10, "alpha beta gamma"), doc(11, "delta epsilon"),
      doc(12, "alpha beta gamma"), // dup of 10
      doc(13, "zeta eta theta"), doc(14, "delta epsilon")) // dup of 11
    val p0 = DigestIndex.build(spark, df(corpus), "doc_id", "text", dir)
    assert(pairSet(p0) === Set((12L, 10L), (14L, 11L)))
    p0.unpersist()
    assert(DigestIndex.latestVersion(spark, dir) == 2) // create + ingest

    // batch: one dup of an indexed doc (larger AND smaller id than the
    // canonical — seen-first must win both ways), one within-batch dup
    // pair, novels
    val batch = Seq(
      doc(5, "alpha beta gamma"),   // dup of indexed 10 (smaller id!)
      doc(20, "zeta eta theta"),    // dup of indexed 13
      doc(21, "iota kappa"), doc(22, "iota kappa"), // within-batch
      doc(23, "lambda mu"))
    val idxNow = Map(
      md5Hex("alpha beta gamma") -> 10L, md5Hex("delta epsilon") -> 11L,
      md5Hex("zeta eta theta") -> 13L)
    val p1 = DigestIndex.ingest(spark, dir, df(batch), "doc_id", "text")
    assert(pairSet(p1) === expected(idxNow, batch))
    assert(pairSet(p1) === Set((5L, 10L), (20L, 13L), (22L, 21L)))
    p1.unpersist()

    // the canonical NOVEL rows entered the index: re-probing the same
    // batch reports the same dups, and the now-indexed canonicals (21,
    // 23) report nothing about themselves (self-pairs are dropped)
    val p2 = DigestIndex.dupPairs(spark, dir, df(batch), "doc_id", "text")
    assert(pairSet(p2) === Set((5L, 10L), (20L, 13L), (22L, 21L)))
  }

  test("quiet batch (all dup) advances the version without a segment; probes unchanged") {
    val dir = tmpDir()
    DigestIndex.build(spark, df(Seq(doc(1, "a a"), doc(2, "b b"))),
      "doc_id", "text", dir).unpersist()
    val v = DigestIndex.latestVersion(spark, dir)
    val p = DigestIndex.ingest(spark, dir,
      df(Seq(doc(9, "a a"))), "doc_id", "text")
    assert(pairSet(p) === Set((9L, 1L)))
    p.unpersist()
    assert(DigestIndex.latestVersion(spark, dir) == v + 1)
    assert(DigestIndex.readManifest(spark, dir, v + 1)
      === DigestIndex.readManifest(spark, dir, v))
  }

  test("delete revives a digest: re-ingest of deleted text is novel and re-enters; masked probes exact") {
    val dir = tmpDir()
    DigestIndex.build(spark,
      df(Seq(doc(1, "t one"), doc(2, "t two"), doc(3, "t three"))),
      "doc_id", "text", dir).unpersist()
    DigestIndex.delete(spark, dir, Seq(2L).toDF("doc_id"), "doc_id")
    // deleted doc no longer answers probes
    val p1 = DigestIndex.dupPairs(spark, dir,
      df(Seq(doc(50, "t two"), doc(51, "t one"))), "doc_id", "text")
    assert(pairSet(p1) === Set((51L, 1L)))
    // re-ingest: "t two" is novel again (seen-first restarts at 50)
    DigestIndex.ingest(spark, dir, df(Seq(doc(50, "t two"))),
      "doc_id", "text").unpersist()
    val p2 = DigestIndex.dupPairs(spark, dir,
      df(Seq(doc(60, "t two"))), "doc_id", "text")
    assert(pairSet(p2) === Set((60L, 50L)),
      "re-added digest must answer with the NEW canonical, not the tombstoned one")
  }

  test("tiered compaction + maintenance compact: probes pair-identical before/after; tombstones fold physically") {
    val dir = tmpDir()
    val cfg = DigestIndex.Config(maxSegments = 3)
    DigestIndex.create(spark, dir, cfg)
    // enough appends to trip tiering repeatedly
    (0 until 6).foreach { i =>
      DigestIndex.ingest(spark, dir,
        df(Seq(doc(100L + i, s"novel text $i"), doc(200L + i, s"shared text"))),
        "doc_id", "text", cfg).unpersist()
    }
    // "shared text" canonical is 200 (first batch); later 201..205 were
    // dups and never entered
    val probe = df(Seq(doc(900, "shared text"), doc(901, "novel text 4"),
      doc(902, "never seen")))
    val before = pairSet(DigestIndex.dupPairs(spark, dir, probe,
      "doc_id", "text", cfg))
    assert(before === Set((900L, 200L), (901L, 104L)))
    DigestIndex.delete(spark, dir, Seq(104L).toDF("doc_id"), "doc_id")
    val afterDel = pairSet(DigestIndex.dupPairs(spark, dir, probe,
      "doc_id", "text", cfg))
    assert(afterDel === Set((900L, 200L)))
    val vC = DigestIndex.compact(spark, dir, cfg)
    assert(DigestIndex.readTombstones(spark, dir, vC).isEmpty,
      "compaction must retire folded tombstones")
    assert(DigestIndex.readManifest(spark, dir, vC).length == 1)
    assert(pairSet(DigestIndex.dupPairs(spark, dir, probe,
      "doc_id", "text", cfg)) === afterDel,
      "maintenance compact must not change probe results")
  }

  test("pinned replay: dupPairsAt(old version) ignores later ingests; gc'd pins fail loudly") {
    val dir = tmpDir()
    DigestIndex.build(spark, df(Seq(doc(1, "x x"))), "doc_id", "text", dir)
      .unpersist()
    val v2 = DigestIndex.latestVersion(spark, dir)
    DigestIndex.ingest(spark, dir, df(Seq(doc(2, "y y"))), "doc_id", "text")
      .unpersist()
    val probe = df(Seq(doc(9, "y y")))
    assert(pairSet(DigestIndex.dupPairsAt(spark, dir, v2, probe,
      "doc_id", "text")) === Set.empty[(Long, Long)])
    assert(pairSet(DigestIndex.dupPairs(spark, dir, probe,
      "doc_id", "text")) === Set((9L, 2L)))
    DigestIndex.gc(spark, dir, retainLast = 1)
    intercept[IllegalArgumentException] {
      DigestIndex.dupPairsAt(spark, dir, v2, probe, "doc_id", "text")
    }
    // latest still works after gc
    assert(pairSet(DigestIndex.dupPairs(spark, dir, probe,
      "doc_id", "text")) === Set((9L, 2L)))
  }

  test("bloom fp floods cannot change results: fpp=0.5 probe equals fpp=0.0001 probe on the same data") {
    val corpus = (0L until 200L).map(i => doc(i, s"corpus text number $i"))
    val batch = (0L until 50L).map(i =>
      if (i % 5 == 0) doc(1000L + i, s"corpus text number ${i * 3}")
      else doc(1000L + i, s"batch novel $i"))
    val got = Seq(0.5, 0.0001).map { fpp =>
      val dir = tmpDir()
      val cfg = DigestIndex.Config(fpp = fpp)
      DigestIndex.build(spark, df(corpus), "doc_id", "text", dir, cfg)
        .unpersist()
      pairSet(DigestIndex.dupPairs(spark, dir, df(batch),
        "doc_id", "text", cfg))
    }
    assert(got(0) === got(1))
    assert(got(0) === (0L until 50L by 5).map(i =>
      (1000L + i, i * 3)).toSet)
  }

  test("bloom byte budget: driver-side Bloom bytes stay bounded across CDC churn; capped filters stay exact") {
    // budget far below the fpp-optimal size so the cap engages from
    // the first segment: 256 B = 2048 bits vs ~19 bits/row at
    // fpp=1e-4 for a 300-row segment (~5.7 kbit optimal)
    val cfg = DigestIndex.Config(fpp = 0.0001, maxSegments = 3,
      bloomMaxBytes = 256)
    val dir = tmpDir()
    val corpus = (0L until 300L).map(i => doc(i, s"budget corpus $i"))
    DigestIndex.build(spark, df(corpus), "doc_id", "text", dir, cfg)
      .unpersist()
    def bloomFiles(): Seq[java.io.File] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isFile) { if (f.getName == "BLOOM") Seq(f) else Seq.empty }
        else Option(f.listFiles).map(_.toSeq.flatMap(walk))
          .getOrElse(Seq.empty)
      walk(new java.io.File(dir))
    }
    val churn = (0L until 60L)
    (1 to 12).foreach { i =>
      val ups = df(churn.map(id => doc(id, s"churned $i text $id")))
      DigestIndex.applyCdc(spark, dir, ups,
        ups.select(col("doc_id")).limit(0), "doc_id", "text", cfg)
        .unpersist()
      DigestIndex.gc(spark, dir, retainLast = 2)
      // EVERY on-disk filter obeys the per-segment budget (+ the
      // serialization header), at every point of the churn — driver
      // probe memory is Σ over manifest segments of these files
      val sizes = bloomFiles().map(_.length)
      assert(sizes.nonEmpty)
      assert(sizes.forall(_ <= cfg.bloomMaxBytes + 64),
        s"commit $i: bloom over budget: $sizes")
      // segment count is bounded by the tier policy, so Σ bloom bytes
      // is bounded by segments × budget, independent of corpus rows
      assert(sizes.length <= cfg.maxSegments + 2,
        s"commit $i: ${sizes.length} bloom files on disk")
    }
    // budget-capped (fp-degraded) filters still answer exactly: the
    // verify join restores exactness, blooms only propose
    val live = (0L until 300L).map { i =>
      if (i < 60L) md5Hex(s"churned 12 text $i") -> i
      else md5Hex(s"budget corpus $i") -> i
    }.toMap
    val batch = (0L until 40L).map(i =>
      if (i % 4 == 0) doc(5000L + i, s"churned 12 text ${i / 4}")
      else doc(5000L + i, s"novel probe $i"))
    val got = pairSet(DigestIndex.dupPairs(spark, dir, df(batch),
      "doc_id", "text", cfg))
    assert(got === expected(live, batch))
  }

  test("streaming batch body: redelivery re-emits identical pairs read-only; divergence fails fast") {
    val dir = tmpDir()
    val cfg = DigestIndex.Config()
    val b0 = df(Seq(doc(1, "s one"), doc(2, "s two"), doc(3, "s one")))
    val b1 = df(Seq(doc(4, "s two"), doc(5, "s three")))
    val emitted = scala.collection.mutable.ArrayBuffer[Set[(Long, Long)]]()
    def run(b: DataFrame, id: Long): Unit =
      graft.streaming.Streams.exactDedupIndexedBatch(b, id, "doc_id",
        "text", dir, cfg, retainVersions = 2) { (p, _) =>
        emitted += pairSet(p)
      }
    run(b0, 0); run(b1, 1)
    assert(emitted.toSeq === Seq(Set((3L, 1L)), Set((4L, 2L))))
    val vAfter = DigestIndex.latestVersion(spark, dir)
    // redelivery of batch 1 (foreachBatch at-least-once): identical
    // pairs, no double-ingest, version unchanged
    run(b1, 1)
    assert(emitted.last === Set((4L, 2L)))
    assert(DigestIndex.latestVersion(spark, dir) == vAfter)
    // checkpoint/index divergence (skipped batch id) fails fast
    intercept[IllegalStateException] { run(b1, 7) }
  }

  test("applyCdc: one-commit upsert+delete, delete-wins, pairs replayable read-only via cdcPairsAt") {
    val dir = tmpDir()
    // build order 1,2,3,4: "c two" canonical is 2 (4 was a dup, never
    // entered — the one-live-row-per-digest invariant)
    DigestIndex.build(spark, df(Seq(doc(1, "c one"), doc(2, "c two"),
      doc(3, "c three"), doc(4, "c two"))), "doc_id", "text", dir)
      .unpersist()
    val vPre = DigestIndex.latestVersion(spark, dir)
    val ups = df(Seq(
      doc(2, "c two changed"), // text change of a live canonical
      doc(5, "c three"),       // takes over 3's text — 3 dies below
      doc(6, "c six"), doc(7, "c six"), // within-batch pair
      doc(9, "c one"),         // dup of the surviving canonical 1
      doc(8, "gone")))         // also deleted in this batch
    val dels = Seq(3L, 8L).toDF("doc_id")
    val p = DigestIndex.applyCdc(spark, dir, ups, dels, "doc_id", "text")
    // 9 pairs to 1 (still live); 7 pairs within-batch to 6; 5's text is
    // novel BECAUSE 3 dies in this same commit; 2's new text novel;
    // 8 resolves delete-wins (no pair, not ingested)
    assert(pairSet(p) === Set((9L, 1L), (7L, 6L)))
    p.unpersist()
    assert(DigestIndex.latestVersion(spark, dir) == vPre + 1)
    // read-only replay against the pre-CDC version: identical pairs
    assert(pairSet(DigestIndex.cdcPairsAt(spark, dir, vPre, ups, dels,
      "doc_id", "text")) === Set((9L, 1L), (7L, 6L)))
    // post-state probes: per-digest canonicals of the RESOLVED corpus
    val probe = df(Seq(doc(90, "c three"), doc(91, "c two"),
      doc(92, "c two changed"), doc(93, "gone"), doc(94, "c one"),
      doc(95, "c six")))
    assert(pairSet(DigestIndex.dupPairs(spark, dir, probe, "doc_id", "text"))
      === Set((90L, 5L),  // re-entered under the upserting id
              (92L, 2L),  // the changed text answers with 2
              (94L, 1L), (95L, 6L)),
      "91 ('c two' — canonical 2 upserted away, dup 4 never entered) " +
        "and 93 (delete-wins) must be novel")
    // and the CDC commit equals a fresh build over the resolved corpus
    val dir2 = tmpDir()
    DigestIndex.build(spark, df(Seq(doc(1, "c one"),
      doc(2, "c two changed"), doc(5, "c three"), doc(6, "c six"))),
      "doc_id", "text", dir2).unpersist()
    assert(pairSet(DigestIndex.dupPairs(spark, dir2, probe, "doc_id", "text"))
      === pairSet(DigestIndex.dupPairs(spark, dir, probe, "doc_id", "text")))
  }

  test("CDC streaming batch body: redelivery re-emits identically without double-apply") {
    val dir = tmpDir()
    val cfg = DigestIndex.Config()
    def ev(rows: (String, Long, String)*): DataFrame =
      rows.toDF("op", "doc_id", "text")
    val emitted = scala.collection.mutable.ArrayBuffer[Set[(Long, Long)]]()
    def run(b: DataFrame, id: Long): Unit =
      graft.streaming.Streams.cdcExactDedupBatch(b, id, "op", "doc_id",
        "text", dir, cfg, retainVersions = 2) { (p, _) =>
        emitted += pairSet(p)
      }
    run(ev(("upsert", 1, "k one"), ("upsert", 2, "k two"),
      ("upsert", 3, "k one")), 0)
    run(ev(("upsert", 4, "k two edited"), ("delete", 2, ""),
      ("upsert", 6, "k one")), 1)
    assert(emitted.toSeq === Seq(Set((3L, 1L)), Set((6L, 1L))))
    val vAfter = DigestIndex.latestVersion(spark, dir)
    run(ev(("upsert", 4, "k two edited"), ("delete", 2, ""),
      ("upsert", 6, "k one")), 1) // redelivery
    assert(emitted.last === Set((6L, 1L)))
    assert(DigestIndex.latestVersion(spark, dir) == vAfter,
      "redelivery must not commit")
    // "k two" died with 2's delete: novel again
    run(ev(("upsert", 7, "k two"), ("upsert", 8, "k two")), 2)
    assert(emitted.last === Set((8L, 7L)))
    intercept[IllegalStateException] { run(ev(("upsert", 9, "z")), 9) }
  }

  test("scale shape: a mostly-novel batch's verify scan is candidate-sized (bloom prunes the index read)") {
    val dir = tmpDir()
    val corpus = (0L until 500L).map(i => doc(i, s"stable corpus doc $i"))
    DigestIndex.build(spark, df(corpus), "doc_id", "text", dir).unpersist()
    // 100 novel + 3 dup: bloom passes ~3 + fp; the pushdown path takes
    // the isin branch (collect ≤ MaxPushdownCandidates) — assert via
    // the executed result being exact AND the candidate filter present
    val batch = (0L until 100L).map(i => doc(2000L + i, s"fresh doc $i")) ++
      Seq(doc(3000, "stable corpus doc 7"), doc(3001, "stable corpus doc 8"),
        doc(3002, "stable corpus doc 9"))
    val pairs = DigestIndex.dupPairs(spark, dir, df(batch), "doc_id", "text")
    assert(pairSet(pairs) === Set((3000L, 7L), (3001L, 8L), (3002L, 9L)))

    // the contract is a PLAN property, not just a result: the segment
    // verify scans must carry the candidate-digest filter (pushdown →
    // file min/max + row-group skipping at scale) — same assertion
    // shape as the sibling indexes' id-pushdown tests
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p.collect {
      case f: FileSourceScanExec => Seq(f)
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case s: QueryStageExec => scans(s.plan)
      case r: ReusedExchangeExec => scans(r.child)
    }.flatten
    val again = DigestIndex.dupPairs(spark, dir, df(batch), "doc_id", "text")
    again.collect()
    val segScans = scans(again.queryExecution.executedPlan).filter(
      _.relation.location.rootPaths.exists(_.toString.contains("/segments/")))
    assert(segScans.nonEmpty, "the probe must read the segment data")
    assert(segScans.forall(_.dataFilters.exists(
      _.references.exists(_.name == "digest"))),
      s"verify scans must push the candidate digests: $segScans")
  }

  test("tombstone byte budget: long churn keeps retained tombstone bytes bounded via fold escalation; probes stay exact") {
    // CHURN SHAPE that pins the r10 gap: a kept base r-segment pins
    // tombstones live forever, and the coalesced (id, max seq) dataset
    // regrows with distinct churned ids — unbounded if churn
    // eventually touches most ids. The budget escalates a fold to a
    // FULL merge when the retained tombstone bytes exceed it, retiring
    // every tombstone.
    def tombFiles(dir: String, v: Int): Seq[String] =
      DigestIndex.readTombstones(spark, dir, v)
    def tombDiskBytes(dir: String, v: Int): Long =
      tombFiles(dir, v).map { t =>
        val p = java.nio.file.Paths.get(dir, "tombs", t)
        if (!java.nio.file.Files.exists(p)) 0L
        else {
          val s = java.nio.file.Files.walk(p)
          try s.filter(java.nio.file.Files.isRegularFile(_))
            .mapToLong(java.nio.file.Files.size(_)).sum
          finally s.close()
        }
      }.sum
    def churn(cfg: DigestIndex.Config): (String, Seq[Long]) = {
      val dir = tmpDir() + "/idx"
      val base = (0L until 30L).map(i => doc(i, s"base text $i"))
      DigestIndex.build(spark, df(base), "doc_id", "text", cfg = cfg,
        dir = dir).unpersist()
      // 12 upsert commits, each touching a FRESH id range — churned-id
      // cardinality grows monotonically, the unbounded-c-dataset shape
      val bytesPerV = (0 until 12).map { k =>
        val ids = (1000L + k * 10L) until (1000L + k * 10L + 10L)
        val batch = ids.map(i => doc(i, s"churn $k text $i"))
        DigestIndex.upsert(spark, dir, df(batch), "doc_id", "text", cfg)
          .unpersist()
        tombDiskBytes(dir, DigestIndex.latestVersion(spark, dir))
      }
      (dir, bytesPerV)
    }
    // control: effectively-unbounded budget — tombstones accumulate
    // (the base r-segment from the build is kept by tier merges)
    val (dirC, bytesC) = churn(DigestIndex.Config(maxSegments = 3,
      tombMaxBytes = Long.MaxValue))
    // budgeted: a 1-byte budget forces escalation at EVERY fold —
    // tombstones retire whenever a fold commits
    val (dirB, bytesB) = churn(DigestIndex.Config(maxSegments = 3,
      tombMaxBytes = 1L))
    assert(bytesC.max > 0, "control must accumulate retained tombstones")
    // escalation retires tombstones at folds: the budgeted run's
    // retained bytes return to zero repeatedly and never exceed one
    // fold cycle's worth of fresh tombstones
    assert(bytesB.count(_ == 0L) >= 3,
      s"escalated folds must retire tombstones: $bytesB")
    assert(bytesB.max < bytesC.max,
      s"budgeted churn must stay below the unbounded control: " +
        s"${bytesB.max} vs ${bytesC.max}")
    // after an escalated fold the manifest is a single full merge and
    // NO tombstones
    val vB = DigestIndex.latestVersion(spark, dirB)
    val foldedV = (2 to vB).findLast(v => tombFiles(dirB, v).isEmpty).get
    assert(DigestIndex.readManifest(spark, dirB, foldedV)
      .forall(_._1.startsWith("r")), "escalation must fold everything")
    // correctness unmoved by escalation: byte-copies of the live docs
    // dedup against them identically in both runs
    val lastIds = (1110L until 1120L)
    val copies = df(lastIds.map(i => doc(i + 9000L, s"churn 11 text $i")))
    val want = lastIds.map(i => (i + 9000L, i)).toSet
    assert(pairSet(DigestIndex.dupPairs(spark, dirB, copies, "doc_id",
      "text")) == want)
    assert(pairSet(DigestIndex.dupPairs(spark, dirC, copies, "doc_id",
      "text")) == want)
  }
}
