package graft

import graft.operators.{ConcurrentCommitException, IvfIndex, MinhashIndex, TermIndex}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Writer mutual exclusion for the persisted index families: every
 * mutation writes data files at version-derived paths BEFORE flipping
 * LATEST, so two writers that both read LATEST=v would corrupt each
 * other's v+1 files pre-commit. VersionedLayout.claimCommit takes an
 * exclusive per-version claim first; this suite pins the protocol
 * deterministically (claims are plain files — a foreign writer is
 * simulated by planting one with another applicationId).
 */
class ConcurrencySpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"
  private def docs = Tables.load(spark, sf, "documents")
    .select(col("doc_id"), col("text"))

  private def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  /** Plant a claim file as a (live) FOREIGN writer would leave it. */
  private def plantForeignClaim(dir: String, v: Int,
                                ts: Long = System.currentTimeMillis()): Unit = {
    val claims = java.nio.file.Paths.get(dir, "claims")
    java.nio.file.Files.createDirectories(claims)
    java.nio.file.Files.write(claims.resolve(f"v$v%05d"),
      s"app-elsewhere-123#deadbeef#$ts".getBytes("UTF-8"))
  }

  private def claimFile(dir: String, v: Int): java.nio.file.Path =
    java.nio.file.Paths.get(dir, "claims", f"v$v%05d")

  private def withTtl[A](ms: Long)(body: => A): A = {
    spark.conf.set("graft.index.claim.ttlMs", ms.toString)
    try body finally spark.conf.unset("graft.index.claim.ttlMs")
  }

  test("TermIndex: a live foreign claim fails the append fast — nothing written, index unchanged") {
    val dir = tmpDir("graft_occ_tidx")
    val d = docs.limit(40).persist()
    val cfg = TermIndex.Config(buckets = 4)
    TermIndex.build(spark, d, "doc_id", "text", dir, cfg)
    val probes = d.filter(col("doc_id") % 7 === 0)
    val before = TermIndex.topK(spark, dir, probes, "doc_id", "text", 3, cfg)
      .collect().toSet

    plantForeignClaim(dir, 2)
    val ex = intercept[ConcurrentCommitException] {
      TermIndex.append(spark, dir, docs.limit(60), "doc_id", "text", cfg)
    }
    assert(ex.getMessage.contains("app-elsewhere-123"))
    assert(TermIndex.latestVersion(spark, dir) == 1,
      "loser must not have committed")
    // fail-fast BEFORE data writes: no stranded s00002 segment
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(dir, "segments", "s00002")),
      "loser must fail before writing any segment data")
    assert(TermIndex.topK(spark, dir, probes, "doc_id", "text", 3, cfg)
      .collect().toSet === before, "readers undisturbed")
    d.unpersist()
  }

  test("expired lease is stolen; successful commit retires the claim") {
    val dir = tmpDir("graft_occ_steal")
    val d = docs.limit(40)
    val cfg = TermIndex.Config(buckets = 4)
    TermIndex.build(spark, d, "doc_id", "text", dir, cfg)
    // a claim from a DEAD writer: foreign app, timestamp older than ttl
    plantForeignClaim(dir, 2, ts = System.currentTimeMillis() - 10000)
    withTtl(1000) {
      val v = TermIndex.append(spark, dir, docs.limit(60), "doc_id", "text", cfg)
      assert(v == 2, "stale foreign lease must be stolen")
    }
    assert(!java.nio.file.Files.exists(claimFile(dir, 2)),
      "winner retires its claim at commit")
  }

  test("same-app strand (claim file, no live holder) reclaims immediately; a LIVE same-app claim blocks until released") {
    val dir = tmpDir("graft_occ_retry")
    val d = docs.limit(40)
    val cfg = TermIndex.Config(buckets = 4)
    TermIndex.build(spark, d, "doc_id", "text", dir, cfg)
    // a crashed same-app attempt leaves only the claim FILE (the live
    // registry entry died with whatever failed to release it) — plant
    // that state directly; the retry must reclaim, not deadlock
    val appId = spark.sparkContext.applicationId
    val claims = java.nio.file.Paths.get(dir, "claims")
    java.nio.file.Files.createDirectories(claims)
    java.nio.file.Files.write(claims.resolve("v00002"),
      s"$appId#dead-strand#${System.currentTimeMillis()}".getBytes("UTF-8"))
    val v = TermIndex.append(spark, dir, docs.limit(60), "doc_id", "text", cfg)
    assert(v == 2)
    // a LIVE same-app claim (another thread mid-commit) blocks a second
    // writer even inside the lease — appIds can't discriminate threads,
    // the in-process registry does; releaseClaim unblocks
    val tok = graft.operators.VersionedLayout.claimCommit(spark, dir, 3, "t")
    val ex = intercept[ConcurrentCommitException] {
      TermIndex.append(spark, dir, docs.limit(50), "doc_id", "text", cfg)
    }
    assert(ex.getMessage.contains("another writer thread"), ex.getMessage)
    graft.operators.VersionedLayout.releaseClaim(spark, dir, 3, tok)
    assert(TermIndex.append(spark, dir, docs.limit(50), "doc_id", "text",
      cfg) == 3)
  }

  test("stale-read guard: a claim for an already-committed version aborts before any write") {
    val dir = tmpDir("graft_occ_stale")
    val cfg = TermIndex.Config(buckets = 4)
    TermIndex.build(spark, docs.limit(40), "doc_id", "text", dir, cfg)
    TermIndex.append(spark, dir, docs.limit(60), "doc_id", "text", cfg)
    // version 2 is committed and its claim retired — a writer that read
    // LATEST=1 before that commit could re-create claims/v00002 and
    // overwrite committed data; the post-claim LATEST re-check stops it
    val ex = intercept[ConcurrentCommitException] {
      graft.operators.VersionedLayout.claimCommit(spark, dir, 2, "t")
    }
    assert(ex.getMessage.contains("already committed"), ex.getMessage)
    assert(!java.nio.file.Files.exists(claimFile(dir, 2)),
      "the aborted claim must not strand its file")
  }

  test("failed mutation releases its claim: an in-session retry proceeds immediately") {
    val dir = tmpDir("graft_occ_release")
    val cfg = TermIndex.Config(buckets = 4)
    TermIndex.build(spark, docs.limit(40), "doc_id", "text", dir, cfg)
    // an append whose body fails after the claim (missing text column →
    // analysis error inside the write path) must release the claim...
    intercept[Exception] {
      TermIndex.append(spark, dir, docs.limit(60).select("doc_id"),
        "doc_id", "text", cfg)
    }
    assert(!java.nio.file.Files.exists(claimFile(dir, 2)),
      "failed attempt must release its claim")
    assert(TermIndex.latestVersion(spark, dir) == 1)
    // ...so the retry needs neither a TTL wait nor a same-app reclaim
    assert(TermIndex.append(spark, dir, docs.limit(60), "doc_id", "text",
      cfg) == 2)
  }

  test("DigestIndex: foreign claim blocks ingest/delete/compact before any write; ttl steal proceeds") {
    import graft.operators.DigestIndex
    val dir = tmpDir("graft_occ_didx") + "/idx"
    val d = docs.limit(40).persist()
    DigestIndex.build(spark, d, "doc_id", "text", dir).unpersist()
    assert(DigestIndex.latestVersion(spark, dir) == 2)

    plantForeignClaim(dir, 3)
    intercept[ConcurrentCommitException] {
      DigestIndex.ingest(spark, dir, docs.limit(60), "doc_id", "text")
        .count()
    }
    intercept[ConcurrentCommitException] {
      DigestIndex.delete(spark, dir, d.select("doc_id").limit(2), "doc_id")
    }
    intercept[ConcurrentCommitException] { DigestIndex.compact(spark, dir) }
    assert(DigestIndex.latestVersion(spark, dir) == 2)
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(dir, "segments", "s00003")),
      "loser must not have written any segment data")
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(dir, "tombs", "d00003")))

    withTtl(0) {
      val p = DigestIndex.ingest(spark, dir, docs.limit(60),
        "doc_id", "text")
      p.count(); p.unpersist()
      assert(DigestIndex.latestVersion(spark, dir) == 3)
    }
    d.unpersist()
  }

  test("two concurrent ingest threads (DigestIndex): one winner per version, loser fails clean and retries to a consistent index") {
    import graft.operators.DigestIndex
    val dir = tmpDir("graft_occ_race") + "/idx"
    // texts made unique per id — the fixture has exact dups, which
    // would make the canonical-id expectation below order-dependent
    val d = docs.limit(60)
      .select(col("doc_id"),
        concat_ws(" ", col("text"), col("doc_id").cast("string")).as("text"))
      .persist()
    val base = d.filter(col("doc_id") < 20)
    val b1 = d.filter(col("doc_id") >= 20 && col("doc_id") < 40)
    val b2 = d.filter(col("doc_id") >= 40)
    DigestIndex.build(spark, base, "doc_id", "text", dir).unpersist()
    assert(DigestIndex.latestVersion(spark, dir) == 2)
    // both threads race the same LATEST; every interleaving must end
    // with both batches ingested exactly once (a loser sees
    // ConcurrentCommitException having written nothing, and retries)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    val gate = new java.util.concurrent.CountDownLatch(1)
    def ingestWithRetry(b: org.apache.spark.sql.DataFrame): Int = {
      gate.await()
      var retries = 0
      var done = false
      while (!done) {
        try {
          DigestIndex.ingest(spark, dir, b, "doc_id", "text").unpersist()
          done = true
        } catch {
          case _: ConcurrentCommitException =>
            // the winner's commit takes seconds — back off instead of
            // burning the retry budget inside its window
            retries += 1
            assert(retries <= 150, "livelock: loser keeps losing")
            Thread.sleep(200)
        }
      }
      retries
    }
    val f1 = scala.concurrent.Future(ingestWithRetry(b1))
    val f2 = scala.concurrent.Future(ingestWithRetry(b2))
    gate.countDown()
    import scala.concurrent.duration._
    val r = scala.concurrent.Await.result(f1.zip(f2), 300.seconds)
    pool.shutdown()
    // exactly two successful commits — one version each, no double
    // bump, no lost batch
    assert(DigestIndex.latestVersion(spark, dir) == 4,
      s"retries: $r, latest: ${DigestIndex.latestVersion(spark, dir)}")
    // the batches are disjoint novel texts, so the final live set is
    // order-independent: byte-copies of EVERY ingested doc must now
    // report that doc as canonical
    val copies = d.select((col("doc_id") + 1000L).as("doc_id"), col("text"))
    val got = DigestIndex.dupPairs(spark, dir, copies, "doc_id", "text")
      .collect().map(r2 => (r2.getLong(0), r2.getLong(1))).toSet
    val want = d.select("doc_id").collect()
      .map(_.getLong(0)).map(i => (i + 1000L, i)).toSet
    assert(got == want)
    d.unpersist()
  }

  test("atomic steal: a stealer paused ARBITRARILY long between its stale read and its create cannot evict the new owner — no sleep in the argument") {
    val dir = tmpDir("graft_occ_pause")
    val cfg = TermIndex.Config(buckets = 4)
    TermIndex.build(spark, docs.limit(40), "doc_id", "text", dir, cfg)
    // a dead writer's stale claim for v2
    plantForeignClaim(dir, 2, ts = System.currentTimeMillis() - 10000)
    // stealer B reads the stale claim and DECIDES to steal — in the
    // generation protocol its entire action is one exclusive create of
    // the next generation name. Simulate B pausing here (arbitrarily
    // long: GC pause, NFS stall) while stealer A proceeds.
    withTtl(1000) {
      val tokA = graft.operators.VersionedLayout.claimCommit(spark, dir, 2, "t")
      // A owns v2 via generation 1; the stale gen-0 file is untouched
      // (steals never delete — that is the point)
      val g1 = java.nio.file.Paths.get(dir, "claims", "v00002.g00001")
      assert(java.nio.file.Files.exists(g1), "steal creates the next generation")
      assert(new String(java.nio.file.Files.readAllBytes(g1), "UTF-8") == tokA)
      assert(java.nio.file.Files.exists(claimFile(dir, 2)),
        "the stale generation is never deleted by a steal")
      // B wakes up NOW — after any amount of time — and performs the
      // only mutation the protocol allows a stealer: the exclusive
      // create of generation 1. The filesystem rejects it; B can never
      // evict A's fresh claim because nothing in the protocol deletes
      // or overwrites an existing generation.
      val bCreate = intercept[Exception] {
        java.nio.file.Files.write(g1,
          s"app-elsewhere-456#cafe#${System.currentTimeMillis()}".getBytes("UTF-8"),
          java.nio.file.StandardOpenOption.CREATE_NEW,
          java.nio.file.StandardOpenOption.WRITE)
      }
      assert(bCreate.isInstanceOf[java.nio.file.FileAlreadyExistsException])
      // and a B that re-runs the full protocol instead sees A's FRESH
      // generation as owner of record and fails fast (foreign + young)
      // — exercised from another "app" by making A's claim look foreign
      // is impossible in-process; the in-process registry already
      // blocks a same-JVM B, which the live-claim test pins. A's claim
      // survives either way:
      assert(new String(java.nio.file.Files.readAllBytes(g1), "UTF-8") == tokA,
        "A's claim content untouched by the failed steal")
      graft.operators.VersionedLayout.commitLatest(spark, dir, 2, 2, tokA)
      assert(TermIndex.latestVersion(spark, dir) == 2)
      // commit retires the WHOLE generation chain
      assert(!java.nio.file.Files.exists(g1))
      assert(!java.nio.file.Files.exists(claimFile(dir, 2)))
    }
  }

  test("late winner of a retired generation name is rejected by the LATEST re-check") {
    val dir = tmpDir("graft_occ_late")
    val cfg = TermIndex.Config(buckets = 4)
    TermIndex.build(spark, docs.limit(40), "doc_id", "text", dir, cfg)
    plantForeignClaim(dir, 2, ts = System.currentTimeMillis() - 10000)
    withTtl(1000) {
      // A steals and COMMITS v2 while B is paused; the whole claim
      // chain is retired with the commit
      TermIndex.append(spark, dir, docs.limit(60), "doc_id", "text", cfg)
      assert(TermIndex.latestVersion(spark, dir) == 2)
      // B wakes: its exclusive create of the (now retired) generation
      // name SUCCEEDS — and the post-claim LATEST re-check rejects it
      // before any data write
      val ex = intercept[ConcurrentCommitException] {
        graft.operators.VersionedLayout.claimCommit(spark, dir, 2, "t")
      }
      assert(ex.getMessage.contains("already committed"), ex.getMessage)
      assert(!java.nio.file.Files.exists(claimFile(dir, 2)),
        "the rejected late claim must not strand its file")
    }
  }

  test("fencing: a stolen-generation commit writes suffixed data paths; a fenced-out writer's manifest write aborts") {
    import spark.implicits._
    val dir = tmpDir("graft_occ_fence")
    val vecs = (0 until 64).map(i =>
      (i.toLong, Array.tabulate(8)(d => ((i * 7 + d) % 13).toFloat)))
      .toDF("id", "vec")
    val cfg = IvfIndex.Config(dim = 8, nList = 4, iters = 1)
    IvfIndex.build(spark, vecs.filter(col("id") < 48), "id", "vec", dir, cfg)
    // a dead writer holds v2: the steal commits under generation 1 and
    // must fence its segment/tombstone names with the x1 suffix, so
    // the dead writer's paths (s00002, d00002) can never collide with
    // what THIS commit's manifest references
    plantForeignClaim(dir, 2, ts = System.currentTimeMillis() - 10000)
    withTtl(1000) {
      val v2 = IvfIndex.upsert(spark, dir, vecs.filter(col("id") >= 48),
        "id", "vec", cfg)
      assert(v2 == 2)
    }
    val segs = IvfIndex.readSegments(spark, dir, 2)
    assert(segs.contains("s00002x1"), s"fenced segment name expected: $segs")
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(dir, "tombs", "d00002x1")),
      "fenced tombstone name expected")
    // fenced names carry the same commit sequence: the upsert's
    // tombstone (seq 2) must mask nothing of its own segment (seq 2),
    // and probes answer every id exactly once
    val got = IvfIndex.topK(spark, dir,
      vecs.filter(col("id") >= 48).limit(2), "id", "vec", 3, nProbe = 8)
      .select("query_id").distinct().count()
    assert(got == 2)
    // a fenced-out writer (its lease stolen mid-body) aborts at the
    // manifest write: simulate by planting a HIGHER generation over a
    // claim this session holds
    val tok3 = graft.operators.VersionedLayout.claimCommit(spark, dir, 3, "t")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "claims", "v00003.g00001"),
      s"app-elsewhere-789#beef#${System.currentTimeMillis()}".getBytes("UTF-8"))
    val ex = intercept[ConcurrentCommitException] {
      graft.operators.VersionedLayout.fenceCheck(spark, dir, 3, "t")
    }
    assert(ex.getMessage.contains("stolen"), ex.getMessage)
    // cleanup: drop the planted thief and release our claim
    java.nio.file.Files.delete(
      java.nio.file.Paths.get(dir, "claims", "v00003.g00001"))
    graft.operators.VersionedLayout.releaseClaim(spark, dir, 3, tok3)
  }

  test("rename-based manifest commit: a writer paused mid-manifest-write across a FULL winner commit cannot clobber the winner's file") {
    import spark.implicits._
    val dir = tmpDir("graft_occ_mwrite") + "/t"
    graft.operators.MergeTable.build(spark, dir, Seq((1L, 10L)).toDF("k", "v"),
      keyCols = Seq("k"), bucketCols = Seq("k"), nBuckets = 4)
    // LOSER: claims v2, writes its data, and BEGINS its manifest write —
    // with the rename-based commit, the content write lands in its
    // claimant-private temp (buckets.txt.wip.g00000), never the shared
    // path. It then pauses (GC pause / FS stall past the TTL).
    val tok = graft.operators.VersionedLayout.claimCommit(
      spark, dir, 3, "MergeTable")
    val vd = java.nio.file.Paths.get(dir, "v00003")
    java.nio.file.Files.createDirectories(vd)
    val loserContent = "0,p00003/__bucket=0,1"
    java.nio.file.Files.write(vd.resolve("buckets.txt.wip.g00000"),
      loserContent.getBytes("UTF-8"))
    // WINNER (another app): steals the lease — exclusive-creates the
    // next claim generation — and completes a FULL commit: its own
    // manifest at ITS GENERATION'S name (gen 1 publishes
    // buckets.txt.g00001 — generations never share a destination),
    // the monotonic pointer-file create, claim retirement.
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "claims", "v00003.g00001"),
      s"app-elsewhere-456#cafe#${System.currentTimeMillis()}".getBytes("UTF-8"))
    val winnerContent = "0,p00003x1/__bucket=0,7"
    val f = graft.operators.VersionedLayout.fs(spark, dir)
    graft.operators.VersionedLayout.atomicWrite(f,
      new org.apache.hadoop.fs.Path(s"$dir/v00003", "buckets.txt.g00001"),
      winnerContent)
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(dir, "latest"))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "latest", "v00003"), "3".getBytes("UTF-8"))
    // loser WAKES and resumes its manifest write on the production path
    // (fencedWrite re-writes its private temp, then re-verifies the
    // lease AFTER the content write): it must abort, having touched
    // nothing shared — the pre-round-12 in-place write would have
    // clobbered the winner's committed manifest right here
    val ex = intercept[ConcurrentCommitException] {
      graft.operators.VersionedLayout.fencedWrite(spark, dir, 3,
        "MergeTable",
        new org.apache.hadoop.fs.Path(s"$dir/v00003", "buckets.txt"),
        loserContent)
    }
    assert(ex.getMessage.contains("fenced out"), ex.getMessage)
    assert(graft.operators.VersionedLayout.fencedRead(f,
      new org.apache.hadoop.fs.Path(s"$dir/v00003", "buckets.txt"))
      == winnerContent,
      "the winner's committed manifest must be byte-intact")
    assert(!java.nio.file.Files.exists(vd.resolve("buckets.txt.wip.g00000")),
      "the fenced-out loser's temp is cleaned up")
    // the r12 residual window — a loser whose lease re-check passes and
    // is then fenced out WITHIN the single rename metadata op — is now
    // structurally closed: even if the loser's rename LANDS (simulated
    // here by writing its stale content at the gen-0 shared name), the
    // max-generation read rule still resolves the winner's manifest
    java.nio.file.Files.write(vd.resolve("buckets.txt"),
      loserContent.getBytes("UTF-8"))
    assert(graft.operators.VersionedLayout.fencedRead(f,
      new org.apache.hadoop.fs.Path(s"$dir/v00003", "buckets.txt"))
      == winnerContent,
      "a late gen-0 rename must never shadow the higher generation")
    assert(graft.operators.MergeTable.readManifest(spark, dir, 3)
      == Seq((0, "p00003x1/__bucket=0", 7L)),
      "readManifest resolves the winner's generation")
    graft.operators.VersionedLayout.releaseClaim(spark, dir, 3, tok)
  }

  test("monotonic pointer files: readers during a commit storm never observe an absent or retreating version") {
    // the pre-r13 single LATEST file flipped via delete+rename, leaving
    // a sub-ms window where a live index read as missing (observed once
    // in the 500k stress race, then retried around). The pointer is now
    // a MONOTONIC FILE SET — commit = one atomic create, read = max
    // over the listing — so the correctness argument needs no sleep and
    // no retry: this test hammers latestVersion from two reader threads
    // through 40 rapid commits and asserts every read is a version that
    // exists and never decreases.
    val dir = tmpDir("graft_occ_flip") + "/t"
    graft.operators.VersionedLayout.commitLatest(spark, dir, 1, 1)
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val bad = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val readers = (1 to 2).map { _ =>
      new Thread(() => {
        var last = 0
        while (!stop.get) {
          try {
            val v = graft.operators.VersionedLayout.latestVersion(
              spark, dir, 1, "t")
            if (v < last) bad.add(s"version retreated: $last -> $v")
            last = v
          } catch {
            case e: Throwable => bad.add(e.toString); stop.set(true)
          }
        }
      })
    }
    readers.foreach(_.start())
    (2 to 40).foreach { v =>
      graft.operators.VersionedLayout.commitLatest(spark, dir, v, 1)
    }
    stop.set(true)
    readers.foreach(_.join(10000))
    assert(bad.isEmpty, bad.toString)
    assert(graft.operators.VersionedLayout.latestVersion(spark, dir, 1, "t")
      == 40)
    // retention window pruned: old pointer names are swept
    val names = new java.io.File(s"$dir/latest").listFiles.map(_.getName)
      .filter(_.startsWith("v"))
    assert(names.length <= 8, names.mkString(","))
    assert(names.contains("v00040"))
  }

  test("commit verifies ownership: a stolen claim aborts the slow writer's flip") {
    val dir = tmpDir("graft_occ_stolen")
    val d = docs.limit(40)
    val cfg = TermIndex.Config(buckets = 4)
    TermIndex.build(spark, d, "doc_id", "text", dir, cfg)
    val tok = graft.operators.VersionedLayout.claimCommit(spark, dir, 2, "t")
    // lease stolen mid-commit (another writer replaced the claim)
    plantForeignClaim(dir, 2)
    intercept[ConcurrentCommitException] {
      graft.operators.VersionedLayout.commitLatest(spark, dir, 2, 2, tok)
    }
    assert(TermIndex.latestVersion(spark, dir) == 1,
      "flip must not happen on a stolen lease")
    // and a RELEASED claim (deleted file) aborts the same way
    val tok2 = s"${spark.sparkContext.applicationId}#not-on-disk#0"
    java.nio.file.Files.deleteIfExists(claimFile(dir, 2))
    intercept[ConcurrentCommitException] {
      graft.operators.VersionedLayout.commitLatest(spark, dir, 2, 2, tok2)
    }
  }

  test("IvfIndex: foreign claims block append/delete/retrain before any write; steal-after-ttl proceeds") {
    import spark.implicits._
    val dir = tmpDir("graft_occ_ivf")
    val vecs = (0 until 64).map(i =>
      (i.toLong, Array.tabulate(8)(d => ((i * 7 + d) % 13).toFloat)))
      .toDF("id", "vec")
    val cfg = IvfIndex.Config(dim = 8, nList = 4, iters = 1)
    IvfIndex.build(spark, vecs, "id", "vec", dir, cfg)

    plantForeignClaim(dir, 2)
    intercept[ConcurrentCommitException] {
      IvfIndex.append(spark, dir, vecs.filter(col("id") < 8), "id", "vec", cfg)
    }
    intercept[ConcurrentCommitException] {
      IvfIndex.delete(spark, dir, vecs.select("id").limit(2), "id")
    }
    intercept[ConcurrentCommitException] { IvfIndex.retrain(spark, dir, cfg) }
    assert(IvfIndex.latestVersion(spark, dir) == 1)
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(dir, "segments", "s00002")))
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(dir, "tombs", "d00002")))

    withTtl(0) {
      assert(IvfIndex.delete(spark, dir, vecs.select("id").limit(2), "id") == 2)
    }
  }

  test("MinhashIndex: foreign claim blocks ingest and delete; ttl steal proceeds and probes stay exact") {
    val dir = tmpDir("graft_occ_mh")
    val d = docs.limit(40).persist()
    val cfg = MinhashIndex.Config(k = 3, numPerms = 16, bandRows = 2,
      nBuckets = 4)
    MinhashIndex.build(spark, d, "doc_id", "text", dir, cfg)

    plantForeignClaim(dir, 2)
    val batch = docs.filter(col("doc_id") >= 40).limit(10)
    intercept[ConcurrentCommitException] {
      MinhashIndex.ingest(spark, dir, batch, "doc_id", "text", cfg).count()
    }
    intercept[ConcurrentCommitException] {
      MinhashIndex.deleteFromIndex(spark, dir, d.select("doc_id").limit(2),
        "doc_id", cfg)
    }
    assert(MinhashIndex.latestVersion(spark, dir) == 1)
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(dir, "v00002")),
      "loser must not have written version tables")

    withTtl(0) {
      val pairs = MinhashIndex.ingest(spark, dir, batch, "doc_id", "text", cfg)
      pairs.count()
      assert(MinhashIndex.latestVersion(spark, dir) == 2)
    }
    spark.catalog.clearCache()
    d.unpersist()
  }

  test("staged-read fence: a fold staged against an older version aborts loudly after an interleaved commit — the interleaved writer's rows survive") {
    import spark.implicits._
    val dir = tmpDir("graft_occ_stage") + "/t"
    // a z-set-shaped table: key (k, x) bucketed by k, counting __mult
    graft.operators.MergeTable.build(spark, dir,
      Seq((1L, "a", 2L), (2L, "b", 1L), (3L, "c", 4L))
        .toDF("k", "x", "__mult"),
      keyCols = Seq("k", "x"), bucketCols = Seq("k"), nBuckets = 4)
    // STAGE a fold read-only at the current version (the r13 staged
    // path: bucket read + netted frame pinned to this version)
    val delta = Seq((1L, "a", 1L)).toDF("k", "x", "__d")
    val staged = graft.operators.JoinIvm.stageFold(spark, dir, "z-set",
      Seq("k", "x"), delta)
    // an INTERLEAVED writer completes a full commit between the
    // staging read and the staged commit's claim
    graft.operators.MergeTable.merge(spark, dir,
      Seq((9L, "z", 5L)).toDF("k", "x", "__mult"),
      Seq.empty[(Long, String)].toDF("k", "x"))
    // the staged commit must abort — committing it would publish the
    // pre-interleave bucket state at a later version, silently erasing
    // the interleaved writer's rows in the touched buckets
    val ex = intercept[ConcurrentCommitException] {
      graft.operators.JoinIvm.commitFold(spark, dir, Seq("k", "x"), staged)
    }
    staged.release()
    assert(ex.getMessage.contains("staged"), ex.getMessage)
    assert(graft.operators.MergeTable.latestVersion(spark, dir) == 3)
    assert(graft.operators.MergeTable.read(spark, dir)
      .as[(Long, String, Long)].collect().toSet ==
      Set((1L, "a", 2L), (2L, "b", 1L), (3L, "c", 4L), (9L, "z", 5L)),
      "interleaved commit intact, staged batch not applied")
    // re-staged against the current state, the same fold commits fine
    val staged2 = graft.operators.JoinIvm.stageFold(spark, dir, "z-set",
      Seq("k", "x"), delta)
    graft.operators.JoinIvm.commitFold(spark, dir, Seq("k", "x"), staged2)
    staged2.release()
    assert(graft.operators.MergeTable.read(spark, dir)
      .as[(Long, String, Long)].collect().toSet ==
      Set((1L, "a", 3L), (2L, "b", 1L), (3L, "c", 4L), (9L, "z", 5L)))
  }
}
