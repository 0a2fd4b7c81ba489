package graft

import graft.sources.Cache
import org.apache.spark.TaskContext
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Executor-side chaos state. A JVM singleton: in local mode every
  * "executor" thread sees the same instance, so tests can record what
  * happened inside tasks and make each partition fail exactly once. */
object ChaosState {
  import java.util.concurrent._
  val events = new ConcurrentLinkedQueue[(Int, Boolean)]() // (shard, failed)
  val failedOnce: java.util.Set[String] = ConcurrentHashMap.newKeySet[String]()
  val computedRows = new atomic.AtomicLong(0L)
  def clear(): Unit = { events.clear(); failedOnce.clear(); computedRows.set(0L) }
  /** Throw once per (tag, partition) — the chaos injection. */
  def failFirst(tag: String): Unit =
    if (failedOnce.add(s"$tag-${TaskContext.getPartitionId()}"))
      throw new RuntimeException(s"chaos: injected failure [$tag]")
}

/**
 * Retry-semantics under task re-execution — chaosmonkey-lite
 * (reference: exec/chaosmonkey_test.go:45-235 randomly kills workers
 * and asserts evaluation converges; Spark's scheduler provides the
 * re-execution, these tests prove OUR operators' side-effect contracts
 * hold under it). Runs on its own `local[4, 2]` context (maxFailures=2
 * — local mode only retries when the master string says so); every
 * partition's first attempt is killed, the retry must converge.
 *
 * Contracts proven:
 *  - writerFunc's error channel: failed attempt → exactly one
 *    onDone(shard, Some(_)); the retry → exactly one onDone(shard,
 *    None); results unchanged (slice.go:434-440's final err call).
 *  - cachePartial: a killed write attempt never commits (temp dropped
 *    by the completion listener, terminator never written); the retry
 *    commits exactly one consistent file per shard; a second run
 *    replays from cache without recomputing upstream.
 *  - Metrics counters: bumps from failed attempts are discarded —
 *    counts are exact when incremented in an action's final stage.
 */
class ChaosSpec extends AnyFunSuite with BeforeAndAfterAll {

  @transient private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    // this suite needs its own context (retries enabled); suites run
    // sequentially in the forked JVM, so swapping contexts at suite
    // boundaries is safe
    SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
      .foreach(_.stop())
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    spark = SparkSession.builder()
      .master("local[4, 2]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
  }

  override def afterAll(): Unit = {
    if (spark != null) spark.stop()
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
  }

  private def rows(n: Int, parts: Int) =
    spark.range(0, n, 1, parts).toDF("v")

  test("writerFunc fires onDone(Some) for the killed attempt, onDone(None) for the retry") {
    ChaosState.clear()
    val parts = 4
    val s = Slice(rows(1000, parts)).writerFunc(
      f = (shard, it) => it.map { r => ChaosState.failFirst("wf"); r },
      onDone = (shard, err) => ChaosState.events.add((shard, err.isDefined)))
    assert(s.count() == 1000L) // retries converge, rows intact
    val byShard = {
      import scala.jdk.CollectionConverters._
      ChaosState.events.asScala.toSeq.groupBy(_._1)
    }
    assert(byShard.keySet == (0 until parts).toSet, byShard)
    byShard.foreach { case (shard, evs) =>
      assert(evs.count(_._2) == 1, s"shard $shard: expected 1 failure event, got $evs")
      assert(evs.count(!_._2) == 1, s"shard $shard: expected 1 success event, got $evs")
    }
  }

  test("cachePartial: killed attempts never commit; retry commits one consistent file per shard") {
    ChaosState.clear()
    val dir = java.nio.file.Files.createTempDirectory("graft_chaos_cache").toString
    val parts = 4
    implicit val le: org.apache.spark.sql.Encoder[java.lang.Long] =
      org.apache.spark.sql.Encoders.LONG
    val upstream = Slice(rows(400, parts)).filterF[java.lang.Long] { _ =>
      ChaosState.failFirst("cp")
      ChaosState.computedRows.incrementAndGet()
      true
    }
    val cached = Cache.cachePartial(upstream, dir)
    val first = cached.df.agg(sum("v")).collect()(0).getLong(0)
    assert(first == (0L until 400L).sum)
    val afterFirst = ChaosState.computedRows.get()
    assert(afterFirst >= 400L, "each row computed at least once")
    // exactly one committed file per shard, no leftover temp files
    val files = java.nio.file.Files.list(java.nio.file.Paths.get(dir))
      .toArray.map(_.toString)
    assert(files.count(_.endsWith(".bin")) == parts, files.toSeq)
    assert(!files.exists(_.endsWith(".tmp")), files.toSeq)
    // second run replays from cache: same rows, upstream NOT recomputed
    val second = cached.df.agg(sum("v")).collect()(0).getLong(0)
    assert(second == first)
    assert(ChaosState.computedRows.get() == afterFirst,
      "replay recomputed upstream rows")
  }

  test("counter bumps from killed attempts are discarded — final count exact") {
    ChaosState.clear()
    val s = Slice(rows(500, 4))
    val c = s.counter("chaos_rows")
    implicit val le: org.apache.spark.sql.Encoder[java.lang.Long] =
      org.apache.spark.sql.Encoders.LONG
    val counted = s.filterF[java.lang.Long] { _ =>
      ChaosState.failFirst("ctr")
      c.incr()
      true
    }
    assert(counted.count() == 500L)
    assert(c.value == 500L,
      s"counter must be exact despite retries, got ${c.value}")
  }
}
