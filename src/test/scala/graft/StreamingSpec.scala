package graft

import graft.streaming.Streams
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming extension: the incremental rollup must agree with the
  * batch computation over the same finite input. */
class StreamingSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .getOrCreate()

  val sf = "/root/testdata/sf0.001"

  test("streaming windowed counts == batch groupBy over the same data") {
    val stream = Streams.windowedTypeCounts(
      Streams.eventsStream(spark, sf), "1 hour", "2 hours")
    val got = Streams.runToMemory(spark, stream, "win_counts")
      .select("win_start", "event_type", "n")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet

    val batch = Tables.load(spark, sf, "events")
      .groupBy(date_trunc("hour", col("ts")).as("win_start"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet

    assert(got == batch)
    assert(got.nonEmpty)
  }

  test("streaming dedup keeps exactly the batch-distinct key set") {
    val stream = Streams.dedupStream(
      Streams.eventsStream(spark, sf), Seq("event_type"), "ts", "10 minutes")
    val got = Streams.runToMemory(spark, stream, "dedup_stream", "append")
      .select("event_type").collect().map(_.getString(0)).toSeq
    val expect = Tables.load(spark, sf, "events")
      .select("event_type").distinct().collect().map(_.getString(0)).toSet
    // exactly one survivor per key (which arrival survives is
    // micro-batch-order-dependent; the KEY SET is the contract)
    assert(got.size == got.toSet.size, "duplicate keys survived")
    assert(got.toSet == expect)
  }

  test("streaming session_window == batch session_window (closed sessions)") {
    val gap = "240 minutes"
    // batch: session_window works identically on a static frame
    val batchAll = Streams.sessionWindows(Tables.load(spark, sf, "events"), gap)
    val maxTs = Tables.load(spark, sf, "events")
      .agg(max(unix_micros(col("ts")))).head().getLong(0)
    val closed = batchAll
      .filter(unix_micros(col("session_end")) <= maxTs)
      .select(col("user_id"), unix_micros(col("session_start")).as("s"), col("n_events"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    val stream = Streams.sessionWindows(Streams.eventsStream(spark, sf), gap)
    val got = Streams.runToMemory(spark, stream, "sessions_sw", "append")
      .select(col("user_id"), unix_micros(col("session_start")).as("s"), col("n_events"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    // append emits exactly the watermark-finalized sessions
    assert(got.nonEmpty)
    assert(got.subsetOf(closed ++ got), "sanity")
    assert(closed.subsetOf(got), s"missing ${(closed -- got).take(3)}")
  }

  test("flatMapGroupsWithState sessionization == session_window (closed sessions)") {
    val gapMin = 240L
    val events = Tables.load(spark, sf, "events")
    val maxTs = events.agg(max(unix_micros(col("ts")))).head().getLong(0)
    val expect = Streams.sessionWindows(events, s"$gapMin minutes")
      .filter(unix_micros(col("session_end")) <= maxTs)
      .select(col("user_id"), unix_micros(col("session_start")).as("s"),
        col("n_events"), col("sum_value"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    val stream = Streams.sessionizeCustomState(
      Streams.eventsStream(spark, sf), gapMin)
    val got = Streams.runToMemory(spark, stream.toDF(), "sessions_fmgws", "append")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    assert(got.nonEmpty, "no sessions closed — watermark/timeout wiring broken")
    assert(got == expect,
      s"missing=${(expect -- got).take(3)} extra=${(got -- expect).take(3)}")
  }

  test("nearDupStream: per-batch incremental pairs union to the batch pair set, exactly once") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val docs = Tables.load(spark, sf, "documents")
      .select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val (b1, b2) = docs.partition(_._1 % 2 == 0)
    val source =
      org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val base = java.nio.file.Files.createTempDirectory("neardup").toString
    val got = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    val q = Streams.nearDupStream(
      source.toDF().toDF("doc_id", "text"), "doc_id", "text",
      s"$base/corpus") { (pairs, _) =>
      got ++= pairs.select("a", "b").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
    }
    source.addData(b1.toSeq)
    q.processAllAvailable()
    source.addData(b2.toSeq)
    q.processAllAvailable()
    q.stop()
    val want = graft.operators.Dedup
      .minhashDupPairs(Tables.load(spark, sf, "documents"), "doc_id", "text")
      .select("a", "b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(want.nonEmpty, "fixture should contain near-dup pairs")
    assert(got.toSet == want,
      s"missing=${(want -- got.toSet).take(3)} extra=${(got.toSet -- want).take(3)}")
    assert(got.size == want.size, "a pair must be emitted exactly once")
  }

  test("nearDupStreamIndexed: index-backed stream emits the same pairs, batch-sized per ingest") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val docs = Tables.load(spark, sf, "documents")
      .select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val (b1, b2) = docs.partition(_._1 % 2 == 0)
    val source =
      org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val idxBase = java.nio.file.Files.createTempDirectory("neardup_idx").toString
    val idxDir = s"$idxBase/idx"
    val got = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    val q = Streams.nearDupStreamIndexed(
      source.toDF().toDF("doc_id", "text"), "doc_id", "text", idxDir,
      s"$idxBase/ckpt") { (pairs, _) =>
      got ++= pairs.select("a", "b").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
    }
    source.addData(b1.toSeq)
    q.processAllAvailable()
    source.addData(b2.toSeq)
    q.processAllAvailable()
    q.stop()
    val want = graft.operators.Dedup
      .minhashDupPairs(Tables.load(spark, sf, "documents"), "doc_id", "text")
      .select("a", "b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.toSet == want,
      s"missing=${(want -- got.toSet).take(3)} extra=${(got.toSet -- want).take(3)}")
    assert(got.size == want.size, "a pair must be emitted exactly once")
    // the index chained one version per micro-batch (bootstrap v1 +
    // two ingests)
    assert(graft.operators.MinhashIndex.latestVersion(spark, idxDir) == 3)
  }
}
