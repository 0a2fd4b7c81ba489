package graft

import graft.operators.{Dedup, MinhashIndex}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Model-based randomized check for the MinhashIndex family — the
 * random-walk sibling of IvfModelSpec / DigestModelSpec: a seeded
 * sequence of ingest / deleteFromIndex / replaceInIndex commits over
 * real fixture text, with the driver model being simply THE LIVE
 * CORPUS (id → text). After every commit, a fixed probe batch through
 * the index must emit pair-for-pair what the inline
 * [[Dedup.minhashIncremental]] emits over the model corpus — the
 * established oracle equality, here driven across arbitrary interlea-
 * vings of the three mutation faces instead of one-shot scenarios, so
 * tombstone folding, newly-hot shingle transitions, and base-version
 * chaining are all exercised under randomized state.
 */
class MinhashModelSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .getOrCreate()

  import spark.implicits._

  private def pairSet(df: DataFrame): Set[(Long, Long, Double)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("random ingest/delete/replace walk: index probes == inline recompute over the model corpus after every commit") {
    val fixture = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val byId = fixture.toMap
    val rnd = new scala.util.Random(11)
    // the model: the live corpus
    val live = scala.collection.mutable.Map[Long, String]()
    def df(rows: Seq[(Long, String)]): DataFrame = rows.toDF("doc_id", "text")
    def liveDf: DataFrame = df(live.toSeq)

    val cfg = MinhashIndex.Config()
    val dir = java.nio.file.Files.createTempDirectory("graft_mh_model")
      .toString
    // fixture ids are reused as the op pool; the fixed PROBE batch is
    // ids the walk never ingests, so probe-vs-inline equality is
    // well-defined at every step
    val (probePool, opPool) = fixture.partition(_._1 % 17 == 0)
    val probeBatch = df(probePool.take(12))
    val base = opPool.take(60)
    MinhashIndex.build(spark, df(base), "doc_id", "text", dir, cfg)
    live ++= base
    var cursor = 60

    def check(tag: String): Unit = {
      val fromIdx = pairSet(Dedup.minhashIncrementalFromIndex(spark, dir,
        probeBatch, "doc_id", "text", cfg))
      val inline = pairSet(Dedup.minhashIncremental(liveDf, probeBatch,
        "doc_id", "text"))
      assert(fromIdx == inline,
        s"$tag: probe != inline over model corpus\n idx   " +
          s"${fromIdx.toSeq.sorted.take(8)}…(${fromIdx.size})\n " +
          s"inline ${inline.toSeq.sorted.take(8)}…(${inline.size})")
      spark.catalog.clearCache()
    }
    check("build")

    (1 to 8).foreach { step =>
      rnd.nextInt(3) match {
        case 0 => // ingest fresh fixture docs; returned pairs must
          // equal the inline incremental against the PRE-state
          val rows = opPool.slice(cursor, cursor + 8 + rnd.nextInt(8))
          cursor += rows.size
          if (rows.nonEmpty) {
            val want = pairSet(Dedup.minhashIncremental(liveDf, df(rows),
              "doc_id", "text"))
            val got = pairSet(MinhashIndex.ingest(spark, dir, df(rows),
              "doc_id", "text", cfg))
            assert(got == want, s"step$step ingest pairs")
            live ++= rows
          }
          check(s"step$step ingest")
        case 1 => // delete live docs (and one ghost)
          val victims = (0 until 1 + rnd.nextInt(4)).map(_ =>
            live.keys.toSeq(rnd.nextInt(live.size))) :+ 999999L
          MinhashIndex.deleteFromIndex(spark, dir,
            victims.toDF("doc_id"), "doc_id", cfg)
          victims.foreach(live.remove)
          check(s"step$step delete")
        case 2 => // replace: existing ids re-texted with other fixture text
          val ids = (0 until 1 + rnd.nextInt(3)).map(_ =>
            live.keys.toSeq(rnd.nextInt(live.size))).distinct
          val rows = ids.map(id =>
            (id, byId(opPool((cursor + id).toInt % opPool.size)._1)))
          // replace = delete + ingest: the returned pairs are probed
          // against the corpus with the ids already deleted
          val pre = live.clone(); ids.foreach(pre.remove)
          val want = pairSet(Dedup.minhashIncremental(df(pre.toSeq),
            df(rows), "doc_id", "text"))
          val got = pairSet(MinhashIndex.replaceInIndex(spark, dir,
            df(rows), "doc_id", "text", cfg))
          assert(got == want, s"step$step replace pairs")
          rows.foreach { case (id, t) => live(id) = t }
          check(s"step$step replace")
      }
    }
    assert(live.nonEmpty && MinhashIndex.latestVersion(spark, dir) >= 9)
  }
}
