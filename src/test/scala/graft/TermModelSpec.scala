package graft

import graft.operators.{TermIndex, Terms}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Model-based randomized check for the TermIndex family — the fourth
 * of the random-walk model suites (IvfModelSpec / DigestModelSpec /
 * MinhashModelSpec): a seeded sequence of append / upsert / delete /
 * applyCdc commits over fixture text, the driver model being the live
 * corpus itself. After every commit, the index's BM25 top-k over a
 * fixed probe batch must equal [[Terms.bm25TopK]] over the model
 * corpus pair-for-pair (ranks AND integer scores) — segment folds,
 * tombstone masking, stats recounting, and the max-score tiers all
 * run underneath arbitrary interleavings without moving a score.
 */
class TermModelSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .getOrCreate()

  import spark.implicits._

  private def rankSet(df: DataFrame): Set[(Long, Long, Long, Long)] =
    df.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet

  test("random append/upsert/delete/applyCdc walk: indexed BM25 == inline over the model corpus after every commit") {
    val fixture = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val rnd = new scala.util.Random(5)
    val live = scala.collection.mutable.Map[Long, String]()
    def df(rows: Seq[(Long, String)]): DataFrame = rows.toDF("doc_id", "text")

    val cfg = TermIndex.Config(buckets = 8, maxSegments = 3)
    val dir = java.nio.file.Files.createTempDirectory("graft_tidx_model")
      .toString + "/idx"
    val (probePool, opPool) = fixture.partition(_._1 % 17 == 0)
    // mixed probe shapes: document-shaped (full fixture texts → tier 2)
    // and search-shaped (few terms → tier 1 candidates)
    val probeBatch = df(probePool.take(8) ++ Seq(
      (777770L, "minim dolore commodo"), (777771L, "culpa nostrud amet")))
    val base = opPool.take(50)
    TermIndex.build(spark, df(base), "doc_id", "text", dir, cfg)
    live ++= base
    var cursor = 50

    def check(tag: String): Unit = {
      val got = rankSet(TermIndex.topK(spark, dir, probeBatch,
        "doc_id", "text", k = 5, cfg))
      val want = rankSet(Terms.bm25TopK(df(live.toSeq), probeBatch,
        "doc_id", "text", k = 5))
      assert(got == want, s"$tag: indexed != inline " +
        s"(got ${got.size}, want ${want.size}; diff " +
        s"${(got diff want).take(4)} / ${(want diff got).take(4)})")
      spark.catalog.clearCache()
    }
    check("build")

    (1 to 8).foreach { step =>
      rnd.nextInt(4) match {
        case 0 =>
          val rows = opPool.slice(cursor, cursor + 5 + rnd.nextInt(8))
          cursor += rows.size
          if (rows.nonEmpty) {
            TermIndex.append(spark, dir, df(rows), "doc_id", "text", cfg)
            live ++= rows
            check(s"step$step append")
          }
        case 1 => // upsert: existing ids with swapped texts + fresh rows
          val swap = (0 until 1 + rnd.nextInt(3)).map { _ =>
            val id = live.keys.toSeq(rnd.nextInt(live.size))
            (id, opPool((id % opPool.size).toInt)._2)
          }
          val fresh = opPool.slice(cursor, cursor + 2); cursor += 2
          val rows = (swap ++ fresh).distinctBy(_._1)
          TermIndex.upsert(spark, dir, df(rows), "doc_id", "text", cfg)
          rows.foreach { case (id, t) => live(id) = t }
          check(s"step$step upsert")
        case 2 =>
          val victims = (0 until 1 + rnd.nextInt(4)).map(_ =>
            live.keys.toSeq(rnd.nextInt(live.size))) :+ 999999L
          TermIndex.delete(spark, dir, victims.toDF("doc_id"), cfg)
          victims.foreach(live.remove)
          check(s"step$step delete")
        case 3 =>
          val ups0 = opPool.slice(cursor, cursor + 3); cursor += 3
          val resurrect = (0 until rnd.nextInt(2)).map { _ =>
            val id = live.keys.toSeq(rnd.nextInt(live.size))
            (id, opPool(((id + 3) % opPool.size).toInt)._2)
          }
          val ups = (ups0 ++ resurrect).distinctBy(_._1)
          val delsLive =
            if (live.isEmpty) Seq.empty
            else (0 until rnd.nextInt(3)).map(_ =>
              live.keys.toSeq(rnd.nextInt(live.size)))
          val delOverlap = ups.take(rnd.nextInt(ups.size + 1)).map(_._1)
          val dels = (delsLive ++ delOverlap).distinct
          TermIndex.applyCdc(spark, dir, df(ups), dels.toDF("doc_id"),
            "doc_id", "text", cfg)
          val delSet = dels.toSet
          val liveUps = ups.filter { case (id, _) => !delSet.contains(id) }
          (delSet ++ liveUps.map(_._1)).foreach(live.remove)
          liveUps.foreach { case (id, t) => live(id) = t }
          check(s"step$step applyCdc")
      }
    }
    // maintenance must not move a score
    TermIndex.compact(spark, dir, cfg)
    check("compact")
    assert(live.nonEmpty && TermIndex.latestVersion(spark, dir) >= 9)
  }
}
