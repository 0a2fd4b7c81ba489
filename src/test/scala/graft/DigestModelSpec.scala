package graft

import graft.operators.DigestIndex
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Model-based randomized check of DigestIndex's seen-first-wins
 * semantics: a seeded random sequence of ingest / delete / upsert /
 * applyCdc commits over a small text pool (so dup, novel, revival and
 * delete-wins shapes all occur) is replayed against a driver-side
 * model of the live digest → canonical-id map. After EVERY commit:
 *  - the pairs the commit RETURNED equal the model's prediction
 *    (probe-against-pre-state semantics, bmin within batch,
 *    idx-canonical wins, self-pairs dropped, delete-wins);
 *  - a full probe of every text ever seen returns pairs for exactly
 *    the LIVE digests, each pointing at the model's canonical id.
 * Folds (tiny maxSegments) and the tombstone byte-budget escalation
 * run underneath the whole walk — the model never mentions segments,
 * which is the point: no LSM mechanics may leak into semantics.
 */
class DigestModelSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  import spark.implicits._

  private def texts(j: Int): String = s"pooled text number $j body"

  test("random op sequence: returned pairs and full-probe content == driver model after every commit") {
    val dir = java.nio.file.Files.createTempDirectory("graft_didx_model")
      .toString + "/idx"
    val cfg = DigestIndex.Config(maxSegments = 3, tombMaxBytes = 4096L)
    val rnd = new scala.util.Random(7)
    // model: digest (keyed by pool index) → canonical doc id; plus
    // which pool text each live doc id currently embodies
    val canon = scala.collection.mutable.Map[Int, Long]() // pool j -> id
    def df(rows: Seq[(Long, Int)]): DataFrame =
      rows.map { case (id, j) => (id, texts(j)) }.toDF("doc_id", "text")
    var nextId = 1000L
    def freshIds(n: Int): Seq[Long] = {
      val out = (0 until n).map(i => nextId + i); nextId += n; out
    }
    /** model ingest of (id, poolIdx) rows against the CURRENT canon,
      * with `dying` ids already masked: returns (pairs, novelEntries) */
    def modelIngest(rows: Seq[(Long, Int)]): (Set[(Long, Long)], Map[Int, Long]) = {
      val bmin = rows.groupBy(_._2).map { case (j, rs) => j -> rs.map(_._1).min }
      val pairs = rows.flatMap { case (id, j) =>
        canon.get(j) match {
          case Some(c) => if (c != id) Some((id, c)) else None
          case None => if (bmin(j) < id) Some((id, bmin(j))) else None
        }
      }.toSet
      val novel = rows.collect { case (_, j) if !canon.contains(j) => j }
        .distinct.map(j => j -> bmin(j)).toMap
      (pairs, novel)
    }
    def got(p: DataFrame): Set[(Long, Long)] =
      p.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    /** full-content probe: one copy doc per pool text, ids offset —
      * live digests must answer with their canonical, dead ones with
      * nothing. */
    def checkContent(tag: String): Unit = {
      val probes = (0 until 40).map(j => (1000000L + j, j))
      val pairs = got(DigestIndex.dupPairs(spark, dir, df(probes),
        "doc_id", "text", cfg))
      val want = (0 until 40).flatMap(j =>
        canon.get(j).map(c => (1000000L + j, c))).toSet
      assert(pairs == want,
        s"$tag: live content mismatch\n got  $pairs\n want $want")
    }

    DigestIndex.create(spark, dir, cfg)
    (1 to 16).foreach { step =>
      rnd.nextInt(4) match {
        case 0 => // ingest: mixed novel/dup texts, distinct fresh ids
          val ids = freshIds(3 + rnd.nextInt(5))
          val rows = ids.map(id => (id, rnd.nextInt(40)))
          val (wantPairs, novel) = modelIngest(rows)
          val p = DigestIndex.ingest(spark, dir, df(rows), "doc_id",
            "text", cfg)
          assert(got(p) == wantPairs, s"step$step ingest pairs")
          p.unpersist()
          canon ++= novel
          checkContent(s"step$step ingest")
        case 1 => // delete canonicals (and sometimes ghosts)
          val victims =
            if (canon.isEmpty) Seq(424242L)
            else (0 until 1 + rnd.nextInt(3)).map(_ =>
              canon.values.toSeq(rnd.nextInt(canon.size))) :+ 424242L
          DigestIndex.delete(spark, dir, victims.toDF("doc_id"), "doc_id")
          val vs = victims.toSet
          canon.filterInPlace { case (_, id) => !vs.contains(id) }
          checkContent(s"step$step delete")
        case 2 => // upsert: touched ids' old rows die, new texts probed
          val ids = freshIds(2 + rnd.nextInt(4)) ++
            (if (canon.nonEmpty && rnd.nextBoolean())
               Seq(canon.values.toSeq(rnd.nextInt(canon.size)))
             else Seq.empty)
          val rows = ids.distinct.map(id => (id, rnd.nextInt(40)))
          val touched = rows.map(_._1).toSet
          canon.filterInPlace { case (_, id) => !touched.contains(id) }
          val (wantPairs, novel) = modelIngest(rows)
          val p = DigestIndex.upsert(spark, dir, df(rows), "doc_id",
            "text", cfg)
          assert(got(p) == wantPairs, s"step$step upsert pairs")
          p.unpersist()
          canon ++= novel
          checkContent(s"step$step upsert")
        case 3 => // applyCdc: upserts + deletes, delete-wins overlap
          val upIds = freshIds(2 + rnd.nextInt(4))
          val ups = upIds.map(id => (id, rnd.nextInt(40)))
          val delCanon =
            if (canon.isEmpty) Seq.empty
            else (0 until rnd.nextInt(3)).map(_ =>
              canon.values.toSeq(rnd.nextInt(canon.size)))
          val dels = (delCanon ++ ups.take(rnd.nextInt(ups.size + 1))
            .map(_._1)).distinct
          val delSet = dels.toSet
          val live = ups.filter { case (id, _) => !delSet.contains(id) }
          val touched = delSet ++ live.map(_._1)
          canon.filterInPlace { case (_, id) => !touched.contains(id) }
          val (wantPairs, novel) = modelIngest(live)
          val p = DigestIndex.applyCdc(spark, dir, df(ups),
            dels.toDF("doc_id"), "doc_id", "text", cfg)
          assert(got(p) == wantPairs, s"step$step applyCdc pairs")
          p.unpersist()
          canon ++= novel
          checkContent(s"step$step applyCdc")
      }
    }
    // maintenance must not move semantics
    DigestIndex.compact(spark, dir, cfg)
    checkContent("compact")
    // the walk must have folded at least once (tiny maxSegments) —
    // the point of running the model across LSM activity
    assert(DigestIndex.latestVersion(spark, dir) >= 17)
  }
}
