package graft

import graft.operators.IvfIndex
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Model-based randomized check of IvfIndex's LIVE-SET semantics: a
 * seeded random sequence of append / upsert / delete / applyCdc
 * commits — duplicate ids across lists, re-adds after deletes,
 * delete-wins overlaps, fold triggers, drift-guard splits — is
 * replayed against a driver-side multiset model, and after EVERY
 * commit the index's full live content (one exhaustive probe) must
 * equal the model exactly.
 *
 * This is the test class that catches masking-scope bugs the way the
 * round-10 ADVICE did by inspection: the split's e-tombstone dropping
 * a duplicate id's copy in a non-hot list is precisely a random
 * (append dup) → (skewed append → split) sequence, and any future
 * regression in tombstone sequencing, fold masking, or small-layout
 * migration shows up as a live-set mismatch within a few commits.
 *
 * The model is written from the SPEC, not the code: a live row is any
 * (id, vec) written by commit s with no masking tombstone — global
 * delete/upsert tombstones mask every copy of the id written strictly
 * before their commit; splits rewrite (and therefore re-sequence) the
 * copies they move, invisible to the live set.
 */
class IvfModelSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private val Dim = 4

  /** Deterministic distinct-ish vector for (id, revision): two clear
    * clusters so k-means (seeded from the first rows) separates them,
    * plus per-(id,rev) jitter so cos against a fixed query identifies
    * the exact stored vector. */
  private def vec(id: Long, rev: Int): Array[Float] = {
    val v = Array.fill(Dim)(0f)
    v(if (id % 2 == 0) 0 else 1) = 10f
    v(2) = ((id * 31 + rev * 7) % 97).toFloat * 0.01f
    v(3) = ((id * 17 + rev * 13) % 89).toFloat * 0.01f
    v
  }

  /** cos(q, c) with the same left-associated double arithmetic the
    * probe kernel contracts. */
  private def cosTo(q: Array[Double], c: Array[Float]): Double = {
    var dot = 0.0; var nq = 0.0; var nc = 0.0; var i = 0
    while (i < Dim) {
      dot += q(i) * c(i); nq += q(i) * q(i); nc += c(i).toDouble * c(i)
      i += 1
    }
    dot / (math.sqrt(nq) * math.sqrt(nc))
  }

  test("random op sequence: index live content == driver model after every commit") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_model")
      .toString + "/idx"
    // tight knobs so folds AND splits fire inside a short sequence
    val cfg = IvfIndex.Config(dim = Dim, nList = 2, iters = 2,
      maxImbalance = 1.5, maxSegments = 3, smallRowsPerList = 8)
    val rnd = new scala.util.Random(42)
    // the model: live rows as (id, rev) — a multiset (duplicate
    // appends of the same (id, rev) can coexist)
    val live = scala.collection.mutable.ArrayBuffer[(Long, Int)]()
    val rev = scala.collection.mutable.Map[Long, Int]().withDefaultValue(0)
    def df(rows: Seq[(Long, Int)]): DataFrame =
      rows.map { case (id, r) => (id, vec(id, r)) }.toDF("id", "vec")
    def freshRows(n: Int, dupFrac: Double): Seq[(Long, Int)] =
      (0 until n).map { _ =>
        // mostly new ids; sometimes an id the index already holds
        // (the duplicate-id-across-lists shape), sometimes a re-add
        val id =
          if (live.nonEmpty && rnd.nextDouble() < dupFrac)
            live(rnd.nextInt(live.size))._1
          else rnd.nextInt(500).toLong
        rev(id) += 1
        (id, rev(id))
      }

    // build: 24 rows, both clusters (ids 0..23 ensures one seed per
    // cluster by parity)
    val base = (0L until 24L).map { id => rev(id) = 1; (id, 1) }
    IvfIndex.build(spark, df(base), "id", "vec", dir, cfg)
    live ++= base

    val qv = Array(3.0, 4.0, 0.05, 0.02) // fixed probe direction
    def check(tag: String): Unit = {
      val v = IvfIndex.latestVersion(spark, dir)
      val nLists = IvfIndex.readCentroids(spark, dir, v).length
      val got = IvfIndex.topK(spark, dir,
        Seq((-1L, qv.map(_.toFloat))).toDF("id", "vec"),
        "id", "vec", k = 100000, nProbe = nLists)
        .select("neighbor_id", "cos")
        .collect().map(r => (r.getLong(0), math.rint(r.getDouble(1) * 1e6)))
        .sorted.toSeq
      val want = live.map { case (id, r) =>
        (id, math.rint(cosTo(qv, vec(id, r)) * 1e6))
      }.sorted.toSeq
      assert(got == want,
        s"$tag v$v: live-set mismatch\n  got  ${got.take(12)}…(${got.size})" +
          s"\n  want ${want.take(12)}…(${want.size})")
    }
    check("build")

    (1 to 18).foreach { step =>
      rnd.nextInt(4) match {
        case 0 => // plain append (duplicates allowed — nothing masked)
          // occasionally a SKEWED batch (one cluster only) to trip the
          // drift guard's split
          val skew = rnd.nextDouble() < 0.4
          val rows0 = freshRows(6 + rnd.nextInt(10), dupFrac = 0.3)
          val rows = if (!skew) rows0 else rows0.map { case (id, r) =>
            val even = (id / 2) * 2 // force cluster X
            if (even != id) { rev(even) += 1; (even, rev(even)) }
            else (id, r)
          }
          IvfIndex.append(spark, dir, df(rows), "id", "vec", cfg)
          live ++= rows
          check(s"step$step append")
        case 1 => // upsert: masks ALL older copies of the batch ids
          val rows = freshRows(4 + rnd.nextInt(8), dupFrac = 0.6)
          IvfIndex.upsert(spark, dir, df(rows), "id", "vec", cfg)
          val ids = rows.map(_._1).toSet
          live.filterInPlace { case (id, _) => !ids.contains(id) }
          live ++= rows
          check(s"step$step upsert")
        case 2 => // delete: every copy of the ids vanishes
          val ids =
            if (live.isEmpty) Seq(9999L)
            else (0 until 1 + rnd.nextInt(5))
              .map(_ => live(rnd.nextInt(live.size))._1).distinct
          IvfIndex.delete(spark, dir, ids.toDF("id"), "id")
          val idSet = ids.toSet
          live.filterInPlace { case (id, _) => !idSet.contains(id) }
          check(s"step$step delete")
        case 3 => // applyCdc: upserts + deletes, delete-wins on overlap
          val ups = freshRows(3 + rnd.nextInt(6), dupFrac = 0.5)
          val delsExtra =
            if (live.isEmpty) Seq.empty
            else (0 until rnd.nextInt(3))
              .map(_ => live(rnd.nextInt(live.size))._1)
          // overlap: delete some of the upserted ids too (delete wins)
          val delOverlap = ups.take(rnd.nextInt(ups.size + 1)).map(_._1)
          val dels = (delsExtra ++ delOverlap).distinct
          IvfIndex.applyCdc(spark, dir, df(ups), dels.toDF("id"),
            "id", "vec", cfg)
          val delSet = dels.toSet
          val upsLive = ups.filter { case (id, _) => !delSet.contains(id) }
          val touched = delSet ++ upsLive.map(_._1)
          live.filterInPlace { case (id, _) => !touched.contains(id) }
          live ++= upsLive
          check(s"step$step applyCdc")
      }
    }
    // guarantee the drift guard fires at least once: one deliberately
    // lopsided append sized off the manifest mass (counts are upper
    // bounds, so 4x the total guarantees the even-cluster list clears
    // the 1.5x cap whatever the random walk left behind). The model
    // check after it is the test's core case: duplicate ids' odd-
    // cluster copies must survive the even-list split.
    val massPre = IvfIndex.health(spark, dir).totalMass
    val skewRows = (0 until (4 * massPre).toInt).map { _ =>
      val id = rnd.nextInt(250).toLong * 2 // even = cluster X
      rev(id) += 1
      (id, rev(id))
    }
    IvfIndex.append(spark, dir, df(skewRows), "id", "vec", cfg)
    live ++= skewRows
    check("forced-skew append")
    val v = IvfIndex.latestVersion(spark, dir)
    assert(IvfIndex.readCentroids(spark, dir, v).length > 2,
      "the forced-skew append must trip a split")
    assert(v >= 20, s"one committed version per op expected, got $v")
    // and a maintenance pass over the final state stays equal too
    IvfIndex.compact(spark, dir)
    check("compact")
    IvfIndex.retrain(spark, dir, cfg)
    check("retrain")
  }
}
