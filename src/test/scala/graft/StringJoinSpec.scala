package graft

import graft.operators.StringJoin
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/**
 * Edit-distance similarity join: the prefix-filtered candidate
 * generator must be COMPLETE (exactness is the contract — a missed
 * candidate is a wrong answer, not a recall loss). Every test compares
 * against an independent driver-side Wagner-Fischer DP over the full
 * pair space, so neither Spark's `levenshtein` nor the candidate
 * machinery is trusted twice.
 */
class StringJoinSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  /** Independent reference: full O(n·m) DP, no banding, no Spark. */
  private def lev(a: String, b: String): Int = {
    val prev = Array.tabulate(b.length + 1)(identity)
    val cur = new Array[Int](b.length + 1)
    for (i <- 1 to a.length) {
      cur(0) = i
      for (j <- 1 to b.length) {
        val sub = prev(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1)
        cur(j) = math.min(math.min(prev(j) + 1, cur(j - 1) + 1), sub)
      }
      Array.copy(cur, 0, prev, 0, cur.length)
    }
    prev(b.length)
  }

  private def bruteForce(rows: Seq[(Long, String)], k: Int) =
    (for {
      (i1, s1) <- rows; (i2, s2) <- rows
      if i1 < i2 && lev(s1, s2) <= k
    } yield (i1, i2, lev(s1, s2))).toSet

  private def run(rows: Seq[(Long, String)], k: Int, q: Int = 3) = {
    import spark.implicits._
    StringJoin.editDistancePairs(rows.toDF("id", "s"), "id", "s", k, q)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
  }

  test("typo'd entity names == full-DP brute force, k=1 and k=2") {
    val rows = Seq[(Long, String)](
      (1, "Acme Corporation"), (2, "Acme Corporation"), // exact dup
      (3, "Acme Corporatoin"), (4, "Acme Corp"),
      (5, "Apex Corporation"), (6, "ACME Corporation"),
      (7, "Globex Inc"), (8, "Globex Inc."), (9, "Glovex Inc"),
      (10, "Initech"), (11, "Initech LLC"), (12, "Intech"))
    for (k <- Seq(1, 2))
      assert(run(rows, k) === bruteForce(rows, k), s"k=$k")
  }

  test("short strings (len < q and len <= kq+q-1) route through the band join") {
    // with q=3, k=2: short cutoff is len <= 8; includes zero-gram strings
    val rows = Seq[(Long, String)](
      (1, ""), (2, "a"), (3, "b"), (4, "ab"), (5, "abc"), (6, "abcd"),
      (7, "abcdefgh"), (8, "abcdefghx"), (9, "xy"), (10, "xyz"),
      (11, "zzzzzzzzzzzz")) // long string near nothing
    for (k <- Seq(0, 1, 2))
      assert(run(rows, k) === bruteForce(rows, k), s"k=$k")
  }

  test("fuzz: random low-entropy strings == brute force") {
    val rnd = new Random(42)
    def s(): String = {
      val n = rnd.nextInt(12)
      (0 until n).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
    }
    val rows = (1L to 120L).map(i => (i, s()))
    for (k <- Seq(1, 2))
      assert(run(rows, k) === bruteForce(rows, k), s"k=$k")
  }

  test("unicode and duplicated-gram strings survive the prefix filter") {
    val rows = Seq[(Long, String)](
      (1, "ééé héllo wörld"), (2, "ééé héllo wörle"), (3, "ééé hello wörld"),
      (4, "ابجد هوز"), (5, "ابجد هوژ"), (6, "aaaaaaaaaa"), (7, "aaaaabaaaa"),
      (8, "aaaa aaaa aaaa"))
    assert(run(rows, 1) === bruteForce(rows, 1))
    assert(run(rows, 2) === bruteForce(rows, 2))
  }

  private def bruteForceBi(probes: Seq[(Long, String)],
                           corpus: Seq[(Long, String)], k: Int) =
    (for {
      (i1, s1) <- probes; (i2, s2) <- corpus
      if lev(s1, s2) <= k
    } yield (i1, i2, lev(s1, s2))).toSet

  private def runBi(probes: Seq[(Long, String)], corpus: Seq[(Long, String)],
                    k: Int, q: Int = 3) = {
    import spark.implicits._
    StringJoin.editDistanceJoin(probes.toDF("id", "s"), "id", "s",
      corpus.toDF("id", "s"), "id", "s", k, q)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
  }

  test("bipartite: probe×corpus == brute force, ids overlap freely across sides") {
    val corpus = Seq[(Long, String)](
      (1, "Acme Corporation"), (2, "Apex Corporation"), (3, "Acme Corp"),
      (4, "Globex Inc"), (5, "ab"), (6, ""), (7, "Initech"))
    val probes = Seq[(Long, String)](
      (1, "Acme Corporatoin"), (2, "Globex Inc."), (3, "a"), (4, "Intech"),
      (5, "Unrelated Name Entirely"))
    for (k <- Seq(1, 2))
      assert(runBi(probes, corpus, k) === bruteForceBi(probes, corpus, k),
        s"k=$k")
  }

  test("bipartite fuzz: random low-entropy strings == brute force") {
    val rnd = new Random(7)
    def s(): String = {
      val n = rnd.nextInt(10)
      (0 until n).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
    }
    val probes = (1L to 40L).map(i => (i, s()))
    val corpus = (1L to 90L).map(i => (i, s()))
    for (k <- Seq(1, 2))
      assert(runBi(probes, corpus, k) === bruteForceBi(probes, corpus, k),
        s"k=$k")
  }

  test("sortedNeighborhoodPairs == windowed driver recompute; no dups; repartition-stable") {
    import spark.implicits._
    val rnd = new Random(11)
    val rows = (1L to 200L).map(i =>
      (i, (0 until 6).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString))
    val df = rows.toDF("id", "s")
    val got = StringJoin.sortedNeighborhoodPairs(df, "id", "s", w = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got.size == got.toSet.size, "no duplicate pairs")
    val order = rows.sortBy { case (i, s) => (s, i) }.map(_._1)
    val expect = (for {
      i <- order.indices; j <- (i + 1) until math.min(i + 4, order.size)
    } yield (order(i), order(j), (j - i).toLong)).toSet
    assert(got.toSet === expect)
    val again = StringJoin.sortedNeighborhoodPairs(df.repartition(7), "id", "s", 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(again === expect)
  }

  test("no cartesian/BNLJ anywhere in the physical plan") {
    import spark.implicits._
    val rows = (1L to 50L).map(i => (i, s"Customer#${1000 + i}"))
    val plan = StringJoin.editDistancePairs(rows.toDF("id", "s"), "id", "s", 1)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
