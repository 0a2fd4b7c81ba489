package graft

import graft.operators.Dedup
import graft.sources.Sources
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/**
 * Property tests (SURVEY §5 / FIXTURES A2 adoption): randomized typed
 * columns with duplicate keys, Zipfian skew, row counts not divisible
 * by shard counts — invariants must hold for every draw and shard
 * count, the analog of the reference's gofuzz + testing/quick suites
 * (slice_test.go:374-508). Draws use ScalaCheck Gen under fixed seeds
 * so failures are reproducible (scalatestplus bridge is not on the
 * offline classpath).
 */
class PropertySpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Draw `n` samples from `gen` deterministically (seeds 1..n). */
  private def draws[T](gen: Gen[T], n: Int): Seq[T] =
    (1 to n).map { i =>
      gen(Gen.Parameters.default, Seed(i.toLong))
        .getOrElse(sys.error(s"gen failed at seed $i"))
    }

  // Zipf-ish skewed keys: key k with weight ~ 1/(k+1)
  private val skewedPair: Gen[(String, Int)] = for {
    z <- Gen.choose(0.0, 1.0)
    k = math.min(9, math.floor(math.pow(10.0, z * 2) / 10.0 * 9).toInt)
    v <- Gen.choose(-1000, 1000)
  } yield (s"k$k", v)

  private val rowsGen: Gen[List[(String, Int)]] =
    Gen.choose(1, 400).flatMap(n => Gen.listOfN(n, skewedPair))

  test("reduce(+) == in-memory groupBy sum, for any data and shard count") {
    import spark.implicits._
    for {
      rows <- draws(rowsGen, 6)
      nshard <- Seq(1, 3, 7)
    } {
      val expect = rows.groupBy(_._1).view
        .mapValues(_.map(_._2.toLong).sum).toMap
      val got = Sources.const(spark, nshard, rows)
        .reduce(sum(col("_2").cast("long")).as("s"))
        .df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == expect, s"nshard=$nshard rows=${rows.size}")
    }
  }

  test("reduceF(typed +) == reduce(declarative sum)") {
    import spark.implicits._
    for (rows <- draws(rowsGen, 6)) {
      val s = Sources.const(spark, 3, rows.map { case (k, v) => (k, v.toLong) })
      val typed = s.reduceF[String, Long](_ + _)
        .df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val decl = s.reduce(sum(col("_2")).as("s"))
        .df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(typed == decl)
    }
  }

  test("reshard/reshuffle preserve multiset content for any shard count") {
    import spark.implicits._
    for {
      rows <- draws(rowsGen, 4)
      n <- Seq(1, 2, 5, 11)
    } {
      val s = Sources.const(spark, 4, rows)
      def multiset(x: Slice) =
        x.df.collect().map(r => (r.getString(0), r.getInt(1)))
          .groupBy(identity).view.mapValues(_.length).toMap
      assert(multiset(s.reshard(n)) == multiset(s), s"reshard($n)")
      assert(multiset(s.reshuffle()) == multiset(s), "reshuffle")
    }
  }

  test("cogroup group sizes == per-input key counts (incl. absent keys)") {
    import spark.implicits._
    val ls = draws(rowsGen, 6)
    val rs = draws(rowsGen.map(_.reverse), 6)
    for ((l, r) <- ls.zip(rs)) {
      val cg = Sources.const(spark, 3, l).cogroup(Sources.const(spark, 2, r))
      val got = cg.df.collect()
        .map(x => x.getString(0) -> (x.getSeq[Int](1).size, x.getSeq[Int](2).size))
        .toMap
      val lc = l.groupBy(_._1).view.mapValues(_.size).toMap
      val rc = r.groupBy(_._1).view.mapValues(_.size).toMap
      val expect = (lc.keySet ++ rc.keySet).map(k =>
        k -> (lc.getOrElse(k, 0), rc.getOrElse(k, 0))).toMap
      assert(got == expect)
    }
  }

  test("asOfJoin backward == in-memory reference on random event sets") {
    import spark.implicits._
    val evGen: Gen[List[(Long, Long, Long)]] = // (key, ts, id)
      Gen.choose(5, 120).flatMap(n => Gen.listOfN(n, for {
        k <- Gen.choose(0L, 4L)
        t <- Gen.choose(0L, 50L)
        id <- Gen.choose(0L, 1000000L)
      } yield (k, t, id)))
    for (seed <- 1 to 5) {
      val rows = draws(evGen, seed).last
      // unique (key, ts) on the right — as-of semantics pick the row,
      // among equal ts, nondeterministically otherwise
      val right = rows.groupBy(r => (r._1, r._2)).map(_._2.head).toList
      val left = draws(evGen, seed + 100).last
      val lDf = left.toDF("k", "ts", "lid")
      val rDf = right.toDF("k", "rts", "rid")
      val got = graft.operators.AsOfJoin.backward(lDf, rDf,
        keys = Seq("k"), leftTs = "ts", rightTs = "rts", rightVals = Seq("rts", "rid"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some((r.getLong(3), r.getLong(4)))))
        .toSet
      val expect = left.map { case (k, ts, lid) =>
        val m = right.filter(r => r._1 == k && r._2 <= ts)
          .sortBy(_._2).lastOption.map(r => (r._2, r._3))
        (k, ts, lid, m)
      }.toSet
      assert(got == expect, s"seed=$seed")
    }
  }

  test("range intervalJoin == in-memory reference for any bucket width") {
    import spark.implicits._
    val gen: Gen[List[(Long, Long, Long)]] =
      Gen.choose(5, 80).flatMap(n => Gen.listOfN(n, for {
        k <- Gen.choose(0L, 3L)
        s <- Gen.choose(0L, 90L)
        span <- Gen.choose(1L, 25L)
      } yield (k, s, s + span)))
    for ((seed, width) <- Seq((1, 1L), (2, 7L), (3, 13L), (4, 100L))) {
      val ivs = draws(gen, seed).last.zipWithIndex
        .map { case ((k, s, e), i) => (k, s, e, i.toLong) }
      val pts = draws(gen, seed + 50).last.zipWithIndex
        .map { case ((k, s, _), i) => (k, s, 10000L + i) }
      val lDf = ivs.toDF("k", "s", "e", "iid")
      val rDf = pts.toDF("k", "ts", "pid")
      val got = graft.operators.RangeJoin.intervalJoin(
        lDf, rDf, Seq("k"), "s", "e", "ts", width)
        .select("iid", "pid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val expect = (for {
        (k1, s, e, iid) <- ivs
        (k2, ts, pid) <- pts
        if k1 == k2 && ts >= s && ts < e
      } yield (iid, pid)).toSet
      assert(got == expect, s"seed=$seed width=$width")
    }
  }

  test("saltedJoin == plain equi-join on skewed keys, for any draw") {
    import spark.implicits._
    for (rows <- draws(rowsGen, 4)) {
      val l = rows.toDF("k", "v")
      val r = rows.map(_._1).distinct.map(k => (k, s"dim_$k")).toDF("k", "label")
      val plain = l.join(r, "k").collect().map(_.toSeq).toSeq
        .sortBy(_.mkString("|"))
      val salted = graft.operators.Skew.saltedJoin(l, r, Seq("k"), 4)
        .select("k", "v", "label")
        .collect().map(_.toSeq).toSeq.sortBy(_.mkString("|"))
      assert(salted == plain)
    }
  }

  test("shingle df cap == in-memory stop-shingle removal; cap is load-bearing") {
    import spark.implicits._
    // Every doc shares one hot header shingle (df = 42 >> cap); two docs
    // are true dups. The cap must bound the hot-shingle join AND define
    // Jaccard over the capped sets — checked against an in-memory
    // reference implementing exactly "drop shingles with df > cap".
    val hot = "common header line"
    // near-dup docs 100/101 share the hot shingle + most of the body, so
    // their jaccard VALUE depends on whether the hot shingle counts —
    // capped and uncapped outputs must differ (the cap is load-bearing)
    val docs: Seq[(Long, String)] =
      (0 until 40).map(i => (i.toLong, s"$hot unique$i alpha$i beta$i")) ++
        Seq((100L, s"$hot body text zed"),
          (101L, s"$hot body text qux"))
    val df = docs.toDF("doc_id", "text")

    def shingleSet(t: String): Set[String] =
      t.split("\\s+").filter(_.nonEmpty).sliding(3).filter(_.length == 3)
        .map(_.mkString(" ")).toSet
    def reference(maxDf: Int, minJ: Double): Set[(Long, Long, Double)] = {
      val sets = docs.map { case (id, t) => id -> shingleSet(t) }.toMap
      val dfOf = sets.values.flatten.toSeq.groupBy(identity).view.mapValues(_.size)
      val capped = sets.view.mapValues(_.filter(s => dfOf(s) <= maxDf)).toMap
      (for {
        a <- docs.map(_._1); b <- docs.map(_._1); if a < b
        inter = capped(a).intersect(capped(b)).size
        if inter > 0
        j = inter.toDouble / (capped(a).size + capped(b).size - inter)
        if j >= minJ
      } yield (a, b, j)).toSet
    }
    def run(maxDf: Int): Set[(Long, Long, Double)] =
      Dedup.ngramJaccardPairs(df, "doc_id", "text", 3, 0.3, maxDf)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

    val capped = run(5)
    assert(capped == reference(5, 0.3))
    assert(capped.exists { case (a, b, _) => a == 100L && b == 101L })
    // uncapped differs (hot shingle changes the dup pair's jaccard) —
    // proves the cap binds on this corpus rather than being a no-op
    val uncapped = run(1000)
    assert(uncapped == reference(1000, 0.3))
    assert(capped != uncapped)
  }

  test("fold zero-value init: empty-safe, order-independent accumulations") {
    import spark.implicits._
    for (rows <- draws(rowsGen, 6)) {
      val got = Sources.const(spark, 3, rows.map { case (k, v) => (k, v.toLong) })
        .fold[String, Long, Long](0L)((acc, v) => acc + v * v)
        .df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val expect = rows.groupBy(_._1).view
        .mapValues(_.map(x => x._2.toLong * x._2).sum).toMap
      assert(got == expect)
    }
  }

  test("zValue bit-interleave is invertible for any 16-bit pair") {
    import spark.implicits._
    val pairGen: Gen[(Long, Long)] = for {
      a <- Gen.choose(0L, 65535L)
      b <- Gen.choose(0L, 65535L)
    } yield (a, b)
    val pairs = draws(pairGen, 200)
    val zs = pairs.toDF("a", "b")
      .select(col("a"), col("b"),
        graft.sources.Bucketing.zValue(col("a"), col("b"), 16).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    for ((a, b, z) <- zs) {
      var (ra, rb) = (0L, 0L)
      for (i <- 0 until 16) {
        ra |= ((z >> (2 * i)) & 1L) << i
        rb |= ((z >> (2 * i + 1)) & 1L) << i
      }
      assert(ra == a && rb == b, s"z=$z a=$a b=$b got ($ra,$rb)")
    }
  }

  test("Misra-Gries candidates contain every true heavy hitter, any stream & partitioning") {
    import graft.operators.FrequentItems
    import spark.implicits._
    for ((rows, nPart) <- draws(rowsGen, 4).zip(Seq(1, 3, 8, 13))) {
      val minFreq = 0.05
      val df = rows.map(_._1).toDF("x").repartition(nPart)
      val out = FrequentItems.heavyHitters(df, "x", minFreq)
        .collect().map(_.getString(0)).toSet
      val n = rows.size.toDouble
      val exact = rows.groupBy(_._1).view.mapValues(_.size)
        .filter { case (_, c) => c > minFreq * n }.keys.toSet
      assert(out == exact, s"nPart=$nPart got=$out want=$exact")
    }
  }

  test("throughput MG path == Aggregator MG path: both bound-correct, same final answer") {
    import graft.operators.FrequentItems
    import spark.implicits._
    for ((rows, nPart) <- draws(rowsGen, 4).zip(Seq(1, 3, 8, 13))) {
      val n = rows.size
      val cap = 12
      val ds = rows.map(_._1).toDF("x").repartition(nPart)
        .select(col("x")).as[String]
      val tuned = FrequentItems.mgCandidates(ds, cap).toSet
      val ref = FrequentItems.mgCandidatesViaAggregator(ds, cap).toSet
      // Candidate SETS may differ off the guarantee boundary (MG output
      // depends on arrival structure) but BOTH must contain every item
      // with count > n/(cap+1) — the bound that makes the exact-verify
      // pass produce identical final answers for either path.
      val mustSurvive = rows.groupBy(_._1).view.mapValues(_.size)
        .filter { case (_, c) => c > n.toDouble / (cap + 1) }.keys.toSet
      assert(mustSurvive.subsetOf(tuned),
        s"tuned missed ${mustSurvive -- tuned}")
      assert(mustSurvive.subsetOf(ref), s"ref missed ${mustSurvive -- ref}")
      assert(tuned.size <= cap && ref.size <= cap)
    }
    // identical FINAL answers through the full operator (exact verify
    // filters any candidate-set difference away): heavyHitters uses the
    // tuned path; recompute the verify over the reference candidates.
    val rows = draws(rowsGen, 1).head
    val df = rows.map(_._1).toDF("x").repartition(7)
    val minFreq = 0.05
    val viaTuned = FrequentItems.heavyHitters(df, "x", minFreq)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val n = rows.size.toDouble
    val exact = rows.groupBy(_._1).view.mapValues(_.size.toLong)
      .filter { case (_, c) => c > minFreq * n }.toMap.toSet
    assert(viaTuned == exact)
  }

  test("partition-MG amortized path handles the adversarial all-distinct stream") {
    import graft.operators.FrequentItems
    // every element distinct: the decrement step fires constantly; the
    // summary must stay <= cap and each surviving count <= true count
    val it = (0 until 10000).iterator.map(i => s"u$i")
    val buf = FrequentItems.partitionSummary(it, 16)
    assert(buf.keys.length <= 16)
    assert(buf.counts.forall(c => c >= 1 && c <= 1))
  }

  test("shingle/token/minhash kernels == Column formulations on random unicode text") {
    import spark.implicits._
    import graft.functions.ShingleFunctions.{shingleArrF, tokenCountF}
    import graft.functions.TextFunctions
    // tokens drawn from ascii words, multi-byte scripts, punctuation;
    // separators from ALL Java-\s whitespace (incl. \x0B) with runs
    val token: Gen[String] = Gen.oneOf(
      Gen.alphaNumStr.suchThat(_.nonEmpty),
      Gen.nonEmptyListOf(Gen.oneOf("é", "ü", "中", "文", "λ", "ж",
        "\ud83d\ude42", ".", ",")).map(_.mkString))
    val sep: Gen[String] = Gen.nonEmptyListOf(
      Gen.oneOf(' ', '\t', '\n', '\u000B', '\f', '\r')).map(_.mkString)
    val textGen: Gen[String] = for {
      n <- Gen.choose(0, 12)
      toks <- Gen.listOfN(n, token)
      seps <- Gen.listOfN(n + 1, sep)
      lead <- Gen.oneOf("", " ")
    } yield lead + toks.zip(seps).map { case (t, s) => t + s }.mkString
    val texts = draws(textGen, 120)
    for (k <- Seq(1, 2, 4)) {
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val kern = Dedup.shingleArrays(df, "doc_id", "text", k)
        .orderBy("doc_id").collect().map(r => r.getLong(0) -> r.getSeq[String](1))
      val cols = Dedup.shingleArraysColumns(df, "doc_id", "text", k)
        .orderBy("doc_id").collect().map(r => r.getLong(0) -> r.getSeq[String](1))
      assert(kern.toSeq == cols.toSeq, s"k=$k")
      val cnt = df.select(tokenCountF(col("text")),
        size(TextFunctions.tokens(col("text")))).collect()
      cnt.foreach(r => assert(r.getInt(0) == r.getInt(1)))
      // minhash kernel vs aggregate formulation over the same arrays
      val sigK = Dedup.minhashSignatures(df, "doc_id", "text", k, 16)
        .orderBy("doc_id").collect().map(r => r.getLong(0) -> r.getSeq[Long](1))
      val sigA = Dedup.minhashSignaturesAgg(
        Dedup.shingles(df, "doc_id", "text", k), "doc_id", 16)
        .orderBy("doc_id").collect().map(r => r.getLong(0) -> r.getSeq[Long](1))
      assert(sigK.toSeq == sigA.toSeq, s"k=$k")
    }
  }
}
