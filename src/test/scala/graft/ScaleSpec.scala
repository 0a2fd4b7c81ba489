package graft

import graft.operators.{BloomJoin, Dedup, FrequentItems, Sampling, Skew}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Round-4 scale operators: heavy hitters (Misra-Gries candidates +
 * exact verify), Bloom semi-join reduction, incremental minhash
 * dedup, stratified sampling, batch sessionization. Each test pins
 * the EXACTNESS contract (sketch/pruning passes are candidate
 * generation only) and, where the plan shape is the point, the plan.
 */
class ScaleSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .getOrCreate()

  val sf = "/root/testdata/sf0.001"

  test("heavyHitters returns EXACTLY the tokens above threshold (vs direct groupBy)") {
    import graft.functions.TextFunctions
    val tok = Tables.load(spark, sf, "documents")
      .select(explode(TextFunctions.tokens(col("text"))).as("tok"))
    val got = FrequentItems.heavyHitters(tok, "tok", minFreq = 0.01)
      .orderBy("tok").collect().map(r => (r.getString(0), r.getLong(1)))
    val total = tok.count()
    val want = tok.groupBy("tok").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt").cast("double") > lit(0.01) * lit(total.toDouble))
      .orderBy("tok").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(want.nonEmpty, "fixture should have heavy hitters")
    assert(got.toSeq == want.toSeq)
  }

  test("Misra-Gries candidates are complete on an adversarially skewed stream") {
    import spark.implicits._
    // 3 heavy items buried in a long tail; threshold 2% → cap 100
    val heavy = Seq.fill(500)("h1") ++ Seq.fill(300)("h2") ++ Seq.fill(250)("h3")
    val tail = (0 until 9000).map(i => s"t${i % 4500}")
    val data = new scala.util.Random(42).shuffle(heavy ++ tail)
    val df = data.toDF("x").repartition(7)
    val out = FrequentItems.heavyHitters(df, "x", minFreq = 0.02)
      .collect().map(_.getString(0)).toSet
    val n = data.size.toDouble
    val exact = data.groupBy(identity).view.mapValues(_.size)
      .filter { case (_, c) => c > 0.02 * n }.keys.toSet
    assert(out == exact, s"got $out want $exact")
  }

  test("bloom semiJoinReduced == plain semi join; probe filter is native might_contain") {
    val li = Tables.load(spark, sf, "lineitem")
      .select(col("l_partkey"), col("l_orderkey"), col("l_linenumber"))
    val build = Tables.load(spark, sf, "part")
      .filter(col("p_size") <= 5).select(col("p_partkey"))
    val reduced = BloomJoin.semiJoinReduced(li, "l_partkey", build, "p_partkey",
      expectedItems = 10000L, fpp = 0.01)
    val plain = li.join(build, li("l_partkey") === build("p_partkey"), "left_semi")
    assert(reduced.count() == plain.count())
    assert(reduced.exceptAll(plain).isEmpty && plain.exceptAll(reduced).isEmpty)
    val planStr = reduced.queryExecution.executedPlan.toString
    assert(planStr.contains("might_contain"), planStr)
  }

  test("bloom pre-filter keeps all matches and prunes most non-matches") {
    val li = Tables.load(spark, sf, "lineitem").select(col("l_partkey"))
    val build = Tables.load(spark, sf, "part")
      .filter(col("p_size") <= 2).select(col("p_partkey"))
    val pre = BloomJoin.bloomFiltered(li, "l_partkey", build, "p_partkey",
      expectedItems = 10000L, fpp = 0.01)
    val matches = li.join(build, li("l_partkey") === build("p_partkey"), "left_semi")
    // completeness: every true match survives the bloom pass
    assert(matches.exceptAll(pre).isEmpty)
    // effectiveness: the pass prunes the clear majority of the fact side
    val (nLi, nPre) = (li.count(), pre.count())
    assert(nPre < nLi / 2, s"bloom kept $nPre of $nLi")
  }

  test("sessionize splits on >30min gaps (hand-checked case)") {
    import spark.implicits._
    val m = 60L * 1000000
    val rows = Seq( // (user, event, us)
      (1L, 1L, 0L), (1L, 2L, 10 * m), (1L, 3L, 50 * m), // gap 40min → split
      (2L, 4L, 0L), (2L, 5L, 29 * m), (2L, 6L, 58 * m)) // gaps 29min → one session
    val df = rows.toDF("user_id", "event_id", "us")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("us", "event_id")
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val sess = df.withColumn("prev", lag(col("us"), 1).over(w))
      .withColumn("brk", when(col("prev").isNull ||
        col("us") - col("prev") > 30 * m, 1L).otherwise(0L))
      .withColumn("session_id", sum(col("brk")).over(run))
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n"))
      .orderBy("user_id", "session_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(sess.toSeq == Seq((1L, 1L, 2L), (1L, 2L, 1L), (2L, 1L, 3L)))
  }

  test("minhashIncremental == full pair set restricted to batch-touching pairs") {
    val d = Tables.load(spark, sf, "documents")
    val cut = Sampling.cuts(Seq(0.9))(1)
    val isNew = Sampling.hashBucket(col("doc_id")) >= lit(cut)
    val inc = Dedup.minhashIncremental(d.filter(!isNew), d.filter(isNew),
      "doc_id", "text").orderBy("a", "b")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val newIds = d.filter(isNew).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(newIds.nonEmpty && newIds.size < d.count(), "batch split sane")
    val full = Dedup.minhashDupPairs(d, "doc_id", "text")
      .orderBy("a", "b").collect().map(r => (r.getLong(0), r.getLong(1)))
    val want = full.filter { case (a, b) => newIds(a) || newIds(b) }
    assert(inc.toSeq == want.toSeq)
  }

  test("groupTopK == naive per-group window (exact under salting)") {
    import graft.functions.TextFunctions
    import org.apache.spark.sql.expressions.Window
    val d = Tables.load(spark, sf, "documents")
      .select(col("doc_id"), TextFunctions.langId(col("text")).as("lang"))
    val order = Seq(Sampling.hashBucket(col("doc_id")), col("doc_id"))
    val got = Skew.groupTopK(d, Seq("lang"), order, n = 5, nSalts = 4)
      .select("lang", "rk", "doc_id").orderBy("lang", "rk").collect().toSeq
    val w = Window.partitionBy("lang").orderBy(order: _*)
    val want = d.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5)
      .select("lang", "rk", "doc_id").orderBy("lang", "rk").collect().toSeq
    assert(got == want)
  }

  test("zValue interleaves bits; z-ordered layout narrows per-file ranges") {
    import graft.sources.Bucketing
    // hand-checked interleave: a=0b101, b=0b011 → z=0b011011 = 27
    val z0 = spark.range(1)
      .select(Bucketing.zValue(lit(5L), lit(3L), 3).as("z"))
      .head().getLong(0)
    assert(z0 == 27L)
    // synthetic 64×64 grid: 4 z-range files must cover ~half the range
    // of EACH dimension; naive round-robin files cover all of both
    import spark.implicits._
    val grid = spark.range(4096)
      .select((col("id") % 64).as("a"),
        floor(col("id") / 64).cast("long").as("b"))
    val base = java.nio.file.Files.createTempDirectory("zorder").toString
    Bucketing.writeZOrdered(grid, s"$base/z",
      Bucketing.zValue(col("a"), col("b"), 6), nFiles = 4)
    grid.repartition(4).write.parquet(s"$base/naive")
    def meanRange(d: String, c: String): Double = {
      val fs = new java.io.File(d).listFiles
        .filter(_.getName.endsWith(".parquet")).map(_.toString)
      val rs = fs.map { f =>
        val mm = spark.read.parquet(f).agg(min(col(c)), max(col(c))).head()
        (mm.getLong(1) - mm.getLong(0)).toDouble
      }
      rs.sum / rs.length
    }
    assert(spark.read.parquet(s"$base/z").count() == 4096)
    val (za, na) = (meanRange(s"$base/z", "a"), meanRange(s"$base/naive", "a"))
    val (zb, nb) = (meanRange(s"$base/z", "b"), meanRange(s"$base/naive", "b"))
    assert(za < 0.8 * na, s"a: z=$za naive=$na")
    assert(zb < 0.8 * nb, s"b: z=$zb naive=$nb")
  }

  test("zValueN: budget-aware interleave; 3-D layout narrows per-file ranges on ALL dims") {
    import graft.sources.Bucketing
    import spark.implicits._
    // the 2-D form is the n-D form bit for bit
    val eq = spark.range(100).select(
      (col("id") * 37 % 64).as("a"), (col("id") * 11 % 64).as("b"))
    assert(eq.filter(Bucketing.zValue(col("a"), col("b"), 6) =!=
      Bucketing.zValueN(Seq(col("a") -> 6, col("b") -> 6))).count() == 0)
    // hand-checked UNEVEN budgets (a=2 bits, b=1, c=3), a=3 b=1 c=5:
    // round-robin places a0,b0,c0,a1,c1,c2 → z = 1|2|4|8|0|32 = 47
    val z0 = spark.range(1).select(Bucketing.zValueN(
      Seq(lit(3L) -> 2, lit(1L) -> 1, lit(5L) -> 3)).as("z"))
      .head().getLong(0)
    assert(z0 == 47L)
    // 16×16×16 grid, 8 z-range files: each must hold a narrow range of
    // ALL THREE dimensions (a z-contiguous 512-point block is an 8³
    // subcube); naive round-robin files span every dimension fully
    val grid = spark.range(4096).select(
      (col("id") % 16).as("a"),
      (floor(col("id") / 16) % 16).cast("long").as("b"),
      floor(col("id") / 256).cast("long").as("c"))
    val base = java.nio.file.Files.createTempDirectory("zorder3").toString
    Bucketing.writeZOrdered(grid, s"$base/z",
      Bucketing.zValueN(Seq(col("a") -> 4, col("b") -> 4, col("c") -> 4)),
      nFiles = 8)
    grid.repartition(8).write.parquet(s"$base/naive")
    def meanRange(d: String, c: String): Double = {
      val fs = new java.io.File(d).listFiles
        .filter(_.getName.endsWith(".parquet")).map(_.toString)
      val rs = fs.map { f =>
        val mm = spark.read.parquet(f).agg(min(col(c)), max(col(c))).head()
        (mm.getLong(1) - mm.getLong(0)).toDouble
      }
      rs.sum / rs.length
    }
    assert(spark.read.parquet(s"$base/z").count() == 4096)
    for (dim <- Seq("a", "b", "c")) {
      val (zr, nr) = (meanRange(s"$base/z", dim), meanRange(s"$base/naive", dim))
      assert(zr < 0.8 * nr, s"$dim: z=$zr naive=$nr")
    }
  }

  test("compact merges small cache files; data and marker preserved") {
    import graft.sources.Cache
    val dir = java.nio.file.Files.createTempDirectory("compact").toString + "/c"
    val s = Slice(Tables.load(spark, sf, "orders").repartition(16), 1)
    Cache.cache(s, dir)
    def files(d: String) = new java.io.File(d).listFiles
      .filter(_.getName.endsWith(".parquet"))
    assert(files(dir).length == 16)
    val rows = spark.read.parquet(dir).count()
    val n = Cache.compact(spark, dir, targetBytes = Long.MaxValue)
    assert(n == 1 && files(dir).length == 1)
    assert(spark.read.parquet(dir).count() == rows)
    // marker survived the swap → cache() still short-circuits
    val again = Cache.cache(s, dir)
    assert(again.df.count() == rows && files(dir).length == 1)
  }

  test("salted hash decisions are independent; unsalted ones correlate") {
    import spark.implicits._
    val keys = spark.range(2000).toDF("k")
    // unsalted 50% sample then 0.9-train split: survivors all train
    val unsalted = Sampling.assignSplit(
      Sampling.hashSample(keys, "k", 0.5), "k",
      Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05))
    assert(unsalted.select("split").distinct().count() == 1,
      "unsalted composition must expose the correlation")
    // distinct salt → all three splits appear among survivors
    val salted = Sampling.assignSplit(
      Sampling.hashSample(keys, "k", 0.5, salt = "sample"), "k",
      Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05))
    assert(salted.select("split").distinct().count() == 3,
      "salted decisions must be independent")
  }

  test("quarantine fails closed on null predicates and splits exactly") {
    import graft.operators.Quality
    import spark.implicits._
    val df = Seq((1L, Some(5)), (2L, None), (3L, Some(50))).toDF("id", "v")
    val rules = Seq("v_big" -> (col("v") >= 10))
    val (good, bad) = Quality.quarantine(df, rules)
    assert(good.select("id").collect().map(_.getLong(0)).toSet == Set(3L))
    // row 2's predicate is NULL → must land in quarantine (fail closed)
    assert(bad.select("id").collect().map(_.getLong(0)).toSet == Set(1L, 2L))
    assert(bad.filter(col("id") === 2L)
      .select(array_join(col("violations"), ",")).head().getString(0) == "v_big")
  }

  test("stratifiedSample: per-stratum hash rule, stable under repartition") {
    import graft.functions.TextFunctions
    val d = Tables.load(spark, sf, "documents")
      .withColumn("lang", TextFunctions.langId(col("text")))
    val s1 = Sampling.stratifiedSample(d, "doc_id", col("lang"),
      Map("en" -> 0.25, "fr" -> 0.5))
    val s2 = Sampling.stratifiedSample(d.repartition(13), "doc_id", col("lang"),
      Map("en" -> 0.25, "fr" -> 0.5))
    val ids1 = s1.select("doc_id").collect().map(_.getLong(0)).toSet
    val ids2 = s2.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids1 == ids2, "membership must be partitioning-independent")
    // non-listed strata keep everything; en is strictly downsampled
    val enAll = d.filter(col("lang") === "en").count()
    val enKept = s1.filter(col("lang") === "en").count()
    assert(enKept < enAll)
    val otherAll = d.filter(!col("lang").isin("en", "fr")).count()
    val otherKept = s1.filter(!col("lang").isin("en", "fr")).count()
    assert(otherKept == otherAll)
  }

  test("mixtureSample: binding domain kept whole, mixture near targets, unlisted dropped") {
    val d = Tables.load(spark, sf, "documents") // has a real lang column
    val weights = Map("en" -> 0.25, "de" -> 0.25, "es" -> 0.25, "fr" -> 0.25)
    val s = Sampling.mixtureSample(d, "doc_id", col("lang"), weights).persist()
    val all = d.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = s.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // unlisted domains dropped entirely
    assert(kept.keySet == weights.keySet.intersect(all.keySet))
    // the binding domain (max n/w is the binding CONSTRAINT — the one
    // with the SMALLEST n/w) survives whole: max-data property
    val binding = weights.keys.minBy(l => all(l) / weights(l))
    assert(kept(binding) == all(binding), s"binding=$binding kept=$kept all=$all")
    // achieved mixture ≈ targets (hash sampling is Bernoulli, so loose)
    val total = kept.values.sum.toDouble
    weights.foreach { case (l, w) =>
      assert(math.abs(kept(l) / total - w) < 0.1, s"$l: ${kept(l) / total} vs $w")
    }
    // membership stable under repartition
    val ids1 = s.select("doc_id").collect().map(_.getLong(0)).toSet
    val ids2 = Sampling.mixtureSample(d.repartition(13), "doc_id",
      col("lang"), weights).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids1 == ids2)
    s.unpersist()
    // non-dyadic weights: w·C/n rounds through doubles (can land at
    // 1-2^-53); the n/w == C equality branch must still keep the
    // binding domain whole
    val w2 = Map("en" -> 0.7, "de" -> 0.3)
    val s2 = Sampling.mixtureSample(d, "doc_id", col("lang"), w2)
    val binding2 = w2.keys.minBy(l => all(l) / w2(l))
    assert(s2.filter(col("lang") === binding2).count() == all(binding2))
  }

  test("mixtureTemperature: sqrt-law flattening, alpha=1 no-op, alpha=0 uniform") {
    val d = Tables.load(spark, sf, "documents")
    val langs = Seq("en", "de", "es", "fr")
    val all = d.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val nMin = langs.map(all).min
    // alpha = 0.5: smallest listed domain binding (kept whole), every
    // domain keeps ~sqrt(n_min/n_d) → expected count sqrt(n_min·n_d)
    val s = Sampling.mixtureTemperature(d, "doc_id", col("lang"), langs)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(s.keySet == langs.toSet, "unlisted domains must be dropped")
    val binding = langs.minBy(all)
    assert(s(binding) == all(binding), s"binding=$binding s=$s all=$all")
    langs.foreach { l =>
      val exp = math.sqrt(nMin.toDouble * all(l))
      assert(math.abs(s(l) - exp) < 4 * math.sqrt(exp) + 2,
        s"$l: kept ${s(l)}, expected ~$exp")
    }
    // alpha = 1: the natural distribution — every listed row survives
    val nat = Sampling.mixtureTemperature(d, "doc_id", col("lang"), langs, 1.0)
    assert(nat.count() == langs.map(all).sum)
    // alpha = 0: uniform — every domain ~n_min
    val uni = Sampling.mixtureTemperature(d, "doc_id", col("lang"), langs, 0.0)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    langs.foreach { l =>
      assert(math.abs(uni(l) - nMin) < 4 * math.sqrt(nMin.toDouble) + 2,
        s"$l: kept ${uni(l)}, expected ~$nMin")
    }
  }

  test("mixtureUpsample: binding domain repeats exactly maxEpochs; copies contiguous; maxEpochs=1 == mixtureSample") {
    val d = Tables.load(spark, sf, "documents")
    val weights = Map("en" -> 0.4, "de" -> 0.3, "zh" -> 0.3)
    val all = d.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val up = Sampling.mixtureUpsample(d, "doc_id", col("lang"), weights,
      maxEpochs = 2.0).persist()
    // binding domain: every doc exactly 2 copies (0 and 1)
    val binding = weights.keys.minBy(l => all(l) / weights(l))
    val bindingCopies = up.filter(col("lang") === binding)
      .groupBy("doc_id").count().collect().map(_.getLong(1))
    assert(bindingCopies.nonEmpty && bindingCopies.forall(_ == 2L))
    // copies contiguous per doc: max copy == count-1
    val bad = up.groupBy("doc_id")
      .agg(count(lit(1)).as("c"), max(col("copy")).as("m"))
      .filter(col("m") =!= col("c") - 1).count()
    assert(bad == 0)
    // achieved mixture ≈ targets
    val kept = up.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = kept.values.sum.toDouble
    weights.foreach { case (l, w) =>
      assert(math.abs(kept(l) / total - w) < 0.1, s"$l: ${kept(l) / total} vs $w")
    }
    up.unpersist()
    // degenerate case: maxEpochs = 1 is exactly mixtureSample (with the
    // same salt), copy always 0
    val one = Sampling.mixtureUpsample(d, "doc_id", col("lang"), weights,
      maxEpochs = 1.0, salt = "")
    val ms = Sampling.mixtureSample(d, "doc_id", col("lang"), weights)
    assert(one.select("doc_id").collect().map(_.getLong(0)).toSet ==
      ms.select("doc_id").collect().map(_.getLong(0)).toSet)
    assert(one.agg(max(col("copy"))).first().getLong(0) == 0L)
  }

  test("shuffleEpoch: contiguous deterministic positions; salts give distinct epochs") {
    val d = Tables.load(spark, sf, "documents").select("doc_id")
    val p1 = Sampling.shuffleEpoch(d, "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val n = d.count()
    // a permutation: every doc once, positions exactly 0..n-1
    assert(p1.size == n && p1.values.toSet == (0L until n).toSet)
    // independent of input partitioning (the whole point vs rand(seed))
    val p2 = Sampling.shuffleEpoch(d.repartition(13), "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(p1 == p2)
    // matches the in-memory sort by (bucket, id)
    val buckets = d.select(col("doc_id"),
      Sampling.hashBucket(col("doc_id")).as("b")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expect = p1.keys.toSeq.sortBy(id => (buckets(id), id))
      .zipWithIndex.map { case (id, i) => id -> i.toLong }.toMap
    assert(p1 == expect)
    // a different salt is a different epoch permutation
    val p3 = Sampling.shuffleEpoch(d, "doc_id", salt = "epoch1")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(p3 != p1 && p3.values.toSet == (0L until n).toSet)
  }

  test("weightedSample: k per group without replacement, repartition-stable, " +
    "weight-monotone") {
    import spark.implicits._
    val d = Tables.load(spark, sf, "documents")
    val got = Sampling.weightedSample(d, "doc_id", col("lang"),
      col("n_chars"), k = 3)
      .select("lang", "doc_id").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toSeq
    // <= k per group, never a duplicate row
    assert(got.size == got.toSet.size)
    got.groupBy(_._1).foreach { case (lang, rows) =>
      assert(rows.size <= 3, s"$lang got ${rows.size} rows")
    }
    val sizes = d.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    sizes.foreach { case (lang, n) =>
      assert(got.count(_._1 == lang) == math.min(3L, n),
        s"$lang: expected min(3,$n) rows")
    }
    // pure function of (key, salt): independent of input partitioning
    val got2 = Sampling.weightedSample(d.repartition(13), "doc_id",
      col("lang"), col("n_chars"), k = 3)
      .select("lang", "doc_id").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toSeq
    assert(got.sorted == got2.sorted)
    // exponential-clocks weighting, ONE job over 300 salted replays of
    // a 3-row group with weights 2:1:1 — the salt rides as a column
    // through the same md5(key||salt) idiom hashBucket uses, priority
    // replicated from the operator's documented formula. P(heavy
    // first) = 2/4; the deterministic win count must sit in a ±4σ band.
    val salts = (0 until 300).map(s => s"p$s")
    val rows = for { s <- salts; (id, w) <- Seq((1L, 2L), (2L, 1L), (3L, 1L)) }
      yield (s, id, w)
    val h = conv(substring(md5(concat(col("id").cast("string"),
      col("salt")).cast("binary")), 1, 8), 16, 10).cast("long")
    val u = (h + lit(1L)).cast("double") / lit(4294967296.0)
    val pri = floor(-log(u) * lit(16777216.0)).cast("long")
      .cast("double") / col("w").cast("double")
    val wdw = org.apache.spark.sql.expressions.Window
      .partitionBy("salt").orderBy(pri.asc, h.asc, col("id").asc)
    val winners = rows.toDF("salt", "id", "w")
      .withColumn("rn", row_number().over(wdw)).filter(col("rn") === 1)
      .select("salt", "id").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val heavyWins = winners.values.count(_ == 1L)
    assert(heavyWins > 115 && heavyWins < 185,
      s"heavy (w=2 of 4) won $heavyWins/300 — outside the 1/2 band")
    // and the formula replay IS the operator: same winner via the API
    // on a spot-checked salt
    val three = Seq(("g", 1L, 2L), ("g", 2L, 1L), ("g", 3L, 1L))
      .toDF("grp", "id", "w")
    val apiWin = Sampling.weightedSample(three, "id", col("grp"), col("w"),
      k = 1, salt = "p7").select("id").collect().head.getLong(0)
    assert(apiWin == winners("p7"), s"API winner $apiWin != replay ${winners("p7")}")
    // weight <= 0 and NULL rows are excluded outright
    val mixed = Seq(("g", 1L, 5L), ("g", 2L, 0L), ("g", 3L, -1L))
      .toDF("grp", "id", "w")
      .union(Seq(("g", 4L)).toDF("grp", "id")
        .withColumn("w", lit(null).cast("long")))
    val kept = Sampling.weightedSample(mixed, "id", col("grp"), col("w"),
      k = 10).select("id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L))
    // GLOBAL form: same selection as the one-group window path, but the
    // physical plan is TakeOrderedAndProject (per-partition top-k +
    // k-sized merge) — never an Exchange-then-global-sort
    val g = Sampling.weightedSampleGlobal(d, "doc_id", col("n_chars"), k = 7)
    val gIds = g.select("doc_id").collect().map(_.getLong(0)).toSet
    val wIds = Sampling.weightedSample(d, "doc_id", lit(1), col("n_chars"),
      k = 7).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(gIds == wIds && gIds.size == 7)
    val gPlan = g.queryExecution.executedPlan.toString
    assert(gPlan.contains("TakeOrderedAndProject"), gPlan.take(400))
  }

  test("dupShingleStats: exact counts on a hand-checked corpus") {
    import spark.implicits._
    // k=2 shingles: doc1 {a b, b c}, doc2 {a b, b d}, doc3 {x y}
    val d = Seq((1L, "a b c"), (2L, "a b d"), (3L, "x y"))
      .toDF("doc_id", "text")
    val got = Dedup.dupShingleStats(d, "doc_id", "text", k = 2)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq(
      (1L, 2L, 1L, 0.5),  // "a b" shared with doc2
      (2L, 2L, 1L, 0.5),
      (3L, 1L, 0L, 0.0))) // "x y" unique
    // a doc with < k tokens is absent
    val short = Seq((9L, "solo")).toDF("doc_id", "text")
    assert(Dedup.dupShingleStats(short, "doc_id", "text", k = 2).count() == 0)
  }
}
