package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Physical-plan assertions — the 100 TB discipline, checked in CI:
 * filters reach the parquet scan, projections prune columns, small
 * dims broadcast, aggregates are partial+final, and per-shard ops
 * don't shuffle. Plans regress silently; these tests make the plan
 * shape part of the contract (the analog of the reference's
 * compile-shape goldens, exec/compile_test.go).
 */
class PlanSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .getOrCreate()

  val sf = "/root/testdata/sf0.001"

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def formatted(df: org.apache.spark.sql.DataFrame): String = {
    val out = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(out)) { df.explain("formatted") }
    out.toString
  }

  test("filter is pushed down to the parquet scan") {
    val df = SparkEntry.queries("op_filter")(spark, sf)
    val f = formatted(df)
    assert(f.contains("PushedFilters: ["), f)
    assert(f.contains("IsNotNull(l_returnflag)") || f.contains("EqualTo(l_returnflag,R)"), f)
  }

  test("projection prunes the scan schema (ReadSchema)") {
    val df = Tables.load(spark, sf, "lineitem").select("l_orderkey", "l_quantity")
    val f = formatted(df)
    val read = f.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(read.contains("l_orderkey") && read.contains("l_quantity"), read)
    assert(!read.contains("l_extendedprice"), read)
  }

  test("q3/q5 broadcast the dimension sides (no shuffle of the fact table for dims)") {
    assert(plan(SparkEntry.queries("q3_shipping_priority")(spark, sf))
      .contains("BroadcastHashJoin"))
    assert(plan(SparkEntry.queries("q5_local_supplier")(spark, sf))
      .contains("BroadcastHashJoin"))
  }

  test("reduce aggregates partially before the shuffle (map-side combine)") {
    val p = plan(SparkEntry.queries("op_prefixed")(spark, sf))
    assert(p.contains("partial_"), p) // HashAggregate(partial) before Exchange
    assert(p.contains("Exchange"), p)
  }

  test("q1 runs as scan → partial agg → exchange → final agg (single shuffle)") {
    val p = plan(SparkEntry.queries("q1_pricing_summary")(spark, sf))
    val shuffles = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(shuffles == 1, s"expected 1 hash exchange, plan:\n$p")
  }

  test("head(n) stays narrow — no Exchange in a per-shard limit") {
    val s = Tables.slice(spark, sf, "lineitem").head(5)
    assert(!plan(s.df).contains("Exchange"), plan(s.df))
  }

  test("reshuffle produces exactly one hash exchange on the key") {
    val s = Tables.slice(spark, sf, "lineitem")
      .select(col("l_suppkey"), col("l_quantity")).reshuffle()
    val p = plan(s.df)
    assert(p.contains("Exchange hashpartitioning(l_suppkey"), p)
  }

  test("whole-stage codegen covers the scan+filter+project hot path") {
    val df = Tables.load(spark, sf, "lineitem")
      .filter(col("l_quantity") > 10)
      .select((col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("r"))
    // the "*(n)" prefix marks operators inside a WholeStageCodegen stage
    val p = plan(df)
    assert(p.contains("*(1) Project") && p.contains("*(1) Filter"), p)
  }

  test("cogroup is union-tag-aggregate: ONE exchange, no join at all") {
    val df = SparkEntry.queries("op_cogroup")(spark, sf)
    val p = plan(df)
    assert(!p.contains("Join"), p)
    val shuffles = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(shuffles == 1, s"expected exactly 1 exchange, got $shuffles:\n$p")
  }

  test("partitioned layout: partition filter prunes directories at plan time") {
    import graft.sources.Cache
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString
    val ev = Tables.slice(spark, sf, "events")
      .select(col("event_id"), col("user_id"), col("value"),
        to_date(col("ts")).cast("string").as("day"))
    Cache.writePartitioned(ev, dir, Seq("day"))
    val nDays = ev.df.select("day").distinct().count()
    assert(nDays > 3, s"corpus spans $nDays days")
    val pruned = Cache.readPartitioned(spark, dir)
      .filter(col("day") === "2024-01-05").df
    val f = formatted(pruned)
    assert(f.contains("PartitionFilters") &&
      f.linesIterator.exists(l => l.contains("PartitionFilters") && l.contains("day")), f)
    // the partition predicate must NOT appear as a post-scan Filter
    assert(!f.contains("PushedFilters: [IsNotNull(day)"), f)
    assert(pruned.count() ==
      ev.filter(col("day") === "2024-01-05").count())
  }

  test("global top-k plans as TakeOrderedAndProject, never a full sort") {
    val df = SparkEntry.queries("op_topk_global")(spark, sf)
    val p = plan(df)
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("Exchange rangepartitioning"), p)
  }

  test("q7 broadcasts all four dims; only the fact-fact join shuffles") {
    val df = SparkEntry.queries("q7_volume_shipping")(spark, sf)
    val p = plan(df)
    // At sf0.001 AQE may broadcast the fact-fact join too; the contract
    // is: all 4 dims broadcast, and at most the one fact-fact join ever
    // shuffles.
    val bcasts = "BroadcastHashJoin".r.findAllIn(p).size
    val shuffledJoins = "SortMergeJoin".r.findAllIn(p).size +
      "ShuffledHashJoin".r.findAllIn(p).size
    assert(bcasts >= 4, s"expected >=4 broadcast joins, got $bcasts:\n$p")
    assert(shuffledJoins <= 1, s"expected <=1 shuffled join, got $shuffledJoins:\n$p")
  }

  test("range join is an equi-join on (key, bucket) — no nested loop") {
    val df = SparkEntry.queries("q_range_join")(spark, sf)
    val p = plan(df)
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin") ||
      p.contains("ShuffledHashJoin"), p)
  }

  test("dedup_embedding is a block-pair EQUI-join — no BNLJ, no cartesian") {
    val df = SparkEntry.queries("dedup_embedding")(spark, sf)
    val p = plan(df)
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin") ||
      p.contains("ShuffledHashJoin"), p)
  }

  test("sim_topk_lsh is bucket equi-joins; candidate distinct carries ids only") {
    val df = SparkEntry.queries("sim_topk_lsh")(spark, sf)
    val p = plan(df)
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
    // the dedup aggregate must group on the two id columns alone —
    // float vectors must not ride through the distinct's exchange
    val distinctAgg = p.linesIterator.filter(l =>
      l.contains("HashAggregate") && l.contains("query_id") && l.contains("neighbor_id"))
    assert(distinctAgg.forall(l => !l.contains("_v")), p)
  }

  test("tpch3 shapes: no nested loops; q2/q20/q21 broadcast their dims") {
    // q11 excluded: its 1-row scalar threshold crossJoin is the benign
    // scalar-subquery BNLJ (same class as q22)
    for (q <- Seq("q2_min_cost_supplier", "q12_late_priority",
      "q20_promotion_suppliers", "q21_waiting_suppliers")) {
      val p = plan(SparkEntry.queries(q)(spark, sf))
      assert(!p.contains("BroadcastNestedLoopJoin") &&
        !p.contains("CartesianProduct"), s"$q:\n$p")
    }
    for (q <- Seq("q2_min_cost_supplier", "q20_promotion_suppliers",
      "q21_waiting_suppliers"))
      assert(plan(SparkEntry.queries(q)(spark, sf)).contains("BroadcastHashJoin"), q)
  }

  test("IVF index: probe prunes list_id partitions; results match in-memory IVF") {
    import graft.operators.Similarity
    val emb = Tables.load(spark, sf, "embeddings")
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf").toString
    Similarity.buildIvfIndex(emb, "vec_id", "embedding", 64, nList = 16, dir)
    val queries = emb.filter(col("vec_id") < 10)
    val fromIdx = Similarity.ivfTopKFromIndex(spark, dir, queries,
      "vec_id", "embedding", 64, k = 5)
    // scan reads only the probed lists' directories — partition pruning
    val f = formatted(fromIdx)
    assert(f.linesIterator.exists(l =>
      l.contains("PartitionFilters") && l.contains("list_id")), f)
    // same training → same centroids → identical results to inline IVF
    val inline = Similarity.ivfTopK(emb, queries, "vec_id", "embedding",
      64, k = 5, nList = 16, nProbe = 4, iters = 2)
    def s(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(s(fromIdx) == s(inline))
    assert(s(fromIdx).nonEmpty)
  }

  test("funnel is ONE user-keyed exchange — windows and per-user agg share it; no joins") {
    val df = SparkEntry.queries("q_events_funnel")(spark, sf)
    val p = plan(df)
    assert(!p.contains("Join"), p)
    // the k running-min windows and the per-user flag aggregate all
    // reuse the single hash exchange on user_id; the one-row rollup is
    // an Exchange SinglePartition, not a hash shuffle
    val shuffles = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(shuffles == 1, s"expected 1 hash exchange, got $shuffles:\n$p")
  }

  test("segment dedup is digest-keyed equi-joins — no pair space, no nested loop") {
    val df = SparkEntry.queries("text_seg_dedup")(spark, sf)
    val p = plan(df)
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), p)
    // every hash exchange is keyed by the digest or the doc id — never
    // by anything that could enumerate segment pairs
    val exchanges = p.linesIterator.filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(exchanges.forall(l => l.contains("__digest") || l.contains("doc_id")),
      exchanges.mkString("\n"))
  }

  test("index probe: batch side broadcasts against the bucketed bands scan") {
    import graft.operators.MinhashIndex
    val d = Tables.load(spark, sf, "documents")
    val cut = graft.operators.Sampling.cuts(Seq(0.9))(1)
    val isNew = graft.operators.Sampling.hashBucket(col("doc_id")) >= lit(cut)
    val dir = java.nio.file.Files.createTempDirectory("graft_mhidx_ps").toString
    MinhashIndex.build(spark, d.filter(!isNew), "doc_id", "text", dir,
      MinhashIndex.Config())
    val probe = MinhashIndex.incrementalDupPairs(spark, dir, d.filter(isNew),
      "doc_id", "text", MinhashIndex.Config())
    val f = formatted(probe)
    assert(f.contains("Bucketed: true"), f)
    assert(!plan(probe).contains("CartesianProduct"), plan(probe))
    // the only nested-loop joins allowed are the documented benign
    // ONE-ROW broadcasts of the hot-shingle array (df-cap application);
    // any other BNLJ would be a pair-space scale-killer
    val rogue = plan(probe).linesIterator
      .filter(_.contains("BroadcastNestedLoopJoin"))
      .filterNot(_.contains("hotarr")).toSeq
    assert(rogue.isEmpty, rogue.mkString("\n"))
  }

  test("dedup_minhash plan: native kernels, no exploded-signature aggregation") {
    import graft.operators.Dedup
    val d = Tables.load(spark, sf, "documents")
    val q = Dedup.minhashDupPairs(d, "doc_id", "text", 3, 64, 2, 0.5)
    val s = plan(q)
    // signatures come from the one-loop kernel over per-doc arrays —
    // the candidate/verify inputs are checkpointed leaves in the pair
    // plan (the kernel ran inside the candidate-generation job), so
    // assert the kernel at the surface where the operator builds it
    assert(plan(Dedup.shingleArrays(d, "doc_id", "text", 3)
      .select(col("doc_id"),
        graft.functions.MinhashFunctions.minhashSigF(col("sharr"), 64).as("sig")))
      .contains("minhash_signature"))
    assert(plan(Dedup.shingleArrays(d, "doc_id", "text", 3))
      .contains("shingle_array"))
    // ...never from 64 min(xxhash64) aggregates over exploded shingles
    assert(!s.contains("min(xxhash64"), "old aggregate signature path resurfaced")
    // the only nested-loop join is the documented one-row hot-array
    // broadcast (df-cap application)
    assert(!s.contains("CartesianProduct"), s)
    val rogue = s.linesIterator.filter(_.contains("BroadcastNestedLoopJoin"))
      .filterNot(_.contains("hotarr")).toSeq
    assert(rogue.isEmpty, rogue.mkString("\n"))
  }

  test("deterministic HLL: error bound, exact-integer register state, " +
    "ln series precision, partial+final aggregation") {
    import graft.operators.Hll
    val exact = SparkEntry.queries("q_count_distinct")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val df = SparkEntry.queries("q_hll_distinct")(spark, sf)
    val rows = df.collect()
    assert(rows.map(_.getString(0)).toSet == exact.keySet)
    rows.foreach { r =>
      val (k, est) = (r.getString(0), r.getDouble(3))
      val n = exact(k)
      // b=12 -> rsd ~1.6%; allow 3 sigma
      assert(math.abs(est - n) / n < 0.05, s"$k: hll $est vs exact $n")
      // register-state invariant: ssum = zeros*2^40 + per-bucket terms,
      // bounded by m*2^40
      assert(r.getLong(2) >= (r.getLong(1) << 40) &&
        r.getLong(2) <= (4096L << 40), r.toString)
    }
    // the deterministic ln replays math.log to series precision over
    // the whole operand domain (zeros in [1, m])
    val lnRows = spark.range(1, 4097)
      .select(col("id"), Hll.lnOfPosInt(col("id")).as("lnv")).collect()
    lnRows.foreach { r =>
      assert(math.abs(r.getDouble(1) - math.log(r.getLong(0))) < 1e-6,
        s"ln(${r.getLong(0)})")
    }
    // two-level aggregate: both groupBys partial+final, no extra joins
    val p = plan(df)
    assert("HashAggregate".r.findAllIn(p).size >= 4, p)
    assert(!p.contains("Join"), p)
  }

  test("approx percentiles track the exact form at accuracy 10000") {
    def m(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val exact = m(SparkEntry.queries("q_percentiles")(spark, sf)
      .select("l_returnflag", "p50", "p90"))
    val approx = m(SparkEntry.queries("q_approx_quantiles")(spark, sf))
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, (p50, p90)) =>
      val (a50, a90) = approx(k)
      assert(math.abs(a50 - p50) / p50 < 0.01, s"$k p50: $a50 vs $p50")
      assert(math.abs(a90 - p90) / p90 < 0.01, s"$k p90: $a90 vs $p90")
    }
  }

  test("q_profile_hll tracks q_profile's exact n_distinct per column") {
    val exact = SparkEntry.queries("q_profile")(spark, sf)
      .select("col_name", "n_distinct").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = SparkEntry.queries("q_profile_hll")(spark, sf)
      .select("col_name", "approx_distinct").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (c, n) =>
      assert(math.abs(approx(c) - n) / math.max(n, 1L) < 0.05,
        s"$c: hll ${approx(c)} vs exact $n")
    }
  }

  test("HllAggregator (mergeable form) matches the column path " +
    "BIT-FOR-BIT and is repartition-stable") {
    import graft.operators.Hll
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val colPath = SparkEntry.queries("q_hll_distinct")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    val hllU = udaf(Hll.HllAggregator(12))
    def viaAgg(parts: Int) = li.repartition(parts)
      .select(col("l_returnflag"),
        col("l_partkey").cast("string").as("k"))
      .groupBy("l_returnflag").agg(hllU(col("k")).as("est"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val a1 = viaAgg(1)
    assert(a1 == colPath,
      s"aggregator and column estimates must be IDENTICAL doubles: " +
        s"$a1 vs $colPath")
    assert(viaAgg(7) == a1, "merge must be partitioning-independent")
    // NULL keys are ignored by every face, like count(DISTINCT):
    // nulling out half the keys must give the same estimates as
    // filtering those rows, on both paths
    val nulled = li.select(col("l_returnflag"),
      when(col("l_linenumber") === 1, col("l_partkey"))
        .cast("string").as("k"))
    def m(df: org.apache.spark.sql.DataFrame, est: String) = df.collect()
      .map(r => r.getString(0) -> r.getDouble(r.fieldIndex(est))).toMap
    val colNulled = m(Hll.approxDistinct(nulled, Seq("l_returnflag"),
      col("k")), "approx_distinct")
    val colFiltered = m(Hll.approxDistinct(nulled.filter(col("k").isNotNull),
      Seq("l_returnflag"), col("k")), "approx_distinct")
    val aggNulled = m(nulled.groupBy("l_returnflag")
      .agg(hllU(col("k")).as("est")), "est")
    assert(colNulled == colFiltered, "nulls must not feed registers")
    assert(aggNulled == colNulled, "aggregator must skip nulls identically")
  }

  test("count-min sketch: never underestimates, CMS error bound holds, " +
    "sketch broadcasts into the probe join") {
    import graft.operators.Cms
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val sketch = Cms.build(li, col("l_partkey"))
    // the sketch is bounded by d*w cells regardless of input size
    assert(sketch.cells.count() <= 4L * 8192L)
    val truth = li.groupBy(col("l_partkey").as("pk")).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val probes = spark.createDataFrame(
      (truth.keys.toSeq.sorted ++ Seq(-1L, -2L)) // absent keys too
        .map(Tuple1(_))).toDF("pk")
    val est = SparkEntry.queries("q_cms_counts")(spark, sf)
    val estAll = Cms.pointEstimates(sketch, probes, "pk")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val n = truth.values.sum
    estAll.foreach { case (pk, e) =>
      val t = truth.getOrElse(pk, 0L)
      assert(e >= t, s"CMS underestimated key $pk: $e < $t")
      // standard bound: overshoot beyond 2n/w for all 4 rows at once
      // has probability 2^-4 per key — at these sizes it must not
      // happen across the whole probe set
      assert(e - t <= 2 * n / 8192 + 1, s"key $pk overshoot ${e - t}")
    }
    // probing is a broadcast join on the <=32k-cell sketch
    val p = plan(est)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("approx_count_distinct stays within 5% of exact (HLL default rsd)") {
    val exact = SparkEntry.queries("q_count_distinct")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = SparkEntry.queries("q_approx_distinct")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, n) =>
      val a = approx(k)
      assert(math.abs(a - n).toDouble / n < 0.05, s"$k: approx $a vs exact $n")
    }
  }
}
