package graft

import graft.sources.{Cache, Sources}
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Operator semantics, mirroring the reference's own fixtures
 * (slice_test.go, cogroup_test.go, reduce_test.go — see FIXTURES.md A1).
 * Results compared set-wise (the reference promises no ordering,
 * slice_test.go:41-63).
 */
class SliceSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private def rows(s: Slice): Set[Seq[Any]] =
    s.df.collect().toSet.map((r: Row) => r.toSeq)

  test("const splits rows across shards and preserves content") {
    import spark.implicits._
    for (nshard <- Seq(1, 2, 3, 7)) {
      val s = Sources.const(spark, nshard, Seq(("a", 1), ("b", 2), ("c", 3), ("d", 4), ("e", 5)))
      assert(s.df.rdd.getNumPartitions == nshard)
      assert(rows(s) == Set(Seq("a", 1), Seq("b", 2), Seq("c", 3), Seq("d", 4), Seq("e", 5)))
    }
  }

  test("readerFunc: one generator call per shard, distributed") {
    import spark.implicits._
    val s = Sources.readerFunc(spark, 3)(shard => Iterator.tabulate(4)(i => (shard, i)))
    assert(s.count() == 12)
    assert(rows(s) == (for (sh <- 0 until 3; i <- 0 until 4) yield Seq(sh, i)).toSet)
  }

  test("map / filter / flatMap typed variants") {
    import spark.implicits._
    val s = Sources.const(spark, 2, Seq(("x", 1), ("y", 2), ("z", 3)))
    val m = s.map[(String, Int), (String, Int)] { case (k, v) => (k, v * 10) }
    assert(rows(m) == Set(Seq("x", 10), Seq("y", 20), Seq("z", 30)))
    val f = s.filterF[(String, Int)](_._2 % 2 == 1)
    assert(rows(f) == Set(Seq("x", 1), Seq("z", 3)))
    val fm = s.flatMap[(String, Int), (String, Int)] { case (k, v) => Seq.fill(v)((k, v)) }
    assert(fm.count() == 6)
  }

  test("reduce (declarative) == reduceF (typed +) — wordcount shape") {
    import spark.implicits._
    val words = Seq("a", "b", "a", "c", "b", "a").map((_, 1))
    val s = Sources.const(spark, 3, words)
    val declarative = s.reduce(sum(col(s.valueNames.head)).cast("int").as("n"))
    val typed = s.reduceF[String, Int](_ + _)
    assert(rows(declarative) == Set(Seq("a", 3), Seq("b", 2), Seq("c", 1)))
    assert(rows(typed) == Set(Seq("a", 3), Seq("b", 2), Seq("c", 1)))
  }

  test("fold with non-mergeable accumulator (zero-value init, slice.go:858-860)") {
    import spark.implicits._
    val s = Sources.const(spark, 2, Seq(("k1", 2), ("k1", 3), ("k2", 4)))
    val folded = s.fold[String, Int, Int](0)((acc, v) => acc + v * v)
    assert(rows(folded) == Set(Seq("k1", 13), Seq("k2", 16)))
  }

  test("struct keys flow through fold/reduce/reduceF/cogroup (frame.RegisterOps parity, ops.go:60-84)") {
    import spark.implicits._
    // the reference makes users register hash/compare per custom key
    // type (frame/ops.go:60-84); here a case-class key needs nothing:
    // the product Encoder gives Catalyst a struct with field-wise
    // grouping equality, and every keyed op takes it as-is
    val s = Sources.const(spark, 2,
      Seq((GeoKey("eu", 1), 2), (GeoKey("eu", 1), 3), (GeoKey("us", 2), 4)))
    val folded = s.fold[GeoKey, Int, Int](0)((acc, v) => acc + v * v)
    assert(folded.df.as[(GeoKey, Int)].collect().toSet ==
      Set((GeoKey("eu", 1), 13), (GeoKey("us", 2), 16)))
    val typed = s.reduceF[GeoKey, Int](_ + _)
    assert(typed.df.as[(GeoKey, Int)].collect().toSet ==
      Set((GeoKey("eu", 1), 5), (GeoKey("us", 2), 4)))
    // declarative reduce groups on the struct column directly
    val dec = s.reduce(sum(col(s.valueNames.head)).cast("int").as("n"))
    assert(dec.df.as[(GeoKey, Int)].collect().toSet ==
      typed.df.as[(GeoKey, Int)].collect().toSet)
    // cogroup: struct keys align across inputs, absent keys → empty
    val t = Sources.const(spark, 2,
      Seq((GeoKey("eu", 1), "x"), (GeoKey("ap", 9), "y")))
    val cg = s.cogroup(t).df.as[(GeoKey, Seq[Int], Seq[String])]
      .collect().map { case (k, a, b) => (k, a.sorted, b.sorted) }.toSet
    assert(cg == Set(
      (GeoKey("eu", 1), Seq(2, 3), Seq("x")),
      (GeoKey("us", 2), Seq(4), Seq.empty[String]),
      (GeoKey("ap", 9), Seq.empty[Int], Seq("y"))))
  }

  test("opaque keys with a user-registered Encoder (the RegisterOps analog proper)") {
    // a key class with NO product structure: reflection can't encode
    // it, so the user registers an Encoder — the direct analog of
    // frame.RegisterOps registering hash/compare. Kryo keys group by
    // their serialized bytes; like the reference's user-supplied hash,
    // correctness is the registrant's contract (deterministic
    // serialization — true for plain field classes, NOT for hash maps).
    implicit val keyEnc: org.apache.spark.sql.Encoder[OpaqueKey] =
      org.apache.spark.sql.Encoders.kryo[OpaqueKey]
    implicit val intEnc: org.apache.spark.sql.Encoder[Int] =
      org.apache.spark.sql.Encoders.scalaInt
    implicit val kvEnc: org.apache.spark.sql.Encoder[(OpaqueKey, Int)] =
      org.apache.spark.sql.Encoders.tuple(keyEnc, intEnc)
    val data = Seq((new OpaqueKey(7, "alpha"), 2), (new OpaqueKey(7, "alpha"), 3),
      (new OpaqueKey(9, "beta"), 4))
    val s = Sources.const(spark, 2, data)
    val folded = s.fold[OpaqueKey, Int, Int](0)((acc, v) => acc + v)
    val got = folded.df.as[(OpaqueKey, Int)].collect()
      .map { case (k, n) => (k.id, k.tag, n) }.toSet
    assert(got == Set((7L, "alpha", 5), (9L, "beta", 4)))
    val typed = s.reduceF[OpaqueKey, Int](_ + _)
    assert(typed.df.as[(OpaqueKey, Int)].collect()
      .map { case (k, n) => (k.id, k.tag, n) }.toSet == got)
  }

  test("cogroup 2-ary full-outer with empty groups (cogroup_test.go:146-166)") {
    import spark.implicits._
    val left = Sources.const(spark, 2, Seq((0, "zero"), (0, "cero"), (1, "one"), (2, "two")))
    val right = Sources.const(spark, 3, Seq((1, 1), (2, 4), (3, 9)))
    val cg = left.cogroup(right)
    val byKey = cg.df.collect().map(r => r.getInt(0) ->
      (r.getSeq[String](1).sorted, r.getSeq[Int](2).sorted)).toMap
    assert(byKey(0) == (Seq("cero", "zero"), Seq()))
    assert(byKey(1) == (Seq("one"), Seq(1)))
    assert(byKey(2) == (Seq("two"), Seq(4)))
    assert(byKey(3) == (Seq(), Seq(9)))
  }

  test("join kinds derived from the key prefix") {
    import spark.implicits._
    val l = Sources.const(spark, 2, Seq((1, "a"), (2, "b"), (3, "c")))
    val r = Sources.const(spark, 2, Seq((2, 20.0), (3, 30.0), (4, 40.0)))
    assert(l.join(r, "inner").count() == 2)
    assert(l.join(r, "left_semi").count() == 2)
    assert(l.join(r, "left_anti").count() == 1)
    assert(l.joinBroadcast(r, "full").count() == 4)
  }

  test("reshuffle colocates equal keys; reshard pins shard count") {
    import spark.implicits._
    val s = Sources.const(spark, 4, (1 to 100).map(i => (i % 5, i)))
    val shuffled = s.reshuffle()
    // every key lives in exactly one partition
    val keyParts = shuffled.df.rdd.mapPartitionsWithIndex { (p, it) =>
      it.map(r => (r.getInt(0), p))
    }.distinct().collect().groupBy(_._1)
    assert(keyParts.values.forall(_.length == 1))
    assert(s.reshard(7).df.rdd.getNumPartitions == 7)
    assert(rows(s.reshard(7)) == rows(s))
  }

  test("repartitionF: user function assigns the exact shard (reshuffle.go:44-76)") {
    import spark.implicits._
    val s = Sources.const(spark, 3, (1 to 20).map(i => (i, s"v$i")))
    val p = s.repartitionF(4)(r => r.getInt(0))
    val placed = p.df.rdd.mapPartitionsWithIndex { (part, it) =>
      it.map(r => (r.getInt(0), part))
    }.collect()
    assert(placed.forall { case (k, part) => part == k % 4 })
    assert(rows(p) == rows(s))
  }

  test("sortWithinShards orders keys per shard without a shuffle; sample is deterministic") {
    import spark.implicits._
    val s = Sources.const(spark, 3, (1 to 300).map(i => (i * 37 % 100, i)))
      .sortWithinShards()
    // exactly the const()'s own repartition — the sort adds no Exchange
    assert("Exchange".r.findAllIn(
      s.df.queryExecution.executedPlan.toString).size == 1)
    val ordered = s.df.rdd.mapPartitions { it =>
      val keys = it.map(_.getInt(0)).toSeq
      Iterator(keys == keys.sorted)
    }.collect()
    assert(ordered.forall(identity))
    val s2 = Sources.const(spark, 3, (1 to 1000).toSeq)
    val a = s2.sample(0.2).df.collect().map(_.getInt(0)).toSet
    val b = s2.sample(0.2).df.collect().map(_.getInt(0)).toSet
    assert(a == b && a.nonEmpty && a.size < 500)
  }

  test("rangePartition: shards hold contiguous, ordered key ranges") {
    import spark.implicits._
    val s = Sources.const(spark, 4, (1 to 1000).map(i => (i % 97, i)))
      .rangePartition(5)
    val ranges = s.df.rdd.mapPartitionsWithIndex { (p, it) =>
      val keys = it.map(_.getInt(0)).toSeq
      if (keys.isEmpty) Iterator.empty
      else Iterator((p, keys.min, keys.max))
    }.collect().sortBy(_._1)
    assert(ranges.nonEmpty)
    // ranges are disjoint and ordered across shards
    ranges.sliding(2).foreach {
      case Array((_, _, max1), (_, min2, _)) => assert(max1 <= min2)
      case _ =>
    }
    assert(s.count() == 1000)
  }

  test("head is a PER-SHARD limit, not global (slice.go:957-994)") {
    import spark.implicits._
    val s = Sources.const(spark, 4, (1 to 100).map(i => (i, i)))
    val h = s.head(2)
    val perPart = h.df.rdd.mapPartitions(it => Iterator.single(it.size)).collect()
    assert(perPart.forall(_ <= 2))
    assert(h.count() <= 8)
  }

  test("scan consumes every row exactly once (slice.go:996-1032)") {
    import spark.implicits._
    val acc = spark.sparkContext.longAccumulator("seen")
    val s = Sources.const(spark, 3, (1 to 50).map(i => (i, i)))
    s.scan((_, it) => it.foreach(_ => acc.add(1)))
    assert(acc.value == 50)
  }

  test("writerFunc passes rows through while side-effecting") {
    import spark.implicits._
    val acc = spark.sparkContext.longAccumulator("written")
    val s = Sources.const(spark, 2, (1 to 10).map(i => (i, i)))
    val w = s.writerFunc { (_, it) => it.map { r => acc.add(1); r } }
    assert(w.count() == 10)
    assert(acc.value >= 10) // may re-run on retry, same caveat as reference
  }

  test("prefixed widens the key for multi-column reduce (slice.go:1034-1056)") {
    import spark.implicits._
    val s = Sources.const(spark, 2,
      Seq(("a", "x", 1), ("a", "x", 2), ("a", "y", 3), ("b", "x", 4))).prefixed(2)
    val r = s.reduce(sum(col("_3")).cast("int").as("n"))
    assert(rows(r) == Set(Seq("a", "x", 3), Seq("a", "y", 3), Seq("b", "x", 4)))
  }

  test("cache roundtrip + readCache; cachePartial reuses existing shards") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graftcache").toString
    val s = Sources.const(spark, 3, (1 to 30).map(i => (i, s"v$i")))
    val c = Cache.cache(s, s"$dir/full")
    assert(rows(c) == rows(s))
    assert(rows(Cache.readCache(spark, s"$dir/full")) == rows(s))

    val p1 = Cache.cachePartial(s, s"$dir/partial")
    assert(rows(p1) == rows(s))
    // second run: all shards cached → replayed from files
    val p2 = Cache.cachePartial(s, s"$dir/partial")
    assert(rows(p2) == rows(s))
    val nFiles = new java.io.File(s"$dir/partial").listFiles().count(_.getName.endsWith(".bin"))
    assert(nFiles == 3)
  }

  test("results stable across shard counts (dual-executor matrix analog)") {
    import spark.implicits._
    val data = (1 to 200).map(i => (i % 7, i))
    val expect = data.groupBy(_._1).map { case (k, vs) => Seq[Any](k, vs.map(_._2).sum) }.toSet
    for (n <- Seq(1, 4)) {
      val got = Sources.const(spark, n, data).reduce(sum(col("_2")).cast("int").as("s"))
      assert(rows(got) == expect)
    }
  }

  test("readTar streams a multi-entry archive (128 MiB, no whole-archive buffer)") {
    val dir = java.nio.file.Files.createTempDirectory("grafttar")
    val tarPath = dir.resolve("big.tar")
    val out = new org.apache.commons.compress.archivers.tar.TarArchiveOutputStream(
      new java.io.BufferedOutputStream(java.nio.file.Files.newOutputStream(tarPath)))
    val entryBytes = 2 * 1024 * 1024
    val payload = Array.tabulate[Byte](entryBytes)(i => (i % 251).toByte)
    for (i <- 0 until 64) {
      val e = new org.apache.commons.compress.archivers.tar.TarArchiveEntry(f"doc$i%03d.bin")
      e.setSize(entryBytes.toLong)
      out.putArchiveEntry(e); out.write(payload); out.closeArchiveEntry()
    }
    out.close()
    // the executor holds ONE entry at a time; the archive itself is
    // never materialized (streamed off the Hadoop input stream), so
    // this works identically for archives far beyond task heap
    val s = Sources.readTar(spark, tarPath.toString)
    val agg = s.df.agg(count(lit(1)), sum(length(col("body")))).collect()(0)
    assert(agg.getLong(0) == 64)
    assert(agg.getLong(1) == 64L * entryBytes)
    val first = s.df.filter(col("name") === "doc000.bin").select("size", "body").collect()(0)
    assert(first.getLong(0) == entryBytes.toLong)
    assert(java.util.Arrays.equals(first.getAs[Array[Byte]](1), payload))
  }

  test("writeTar round-trips shards byte-exactly; manifest matches disk; temps cleaned") {
    import spark.implicits._
    val rows = (0 until 200).map(i => (f"e$i%04d.bin",
      Array.tabulate[Byte](i * 7 % 300 + 1)(j => ((i + j) % 113).toByte)))
    val df = spark.createDataset(rows).toDF("name", "body")
      .repartition(5, col("name"))
    val dir = java.nio.file.Files.createTempDirectory("grafttarw").toString
    val manifest = Sources.writeTar(df, dir, "name", "body").collect()
    // one manifest row per non-empty partition, files exist on disk
    assert(manifest.nonEmpty && manifest.length <= 5)
    assert(manifest.map(_.getLong(2)).sum == 200L)
    assert(manifest.map(_.getLong(3)).sum == rows.map(_._2.length.toLong).sum)
    manifest.foreach { m =>
      assert(new java.io.File(m.getString(1).stripPrefix("file:")).exists(), m)
    }
    // no stranded attempt temps
    val tmps = Option(new java.io.File(dir, "_tmp").listFiles()).getOrElse(Array.empty)
    assert(tmps.isEmpty)
    // round-trip: exact (name -> bytes) set equality through readTar
    val back = Sources.readTar(spark, s"$dir/shard-*.tar").df
      .select("name", "body").collect()
      .map(r => r.getString(0) -> r.getAs[Array[Byte]](1).toSeq).toMap
    assert(back.size == 200)
    rows.foreach { case (n, b) => assert(back(n) == b.toSeq, n) }
  }

  test("writeTar treats a NULL body as a zero-length entry, not a task NPE") {
    import spark.implicits._
    val df = Seq(("a.bin", Option(Array[Byte](1, 2, 3))),
      ("b.bin", Option.empty[Array[Byte]]))
      .toDF("name", "body").repartition(1)
    val dir = java.nio.file.Files.createTempDirectory("grafttarnull").toString
    val manifest = Sources.writeTar(df, dir, "name", "body").collect()
    assert(manifest.map(_.getLong(2)).sum == 2L)
    assert(manifest.map(_.getLong(3)).sum == 3L)
    val back = Sources.readTar(spark, s"$dir/shard-*.tar").df
      .select("name", "size").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(back == Map("a.bin" -> 3L, "b.bin" -> 0L))
  }

  test("writerFunc onDone: sink sees success per shard, and the error on failure") {
    import spark.implicits._
    WriterProbe.reset()
    val s = Sources.const(spark, 2, Seq(1, 2, 3, 4))
    s.writerFunc((_, it) => it,
      (shard, err) => { if (err.isEmpty) { WriterProbe.ok.add(shard); () } else WriterProbe.fail(shard) }
    ).count()
    assert(WriterProbe.ok.size() == 2 && WriterProbe.failures.get() == 0)

    WriterProbe.reset()
    val boom = s.writerFunc(
      (shard, it) => it.map(r => if (shard == 0) throw new RuntimeException("sink blew up") else r),
      (shard, err) => { if (err.isEmpty) { WriterProbe.ok.add(shard); () } else WriterProbe.fail(shard) })
    intercept[org.apache.spark.SparkException](boom.count())
    // the failing shard's sink saw Some(error) — the reference's final
    // err call (slice.go:434-440); the healthy shard may or may not
    // finish depending on cancellation timing.
    assert(WriterProbe.failures.get() >= 1)
    assert(!WriterProbe.ok.contains(0))
  }

  test("Cache.discard invalidates: next cache() recomputes (Session.Discard analog)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graftdiscard").toString + "/c"
    def src = Sources.readerFunc(spark, 2) { sh =>
      CacheProbe.computes.incrementAndGet(); Iterator.tabulate(3)(i => (sh, i))
    }
    Cache.cache(src, dir).count()
    val afterFirst = CacheProbe.computes.get()
    assert(afterFirst >= 2) // one generator call per shard
    Cache.cache(src, dir).count()
    assert(CacheProbe.computes.get() == afterFirst) // cache hit: no recompute
    Cache.discard(dir)
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(dir)))
    assert(rows(Cache.cache(src, dir)) ==
      (for (sh <- 0 until 2; i <- 0 until 3) yield Seq[Any](sh, i)).toSet)
    assert(CacheProbe.computes.get() > afterFirst) // discarded → recomputed
  }

  test("procs pragma: profile requests n task cpus; degrades to passthrough locally") {
    import spark.implicits._
    // the profile procs() attaches is the per-stage spark.task.cpus form
    val rp = Slice.procsProfile(2)
    assert(rp.taskResources.get("cpus").exists(_.amount == 2.0), rp.taskResources)
    // local mode can't honor task profiles → pragma is a no-op hint,
    // results unchanged (on Standalone/YARN/K8s the profile attaches)
    val s = Sources.const(spark, 2, Seq(1, 2, 3)).procs(2)
    assert(s.count() == 3)
    assert(Sources.const(spark, 2, Seq(1, 2)).exclusive().count() == 2)
  }

  test("scaleConf sizes shuffle breadth to cluster cores with AQE enabled") {
    val c = GraftSession.scaleConf(totalCores = 8000)
    assert(c("spark.sql.shuffle.partitions").toInt == 16000)
    assert(c("spark.sql.adaptive.enabled") == "true")
    assert(c("spark.sql.adaptive.skewJoin.enabled") == "true")
    assert(c.contains("spark.sql.files.maxPartitionBytes"))
    assert(c.contains("spark.sql.adaptive.advisoryPartitionSizeInBytes"))
  }

  test("counter: closure increments merge across shards (metrics.Counter analog)") {
    import spark.implicits._
    val s = Sources.const(spark, 4, (1 to 100).toList)
    val dropped = s.counter("dropped")
    val kept = s.filterF[Int] { v =>
      val keep = v % 3 == 0
      if (!keep) dropped.incr()
      keep
    }
    assert(kept.count() == 33)
    assert(dropped.value == 67)
    // reset + reuse, the reference's per-run scope semantics
    dropped.reset()
    assert(dropped.value == 0)
    assert(kept.count() == 33) // recount re-applies closure increments
    assert(dropped.value == 67)
  }

  test("scanRows streams partition-at-a-time, never materializing the result") {
    import spark.implicits._
    val sc = spark.sparkContext
    val touched = sc.longAccumulator("rowsTouched")
    // 8 shards x 1000 rows; the map bumps the accumulator per row, so
    // the accumulator exposes how much of the dataset actually ran
    val s = Sources.readerFunc(spark, 8)(sh =>
      Iterator.tabulate(1000)(i => (sh, i)))
      .map[(Int, Int), (Int, Int)] { x => touched.add(1L); x }
    val it = s.scanRows()
    val first = it.take(10).toVector
    assert(first.size == 10)
    // partition-at-a-time: consuming 10 rows must not have executed
    // the whole 8000-row dataset (at most a couple of partitions run,
    // including any prefetch)
    assert(touched.value < 8000,
      s"scanRows materialized everything: touched=${touched.value}")
    // full drain sees every remaining row exactly once
    assert(10 + it.size == 8000)
  }

  test("bench reports a failing query as -1 + errors entry, excluded from total") {
    val line = Bench.benchLine(spark, "/root/testdata/sf0.001", Seq(
      "good" -> ((s: SparkSession, d: String) => Tables.load(s, d, "region")),
      "bad" -> ((s: SparkSession, _: String) =>
        s.sql("SELECT * FROM graft_nonexistent_table"))))
    assert(line.contains("\"bad\":-1.0"), line)
    assert(line.contains("\"errors\":{\"bad\":"), line)
    val total = "\"value\":([-0-9.Ee]+)".r.findFirstMatchIn(line).get.group(1).toDouble
    assert(total >= 0, s"failing query polluted the total: $line")
  }
}

/** Cross-task probes for writerFunc/cache tests (local mode shares one
  * JVM, so executor-side closures and the driver see the same statics). */
object WriterProbe {
  val ok: java.util.Set[Int] =
    java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()
  val failures = new java.util.concurrent.atomic.AtomicInteger(0)
  def fail(shard: Int): Unit = { failures.incrementAndGet(); () }
  def reset(): Unit = { ok.clear(); failures.set(0) }
}

object CacheProbe {
  val computes = new java.util.concurrent.atomic.AtomicInteger(0)
}

/** Struct key for the frame.RegisterOps-parity tests (top-level so the
  * product Encoder needs no outer instance). */
case class GeoKey(region: String, bucket: Int)

/** A deliberately non-product key: private constructor fields, no
  * companion — only a registered Encoder (kryo) can carry it. */
class OpaqueKey(val id: Long, val tag: String) extends Serializable {
  override def equals(o: Any): Boolean = o match {
    case k: OpaqueKey => k.id == id && k.tag == tag
    case _ => false
  }
  override def hashCode: Int = (id, tag).hashCode
}
