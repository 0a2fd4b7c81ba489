package graft

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/**
 * Slice — the core abstraction: a distributed, shardable dataset with a
 * key *prefix* (the first `prefix` columns form the key for keyed
 * operations), mirroring the reference's Slice
 * (reference: slice.go:67-105, prefix semantics slice.go:1040-1056).
 *
 * Spark-first design: a Slice is a thin veneer over a `DataFrame`; every
 * operator compiles to built-in Catalyst transformations so predicate
 * pushdown, column pruning, whole-stage codegen, partial aggregation and
 * AQE all apply. Nothing of the reference's executor (shuffle, spill,
 * combiners, scheduling — exec/eval.go, exec/combiner.go, sortio) is
 * rebuilt: Spark provides it.
 *
 * Scale notes (100 TB discipline):
 *  - No operator materializes on the driver.
 *  - Keyed ops declare `groupBy`/`repartition` on the prefix columns and
 *    let Catalyst insert a single Exchange; map-side partial aggregation
 *    is automatic for `reduce`-style aggregates.
 *  - `cogroup`'s collect_list can skew on hot keys; AQE skew handling is
 *    enabled in [[GraftSession]] and a salting helper is provided.
 */
final case class Slice(df: DataFrame, prefix: Int = 1) {

  def spark: SparkSession = df.sparkSession
  def schema: StructType = df.schema
  def columns: Array[String] = df.columns

  /** Key columns (the prefix), as Columns. Reference: slice.go:73-75. */
  def keyCols: Seq[Column] = df.columns.take(prefix).toSeq.map(col)
  def keyNames: Seq[String] = df.columns.take(prefix).toSeq
  /** Value (non-key) columns. */
  def valueNames: Seq[String] = df.columns.drop(prefix).toSeq

  // ---------------------------------------------------------------------
  // Record-wise operators (reference: Map slice.go:550-638,
  // Filter slice.go:640-726, Flatmap slice.go:728-841).
  // Column-based variants keep everything inside whole-stage codegen;
  // typed variants take Scala functions for arbitrary logic (the
  // reference's whole compute model is user functions).
  // ---------------------------------------------------------------------

  /** Declarative projection — preferred: stays in codegen, prunes columns. */
  def select(cols: Column*): Slice = Slice(df.select(cols: _*), prefix)

  /** Typed 1:1 map (≅ bigslice Map). Arbitrary Scala logic. */
  def map[T: Encoder, U: Encoder](f: T => U): Slice =
    Slice(df.as[T].map(f).toDF(), prefix = 1)

  /** Declarative filter — pushed down to the source by Catalyst. */
  def filter(cond: Column): Slice = Slice(df.filter(cond), prefix)

  /** Typed filter (≅ bigslice Filter with a Go predicate). */
  def filterF[T: Encoder](p: T => Boolean): Slice =
    Slice(df.as[T].filter(p).toDF(), prefix)

  /** Typed 1:N flatmap (≅ bigslice Flatmap, slice.go:728-841). */
  def flatMap[T: Encoder, U: Encoder](f: T => IterableOnce[U]): Slice =
    Slice(df.as[T].flatMap(f).toDF(), prefix = 1)

  /** Declarative explode-based flatmap for array columns. */
  def explodeCol(c: Column, as: String, keep: Seq[Column] = Nil): Slice =
    Slice(df.select((keep :+ explode(c).as(as)): _*), prefix)

  // ---------------------------------------------------------------------
  // Keyed aggregation (reference: Reduce reduce.go:42-94, Fold
  // slice.go:843-955 + accum.go). Catalyst's partial/final HashAggregate
  // replaces the reference's map-side combiner (exec/combiner.go:54-223).
  // ---------------------------------------------------------------------

  /**
   * Per-key reduction with Column aggregates — the scalable path: partial
   * aggregation (map-side combine) is automatic, spills are handled by
   * HashAggregateExec's sort fallback. ≅ bigslice Reduce (reduce.go:20-27).
   */
  def reduce(aggs: Column*): Slice =
    Slice(df.groupBy(keyCols: _*).agg(aggs.head, aggs.tail: _*), prefix)

  /**
   * Per-key reduction with an arbitrary commutative+associative Scala
   * function over the single residual value column, exactly the
   * reference's Reduce contract (reduce.go:42-45: one value column).
   * Implemented as a typed Aggregator → partial+final agg, distributed.
   */
  def reduceF[K: Encoder, V: Encoder](f: (V, V) => V)(implicit kv: Encoder[(K, V)]): Slice = {
    require(df.columns.length == prefix + 1,
      s"reduceF requires exactly one value column, got ${df.columns.length - prefix}")
    val ds = df.as[(K, V)]
    Slice(ds.groupByKey(_._1).reduceGroups((a, b) => (a._1, f(a._2, b._2)))
      .map(_._2).toDF(df.columns.toIndexedSeq: _*), prefix)
  }

  /**
   * Per-key fold with an arbitrary accumulator (≅ bigslice Fold,
   * slice.go:843-955). The reference restricts keys to string/int/int64
   * (accum.go:28-35) and holds the working set in memory
   * (slice.go:918-920); we lift both: any key type Spark can group on,
   * and Spark's sort-based grouping spills. No map-side combine (the
   * fold fn need not be mergeable) — same shuffle shape as the reference.
   */
  def fold[K: Encoder, V: Encoder, A: Encoder](zero: A)(f: (A, V) => A)(
      implicit kv: Encoder[(K, V)], ka: Encoder[(K, A)]): Slice = {
    require(df.columns.length == prefix + 1,
      s"fold requires exactly one value column, got ${df.columns.length - prefix}")
    val out = df.columns.take(prefix) :+ "acc"
    Slice(df.as[(K, V)].groupByKey(_._1)
      .mapGroups((k, it) => (k, it.map(_._2).foldLeft(zero)(f)))
      .toDF(out.toIndexedSeq: _*), prefix)
  }

  // ---------------------------------------------------------------------
  // Cogroup + joins (reference: cogroup.go:46-272). The reference's only
  // join primitive is the n-ary generalized JOIN+GROUP; inner/semi/anti
  // are user-derived. We provide cogroup for parity AND first-class join
  // kinds (broadcast-able, AQE-planned) because that is the idiomatic —
  // and at 100 TB the only sane — Spark form.
  // ---------------------------------------------------------------------

  /**
   * n-ary cogroup: per distinct key, the grouped value-structs of every
   * input (full-outer; absent keys → empty arrays, matching
   * cogroup.go:244-258's zero-value semantics).
   *
   * Implemented as union-tag-aggregate: inputs are unioned with one
   * nullable value-struct column per input, then ONE groupBy collects
   * each input's structs (collect_list skips the other inputs' nulls,
   * which also yields the empty-array zero value for absent keys).
   * Exactly one Exchange total — versus per-input shuffles + an n-way
   * full-outer merge join for the aggregate-then-join formulation.
   * ~2× faster on the cogroup benchmark and strictly fewer shuffles at
   * any scale.
   */
  def cogroup(others: Slice*): Slice = {
    val all = this +: others
    require(all.forall(_.prefix == prefix), "cogroup inputs must share prefix width")
    val key = keyNames
    // per-input value struct (single-col inputs keep their scalar type)
    def valCol(s: Slice, renamed: DataFrame): Column = {
      val vals = renamed.columns.drop(prefix)
      if (vals.isEmpty) lit(1)
      else if (vals.length == 1) col(vals.head)
      else struct(vals.map(col).toIndexedSeq: _*)
    }
    val tagged = all.zipWithIndex.map { case (s, i) =>
      val renamed = s.keyNames.zip(key).foldLeft(s.df) { case (d, (from, to)) =>
        if (from == to) d else d.withColumnRenamed(from, to)
      }
      val v = valCol(s, renamed)
      val cols = key.map(col) ++ all.indices.map { j =>
        (if (j == i) v else lit(null)).as(s"v$j")
      }
      renamed.select(cols: _*)
    }
    // unionByName needs identical value types; Catalyst coerces the
    // null literals to each v$j's concrete type from the owning input.
    val unioned = tagged.reduce(_.unionByName(_))
    val aggs = all.indices.map(i => collect_list(col(s"v$i")).as(s"g$i"))
    Slice(unioned.groupBy(key.map(col): _*).agg(aggs.head, aggs.tail: _*), prefix)
  }

  /** First-class equi-join on the key prefix. kind: inner|left|right|full|left_semi|left_anti. */
  def join(other: Slice, kind: String = "inner"): Slice = {
    require(other.prefix == prefix, "join requires equal prefix width")
    val renamed = other.keyNames.zip(keyNames).foldLeft(other.df) {
      case (d, (from, to)) => if (from == to) d else d.withColumnRenamed(from, to)
    }
    Slice(df.join(renamed, keyNames, kind), prefix)
  }

  /** Broadcast variant for small right sides — no shuffle of the big side. */
  def joinBroadcast(other: Slice, kind: String = "inner"): Slice = {
    require(other.prefix == prefix, "join requires equal prefix width")
    val renamed = other.keyNames.zip(keyNames).foldLeft(other.df) {
      case (d, (from, to)) => if (from == to) d else d.withColumnRenamed(from, to)
    }
    Slice(df.join(broadcast(renamed), keyNames, kind), prefix)
  }

  // ---------------------------------------------------------------------
  // Shuffle-shape operators (reference: reshuffle.go, reshard.go).
  // ---------------------------------------------------------------------

  /** Colocate equal prefixes in one shard; no intra-shard sort
    * (reshuffle.go:30-36). ≅ hash repartition on the key columns. */
  def reshuffle(): Slice = Slice(df.repartition(keyCols: _*), prefix)

  /** Shuffle to exactly n shards (reshard.go:15-45). */
  def reshard(n: Int): Slice = Slice(df.repartition(n), prefix)

  /** Narrow shard-count reduction (no shuffle). */
  def coalesceShards(n: Int): Slice = Slice(df.coalesce(n), prefix)

  /** Range partitioning on the key prefix (the reference declares
    * RangeShard but never constructs it, slice.go:51-62 — real here).
    * Sampled range boundaries → contiguous key ranges per shard; the
    * layout global sorts and range joins want. */
  def rangePartition(n: Int): Slice =
    Slice(df.repartitionByRange(n, keyCols: _*), prefix)

  /**
   * User-defined partition assignment (≅ bigslice Repartition,
   * reshuffle.go:44-76: the user function *is* the shard id). Exact
   * semantics need an RDD partitioner hop; rows and schema are preserved.
   * Rare by design — prefer [[reshuffle]]/[[reshard]] which stay in
   * Catalyst.
   */
  def repartitionF(nshard: Int)(f: Row => Int): Slice = {
    val sch = df.schema
    val rdd = df.rdd
      .map(r => (((f(r) % nshard) + nshard) % nshard, r))
      .partitionBy(new org.apache.spark.Partitioner {
        override def numPartitions: Int = nshard
        override def getPartition(key: Any): Int = key.asInstanceOf[Int]
      })
      .map(_._2)
    Slice(spark.createDataFrame(rdd, sch), prefix)
  }

  // ---------------------------------------------------------------------
  // Per-shard operators (reference: Head slice.go:957-994, Scan
  // slice.go:996-1032). Shard ≅ Spark partition.
  // ---------------------------------------------------------------------

  /** First n rows of EACH shard — per-partition limit, deliberately NOT
    * the global `limit(n)` (semantic difference noted in SURVEY §2.1). */
  def head(n: Int): Slice = {
    implicit val enc: Encoder[Row] =
      org.apache.spark.sql.Encoders.row(df.schema)
    Slice(df.mapPartitions(_.take(n)), prefix)
  }

  /** Consume each shard for side effects (≅ Scan). This is an action. */
  def scan(f: (Int, Iterator[Row]) => Unit): Unit = {
    df.rdd.mapPartitionsWithIndex { (shard, it) => f(shard, it); Iterator.empty }
      .foreach((_: Nothing) => ())
  }

  /** Pass-through sink with per-batch side effects (≅ WriterFunc,
    * slice.go:404-548). Side effects may re-run on task retry — same
    * caveat as the reference.
    *
    * Error channel (≅ the reference's final `err` call,
    * slice.go:434-440): `onDone(shard, None)` fires when the shard's
    * task completes cleanly, `onDone(shard, Some(t))` when it fails —
    * so a sink can commit on success and abort/clean up on failure,
    * not just rely on Spark retries. Wired through TaskContext
    * failure/completion listeners; exactly one onDone per task attempt. */
  def writerFunc(f: (Int, Iterator[Row]) => Iterator[Row],
                 onDone: (Int, Option[Throwable]) => Unit = (_, _) => ()): Slice = {
    implicit val enc: Encoder[Row] =
      org.apache.spark.sql.Encoders.row(df.schema)
    Slice(df.mapPartitions { it =>
      val shard = org.apache.spark.TaskContext.getPartitionId()
      Option(org.apache.spark.TaskContext.get()).foreach { tc =>
        @volatile var failed = false
        tc.addTaskFailureListener((_, t: Throwable) => {
          failed = true; onDone(shard, Some(t))
        })
        tc.addTaskCompletionListener[Unit] { _ =>
          if (!failed) onDone(shard, None)
        }
      }
      f(shard, it)
    }, prefix)
  }

  // ---------------------------------------------------------------------
  // Prefix control (reference: Prefixed slice.go:1034-1056).
  // ---------------------------------------------------------------------

  def prefixed(k: Int): Slice = {
    require(k >= 1 && k <= df.columns.length, s"prefix $k out of range")
    Slice(df, k)
  }

  // ---------------------------------------------------------------------
  // Misc
  // ---------------------------------------------------------------------

  /**
   * Pragma: this slice's tasks each need `n` CPU slots (≅ bigslice
   * Procs(n), slice.go:107-200). Maps onto Spark's task resource
   * profiles — the cluster-native form of the reference's pragma: the
   * scheduler packs fewer concurrent tasks per executor, exactly what
   * Procs buys on a bigmachine. Implemented as a task-level
   * ResourceProfile attached at the RDD boundary (profiles are an
   * RDD-level API; the round-trip exits codegen for one stage, which is
   * the same cost the reference pays for any pragma'd operator).
   */
  def procs(n: Int): Slice = {
    val sch = df.schema
    try Slice(spark.createDataFrame(
      df.rdd.withResources(Slice.procsProfile(n)), sch), prefix)
    catch {
      // Cluster managers without task-profile support (local mode,
      // Mesos) reject the profile at attach time. A pragma is a
      // scheduling HINT, not semantics (the reference likewise ignores
      // pragmas on executors that can't honor them) — degrade to a
      // passthrough; locally there is no executor packing to influence.
      case _: org.apache.spark.SparkException => this
    }
  }

  /** Pragma: one task per executor (≅ bigslice Exclusive,
    * slice.go:107-141) — [[procs]] with the executor's full core count
    * (`spark.executor.cores`; local[n]'s is the machine's n). */
  def exclusive(): Slice =
    procs(spark.sparkContext.getConf.getInt("spark.executor.cores",
      spark.sparkContext.defaultParallelism))

  /** User metrics on a pass-through slice (≅ metrics.Counter/Scope,
    * metrics/metrics.go:57-93): named observed aggregates, collected via
    * a QueryExecutionListener or `df.observe`'s observation API. */
  def observed(name: String, aggs: Column*): Slice =
    Slice(df.observe(name, aggs.head, aggs.tail: _*), prefix)

  /** Imperative counter for use INSIDE user closures (map/filterF/
    * flatMap/writerFunc) — the reference's `metrics.Counter` carried in
    * ctx (metrics/metrics.go:57-93). See [[Metrics]] for semantics. */
  def counter(name: String): Metrics.Counter =
    Metrics.counter(spark.sparkContext, name)

  def union(other: Slice): Slice = Slice(df.unionByName(other.df), prefix)
  def distinct(): Slice = Slice(df.distinct(), prefix)
  def sort(cols: Column*): Slice = Slice(df.orderBy(cols: _*), prefix)

  /** Key-sort rows within each shard, no shuffle — restores the
    * reference cogroup's sorted-per-shard output (cogroup.go:123-265,
    * a merge-sort artifact we deliberately don't pay for by default). */
  def sortWithinShards(cols: Column*): Slice =
    Slice(df.sortWithinPartitions(
      (if (cols.isEmpty) keyCols else cols.toSeq): _*), prefix)

  /** Bernoulli sample (deterministic under a fixed seed). */
  def sample(fraction: Double, seed: Long = 42L): Slice =
    Slice(df.sample(withReplacement = false, fraction, seed), prefix)
  def persist(): Slice = { df.persist(); this }
  def unpersist(): Slice = { df.unpersist(); this }
  def count(): Long = df.count()
  def collectRows(): Array[Row] = df.collect()

  /** Streaming driver-side scan (≅ Result.Scanner, reference
    * exec/session.go:407-434): rows arrive partition-at-a-time via
    * `toLocalIterator`, so the driver holds at most one partition —
    * constant-memory consumption of results too large to
    * [[collectRows]]. One Spark job runs per partition as the iterator
    * advances (the reference's scanner similarly pages task results). */
  def scanRows(): Iterator[Row] = {
    import scala.jdk.CollectionConverters._
    df.toLocalIterator().asScala
  }
}

object Slice {
  def apply(df: DataFrame): Slice = Slice(df, 1)

  /** The task resource profile [[Slice.procs]] attaches: n CPU slots
    * per task — Spark's per-stage form of `spark.task.cpus`, honored by
    * Standalone/YARN/K8s schedulers (fewer concurrent tasks per
    * executor, the reference's Procs effect on a bigmachine). */
  def procsProfile(n: Int): org.apache.spark.resource.ResourceProfile =
    new org.apache.spark.resource.ResourceProfileBuilder()
      .require(new org.apache.spark.resource.TaskResourceRequests().cpus(n))
      .build()
}
