package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.types.{DataType, StructType}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Keyed copy-on-write bucketed table — the DOWNSTREAM half of the CDC
 * story. The four index families ([[DigestIndex]], [[MinhashIndex]],
 * [[IvfIndex]], [[TermIndex]]) absorb change batches in O(batch);
 * MergeTable lets everything downstream of them do the same: a keyed
 * parquet table whose upsert/delete refresh rewrites ONLY the hash
 * buckets containing touched keys, never the corpus. It is the keyed
 * state store under [[Ivm]]'s incrementally-maintained aggregates and
 * the "maintained mirror" a training pipeline keeps of its deduped
 * corpus. (Reference analogue: the answer-what-you-can discipline of
 * /root/reference/cache.go:51-66, lifted from per-shard caches to a
 * keyed table; the reference itself has no mutable-table surface at
 * all — bigslice pipelines re-read whole inputs per run.)
 *
 * Layout (`dir/` on any Hadoop FS; [[VersionedLayout]] conventions —
 * immutable data, atomic LATEST flip, generation-fenced writer claims):
 * {{{
 *   LATEST, FORMAT, claims/   version pointer + layout rev + writer
 *                             mutual exclusion
 *   SCHEMA, META              row schema (StructType json) + key spec
 *   state/p00003/__bucket=N/  bucket N's COMPLETE row set, as rewritten
 *                             at version 3 (one parquet dir per bucket;
 *                             fenced writers suffix the p-dir: p00003x1)
 *   v00003/buckets.txt        "bucket,relpath,rows" — each live bucket's
 *                             current path; untouched buckets keep the
 *                             pointer of the version that last wrote them
 * }}}
 *
 * Why copy-on-write buckets and not an LSM like the index families: the
 * indexes are probed by CONTENT (digest/band/list/term — each probe
 * prunes to candidate partitions), so they tolerate multi-segment reads
 * and amortize rewrites into tiered folds. A maintained table is read
 * WHOLE by downstream jobs; read amplification hurts every consumer on
 * every run, while the write cost of a merge is one bucket rewrite per
 * touched bucket — bounded by min(touched keys, nBuckets) bucket-sized
 * jobs, independent of table size. `nBuckets` is the knob: at 100 TB
 * with nBuckets = 100k a bucket is ~1 GB, so a 1M-row refresh rewrites
 * ≤ 100k × 1 GB in the worst case but in practice (keys clustered by
 * hash = uniformly) min(1M, 100k) buckets — and a SMALL refresh (the
 * steady state) rewrites only the handful of buckets its keys hash to.
 * A too-small nBuckets degrades merge cost toward a full rewrite; a
 * too-large one degrades read listing. Both ends are visible in
 * [[stats]].
 *
 * Merge plan shape (what makes it 100 TB-safe): touched-bucket ids are
 * computed FROM THE BATCH (batch-sized agg, collect bounded by
 * nBuckets); old rows are read from touched bucket dirs only; the
 * touched-key mask is a BROADCAST anti-join (batch-sized build side);
 * the rewrite shuffles only touched-bucket mass, partitioned by bucket
 * so each bucket lands as one contiguous file set. No corpus scan, no
 * corpus shuffle, no driver materialization of data rows.
 */
object MergeTable {

  private val FormatVersion = 1

  /** Key spec persisted in META. `keyCols` identify a row (merge
    * replaces by them); `bucketCols` route rows to buckets and MUST be
    * a prefix-subset of `keyCols` (all versions of a key stay in one
    * bucket; [[Ivm]] buckets its z-set by group so a group's whole
    * state is co-located). Key columns must be non-null (asserted per
    * merge — null keys cannot be matched by the equi-join mask). */
  final case class Meta(keyCols: Seq[String], bucketCols: Seq[String],
                        nBuckets: Int, schema: StructType) {
    require(nBuckets >= 1, s"nBuckets must be >= 1: $nBuckets")
    require(bucketCols.nonEmpty && bucketCols.forall(keyCols.contains),
      s"bucketCols ${bucketCols.mkString(",")} must be a subset of " +
        s"keyCols ${keyCols.mkString(",")}")
    require(keyCols.forall(schema.fieldNames.contains),
      s"keyCols ${keyCols.mkString(",")} must exist in the schema")
  }

  import VersionedLayout.{atomicWrite, fs, readSmall, versionDir, withClaim}

  def exists(spark: SparkSession, dir: String): Boolean =
    VersionedLayout.exists(spark, dir)

  def latestVersion(spark: SparkSession, dir: String): Int =
    VersionedLayout.latestVersion(spark, dir, FormatVersion, "MergeTable")

  private def statePath(dir: String, rel: String): String =
    s"${dir.stripSuffix("/")}/state/$rel"

  private def writeMeta(spark: SparkSession, dir: String, m: Meta): Unit = {
    val f = fs(spark, dir)
    atomicWrite(f, new Path(dir, "SCHEMA"), m.schema.json)
    atomicWrite(f, new Path(dir, "META"),
      s"nBuckets\t${m.nBuckets}\nkeyCols\t${m.keyCols.mkString("\u0001")}\n" +
        s"bucketCols\t${m.bucketCols.mkString("\u0001")}")
  }

  def readMeta(spark: SparkSession, dir: String): Meta = {
    val f = fs(spark, dir)
    val schema = DataType.fromJson(readSmall(f, new Path(dir, "SCHEMA")))
      .asInstanceOf[StructType]
    val kv = readSmall(f, new Path(dir, "META")).split("\n")
      .map { l => val Array(k, v) = l.split("\t", 2); k -> v }.toMap
    Meta(kv("keyCols").split("\u0001").toSeq,
      kv("bucketCols").split("\u0001").toSeq, kv("nBuckets").toInt, schema)
  }

  /** Bucket routing: hash of the bucket columns mod nBuckets —
    * deterministic, stable across versions (a table's nBuckets is
    * fixed at create; rescaling is a rebuild). */
  private def bucketExpr(m: Meta) =
    pmod(xxhash64(m.bucketCols.map(col): _*), lit(m.nBuckets.toLong))
      .cast("int")

  private def writeManifest(spark: SparkSession, dir: String, v: Int,
                            entries: Seq[(Int, String, Long)]): Unit =
    // rename-based fenced commit: content lands in a claimant-private
    // temp, lease re-verified AFTER the write, one rename publishes —
    // a loser paused mid-write across a steal aborts untouched
    VersionedLayout.fencedWrite(spark, dir, v, "MergeTable",
      new Path(versionDir(dir, v), "buckets.txt"),
      entries.sortBy(_._1)
        .map { case (b, rel, n) => s"$b,$rel,$n" }.mkString("\n"))

  private[graft] def readManifest(spark: SparkSession, dir: String,
                                  v: Int): Seq[(Int, String, Long)] = {
    val s = VersionedLayout.fencedRead(fs(spark, dir),
      new Path(versionDir(dir, v), "buckets.txt"))
    if (s.isEmpty) Seq.empty
    else s.split("\n").toSeq.map { l =>
      val Array(b, rel, n) = l.split(","); (b.toInt, rel, n.toLong)
    }
  }

  private def requireLiveVersion(spark: SparkSession, dir: String,
                                 version: Int): Unit = {
    val latest = latestVersion(spark, dir)
    require(version >= 1 && version <= latest,
      s"version $version of $dir does not exist (latest: $latest)")
    require(fs(spark, dir).exists(new Path(versionDir(dir, version))),
      s"version $version of $dir was garbage-collected — pinned reads " +
        "need retainVersions to cover it")
  }

  /** Commit an empty v1 with the key spec and row schema pinned. */
  def create(spark: SparkSession, dir: String, schema: StructType,
             keyCols: Seq[String], bucketCols: Seq[String],
             nBuckets: Int): Int = {
    val m = Meta(keyCols, bucketCols, nBuckets, schema)
    withClaim(spark, dir, 1, FormatVersion, "MergeTable") {
      writeMeta(spark, dir, m)
      writeManifest(spark, dir, 1, Seq.empty)
    }
    1
  }

  /** Create + load an initial row set in one version ([[merge]] with
    * no deletes against the empty table). */
  def build(spark: SparkSession, dir: String, rows: DataFrame,
            keyCols: Seq[String], bucketCols: Seq[String],
            nBuckets: Int): Int = {
    create(spark, dir, rows.schema, keyCols, bucketCols, nBuckets)
    merge(spark, dir, rows, rows.select(keyCols.map(col): _*).limit(0))
  }

  /** Full table at a pinned version: the union of every live bucket's
    * parquet dir — read cost O(live buckets), no merge-on-read overlay
    * to reconcile (each bucket has exactly ONE current path). */
  def readAt(spark: SparkSession, dir: String, version: Int): DataFrame = {
    requireLiveVersion(spark, dir, version)
    val m = readMeta(spark, dir)
    val paths = readManifest(spark, dir, version).map(e => statePath(dir, e._2))
    if (paths.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], m.schema)
    else spark.read.schema(m.schema).parquet(paths: _*)
  }

  def read(spark: SparkSession, dir: String): DataFrame =
    readAt(spark, dir, latestVersion(spark, dir))

  /** Rows of exactly the buckets that `keys` (any frame carrying the
    * bucket columns) hash to, at a pinned version — the touched-bucket
    * read every incremental consumer starts from. Returns the rows and
    * the touched bucket ids. The bucket-id collect is bounded by
    * nBuckets (driver metadata, same class as the index families'
    * manifest reads). */
  def readForKeysAt(spark: SparkSession, dir: String, version: Int,
                    keys: DataFrame): (DataFrame, Set[Int]) = {
    requireLiveVersion(spark, dir, version)
    val m = readMeta(spark, dir)
    val touched = keys.select(bucketExpr(m).as("__bucket")).distinct()
      .collect().map(_.getInt(0)).toSet
    val paths = readManifest(spark, dir, version)
      .filter(e => touched(e._1)).map(e => statePath(dir, e._2))
    val rows =
      if (paths.isEmpty)
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], m.schema)
      else spark.read.schema(m.schema).parquet(paths: _*)
    (rows, touched)
  }

  /**
   * The general refresh primitive: given `touchKeys` (any frame
   * carrying the bucket columns), replace the COMPLETE state of the
   * buckets they hash to with `f(oldRowsOfThoseBuckets)` in one
   * committed version. `f` must return every surviving row of the
   * touched buckets (rows of other buckets are untouched by
   * construction and asserted on write). [[merge]] is the common
   * upsert/delete instance; [[Ivm]] uses this directly for its
   * read-combine-write z-set fold.
   *
   * A refresh whose `f` output lands rows in an untouched bucket is a
   * key-routing bug in the caller; it is rejected before the manifest
   * commit (the claim releases, nothing is published).
   */
  def mergeCompute(spark: SparkSession, dir: String, touchKeys: DataFrame)
                  (f: DataFrame => DataFrame): Int = {
    val m = readMeta(spark, dir)
    val v = latestVersion(spark, dir)
    withClaim(spark, dir, v + 1, FormatVersion, "MergeTable") {
      val nullKeys = touchKeys
        .filter(m.bucketCols.map(col(_).isNull).reduce(_ || _)).count()
      require(nullKeys == 0,
        s"$nullKeys touch keys carry null bucket columns — null keys " +
          "cannot be merged (the equi-join mask never matches them)")
      val touched = touchKeys.select(bucketExpr(m).as("__bucket")).distinct()
        .collect().map(_.getInt(0)).toSet
      val prev = readManifest(spark, dir, v)
      val (touchedPrev, keptPrev) = prev.partition(e => touched(e._1))
      val oldPaths = touchedPrev.map(e => statePath(dir, e._2))
      val old =
        if (oldPaths.isEmpty)
          spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], m.schema)
        else spark.read.schema(m.schema).parquet(oldPaths: _*)
      val rel = f"p${v + 1}%05d${VersionedLayout.fence(dir, v + 1)}"
      val out = f(old)
        .select(m.schema.fields.map(fd =>
          col(fd.name).cast(fd.dataType).as(fd.name)): _*)
        .withColumn("__bucket", bucketExpr(m))
      // one contiguous file set per bucket: repartition by bucket id,
      // then partitionBy splits dirs — each task writes whole buckets
      out.repartition(col("__bucket"))
        .write.partitionBy("__bucket").mode("overwrite")
        .parquet(statePath(dir, rel))
      // per-bucket counts from the WRITTEN files (footer-only count,
      // no second computation of f's plan); doubles as the routing
      // assertion — a row in an untouched bucket fails the commit here.
      // An all-empty refresh writes no __bucket= dirs at all (drop the
      // p-dir — a file-less dir would fail schema inference later).
      val pOut = new Path(statePath(dir, rel))
      val fsys = fs(spark, dir)
      val anyBucket = fsys.exists(pOut) && fsys.listStatus(pOut)
        .exists(_.getPath.getName.startsWith("__bucket="))
      val written: Map[Int, Long] =
        if (!anyBucket) { fsys.delete(pOut, true); Map.empty }
        else spark.read.parquet(statePath(dir, rel))
          .groupBy("__bucket").count().collect()
          .map(r => r.getInt(0) -> r.getLong(1)).toMap
      val stray = written.keySet -- touched
      require(stray.isEmpty,
        s"refresh produced rows for untouched buckets ${stray.mkString(",")}" +
          " — key routing bug in the caller (bucket cols mutated?)")
      val entries = keptPrev ++ written.toSeq.collect {
        case (b, n) if n > 0 => (b, s"$rel/__bucket=$b", n)
      }
      writeManifest(spark, dir, v + 1, entries)
    }
    v + 1
  }

  /**
   * Upsert/delete refresh: rows keyed by `keyCols` in `upserts` replace
   * existing rows; keys in `deleteKeys` are removed; a key in BOTH
   * resolves delete-wins when `deleteWins` (the [[DigestIndex.applyCdc]]
   * sibling contract) or upsert-wins otherwise. Upserts must be unique
   * per key after resolution (asserted — "which copy wins" is not a
   * DataFrame ordering question this API will answer silently).
   * Deletes of absent keys are no-ops. Returns the committed version;
   * a no-op batch still advances the version (the sibling families'
   * quiet-batch contract, so stream wrappers can pair batch↔version).
   */
  def merge(spark: SparkSession, dir: String, upserts: DataFrame,
            deleteKeys: DataFrame, deleteWins: Boolean = true): Int = {
    val m = readMeta(spark, dir)
    val kc = m.keyCols
    val up = upserts.select(m.schema.fields.map(fd =>
      col(fd.name).cast(fd.dataType).as(fd.name)): _*)
    val del = deleteKeys.select(kc.map(n =>
      col(n).cast(m.schema(n).dataType).as(n)): _*)
    val liveUp =
      if (deleteWins) up.join(broadcast(del), kc, "left_anti") else up
    val dupKeys = liveUp.groupBy(kc.map(col): _*).count()
      .filter(col("count") > 1).count()
    require(dupKeys == 0,
      s"$dupKeys upsert keys appear more than once in the batch — " +
        "deduplicate (pick a winner) before merging")
    val touch = up.select(kc.map(col): _*).unionByName(del).distinct()
    val nullKeys = touch
      .filter(kc.map(col(_).isNull).reduce(_ || _)).count()
    require(nullKeys == 0,
      s"$nullKeys batch keys carry null key columns — null keys cannot " +
        "be merged (the equi-join mask never matches them)")
    mergeCompute(spark, dir, touch) { old =>
      old.join(broadcast(touch), kc, "left_anti").unionByName(liveUp)
    }
  }

  /** Live bucket stats at LATEST: (bucket, rows) plus the manifest's
    * path spread — the health view that shows a mis-sized nBuckets
    * (few huge buckets → merges degrade toward full rewrites; a long
    * tail of stale p-dirs → run [[gc]]). */
  def stats(spark: SparkSession, dir: String): Seq[(Int, String, Long)] =
    readManifest(spark, dir, latestVersion(spark, dir))

  /** Drop version dirs older than the last `retainLast` and bucket
    * data dirs no retained manifest references (bucket-granular: one
    * p-dir can be live for bucket 3 and dead for bucket 5). In-flight
    * writers are safe: only p-seqs ≤ LATEST are swept, and the claim
    * protocol keeps concurrent writers off p-seqs ≤ LATEST. */
  def gc(spark: SparkSession, dir: String, retainLast: Int): Unit = {
    require(retainLast >= 1, s"retainLast must be >= 1: $retainLast")
    val latest = latestVersion(spark, dir)
    val f = fs(spark, dir)
    val keepFrom = math.max(1, latest - retainLast + 1)
    (1 until keepFrom).foreach(v =>
      f.delete(new Path(versionDir(dir, v)), true))
    val liveVersions = (keepFrom to latest)
      .filter(v => f.exists(new Path(versionDir(dir, v))))
    val referenced = liveVersions
      .flatMap(readManifest(spark, dir, _).map(_._2)).toSet
    val stateRoot = new Path(s"${dir.stripSuffix("/")}/state")
    if (f.exists(stateRoot))
      f.listStatus(stateRoot).foreach { p =>
        val pName = p.getPath.getName
        val pSeq = pName.drop(1).takeWhile(_.isDigit).toIntOption
          .getOrElse(Int.MaxValue)
        if (pSeq <= latest) {
          f.listStatus(p.getPath).foreach { b =>
            val rel = s"$pName/${b.getPath.getName}"
            if (b.getPath.getName.startsWith("__bucket=") &&
                !referenced.contains(rel))
              f.delete(b.getPath, true)
          }
          if (f.listStatus(p.getPath)
                .forall(st => !st.getPath.getName.startsWith("__bucket=")))
            f.delete(p.getPath, true)
        }
      }
  }
}
