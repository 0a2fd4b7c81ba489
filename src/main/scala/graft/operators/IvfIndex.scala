package graft.operators

import scala.jdk.CollectionConverters._

import graft.functions.VectorExpressions.{dotF, normF}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Persisted IVF (inverted-file) ANN index with INCREMENTAL ingest —
 * the embedding-side sibling of [[MinhashIndex]]: a production
 * embedding pipeline appends vectors continuously, and rebuilding the
 * whole inverted file per batch ([[Similarity.buildIvfIndex]]'s
 * build-once contract) is corpus-sized work for batch-sized input.
 * (Reference analogue: the partial-reuse discipline of
 * /root/reference/cache.go:51-66 / exec/compile.go:344-368 — persisted
 * state answers what it can; only the delta is recomputed.)
 *
 * Layout (`dir/` on any Hadoop filesystem):
 * {{{
 *   LATEST, FORMAT        atomic version pointer + layout revision
 *   segments/s00002/      one parquet dataset per append, PARTITIONED
 *                         BY list_id (immutable; shared by versions)
 *   segments/r00005/      a COMPACTION segment: drift-triggered
 *                         (re-clustered; replaces ALL prior segments)
 *                         or size-triggered (tiered; folds the small
 *                         `s` segments, prior `r` segments are kept)
 *   v00001/centroids.txt  this version's centroids (driver metadata)
 *   v00001/segments.txt   the segment names this version reads
 *   v00001/counts.txt     per-list vector counts (drives the drift
 *                         guard)
 * }}}
 *
 * Append = assign the batch to the EXISTING centroids, write ONE
 * batch-sized segment, extend the manifest, flip LATEST — per-append
 * I/O and compute are proportional to the batch, never the corpus
 * (plan-asserted in IvfIndexSpec: probes read only probed `list_id=`
 * directories of manifest segments). Versions are immutable and the
 * LATEST flip is atomic, so a crashed append leaves the index
 * untouched and the retry overwrites the orphan segment cleanly.
 *
 * THE drift guard (what keeps appended indexes honest at 100 TB):
 * frozen centroids slowly stop fitting a drifting embedding
 * distribution — lists go lopsided, probes read ever-larger fractions
 * of the corpus, recall/latency degrade silently. Each append checks
 * the merged per-list counts; when the largest list exceeds
 * `maxImbalance ×` the mean, the append RE-CLUSTERS: centroids retrain
 * over the full corpus (the one corpus-sized job, amortized over the
 * appends that stayed balanced) and the data compacts into a single
 * fresh segment — which also caps segment-count growth, LSM-style.
 */
object IvfIndex {

  /** Index parameters — part of the index's identity (like a schema);
    * must match between build and append. `maxImbalance` and
    * `maxSegments` tune only WHEN re-clustering/compaction happen,
    * not what queries return. */
  final case class Config(dim: Int, nList: Int = 16, iters: Int = 2,
                          maxImbalance: Double = 4.0, maxSegments: Int = 8)

  private val FormatVersion = 1

  import VersionedLayout.{atomicWrite, commitLatest, fs, readSmall, versionDir}

  def exists(spark: SparkSession, dir: String): Boolean =
    VersionedLayout.exists(spark, dir)

  def latestVersion(spark: SparkSession, dir: String): Int =
    VersionedLayout.latestVersion(spark, dir, FormatVersion, "IvfIndex")

  /** Read a small named marker file stored alongside the index (e.g. a
    * streaming wrapper's batch-id↔version pairing), if present — same
    * contract as [[MinhashIndex.readMarker]]. */
  def readMarker(spark: SparkSession, dir: String, name: String): Option[String] = {
    val f = fs(spark, dir)
    val p = new Path(dir, name)
    if (!f.exists(p)) None else Some(readSmall(f, p))
  }

  /** Atomically write a small named marker file alongside the index
    * (tmp + rename — a crash never leaves a partial marker visible). */
  def writeMarker(spark: SparkSession, dir: String, name: String,
                  content: String): Unit =
    atomicWrite(fs(spark, dir), new Path(dir, name), content)

  private def segPath(dir: String, name: String): String =
    s"${dir.stripSuffix("/")}/segments/$name"

  // ------------------------------------------------------------------
  // Manifest (per-version driver metadata: centroids, segment list,
  // per-list counts).
  // ------------------------------------------------------------------

  private def writeManifest(spark: SparkSession, dir: String, v: Int,
                            cents: Array[Array[Double]], segs: Seq[String],
                            counts: Map[Int, Long]): Unit = {
    val f = fs(spark, dir)
    val vd = versionDir(dir, v)
    atomicWrite(f, new Path(vd, "centroids.txt"),
      cents.map(_.mkString(",")).mkString("\n"))
    atomicWrite(f, new Path(vd, "segments.txt"), segs.mkString("\n"))
    atomicWrite(f, new Path(vd, "counts.txt"),
      counts.toSeq.sorted.map { case (l, c) => s"$l,$c" }.mkString("\n"))
  }

  private[graft] def readCentroids(spark: SparkSession, dir: String,
                                   v: Int): Array[Array[Double]] =
    readSmall(fs(spark, dir), new Path(versionDir(dir, v), "centroids.txt"))
      .split("\n").map(_.split(",").map(_.toDouble))

  private[graft] def readSegments(spark: SparkSession, dir: String,
                                  v: Int): Seq[String] = {
    val s = readSmall(fs(spark, dir), new Path(versionDir(dir, v), "segments.txt"))
    if (s.isEmpty) Seq.empty else s.split("\n").toSeq
  }

  private[graft] def readCounts(spark: SparkSession, dir: String,
                                v: Int): Map[Int, Long] = {
    val s = readSmall(fs(spark, dir), new Path(versionDir(dir, v), "counts.txt"))
    if (s.isEmpty) Map.empty
    else s.split("\n").map { l =>
      val Array(k, c) = l.split(","); k.toInt -> c.toLong
    }.toMap
  }

  // ------------------------------------------------------------------
  // Build / append / query / gc
  // ------------------------------------------------------------------

  /** Assign `df` to `cents` (broadcast literals — one streaming stage),
    * write a segment partitioned by list_id, and return the per-list
    * counts of what was COMMITTED (read back from the written files, so
    * the manifest always reflects on-disk truth). Counts are nList-row
    * driver metadata, same class as the centroids. */
  private def writeSegment(df: DataFrame, id: String, vec: String,
                           cents: Array[Array[Double]], cfg: Config,
                           path: String): Map[Int, Long] = {
    val assigned = Similarity.assignLists(
      df.select(col(id), col(vec)), id, vec, cfg.dim, cents)
    assigned.write.mode("overwrite").partitionBy("list_id").parquet(path)
    // read back with the EXPLICIT schema: an empty batch writes no data
    // files and schema inference would throw, but an ingest loop must
    // tolerate quiet-period batches
    df.sparkSession.read.schema(assigned.schema).parquet(path)
      .groupBy(col("list_id")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
  }

  /** Train centroids over `corpus` and commit v1 (one segment). */
  def build(spark: SparkSession, corpus: DataFrame, id: String, vec: String,
            dir: String, cfg: Config): Unit = {
    val cents = Similarity.trainCentroids(corpus, id, vec, cfg.dim,
      cfg.nList, cfg.iters)
    require(cents.nonEmpty, "IvfIndex.build needs a non-empty corpus")
    val seg = "s00001"
    val counts = writeSegment(corpus, id, vec, cents, cfg, segPath(dir, seg))
    writeManifest(spark, dir, 1, cents, Seq(seg), counts)
    commitLatest(spark, dir, 1, FormatVersion)
  }

  /**
   * Fold `batch` into the index: one batch-sized segment against the
   * current centroids, or a full re-cluster + compaction when the
   * drift guard trips. Returns the committed version. Single-writer
   * (like [[MinhashIndex]]): appends are serialized by the caller.
   */
  def append(spark: SparkSession, dir: String, batch: DataFrame,
             id: String, vec: String, cfg: Config): Int = {
    val v = latestVersion(spark, dir)
    val cents = readCentroids(spark, dir, v)
    require(cents.headOption.exists(_.length == cfg.dim),
      s"index at $dir has dim ${cents.headOption.map(_.length)}, cfg has ${cfg.dim}")
    val segs = readSegments(spark, dir, v)
    val prev = readCounts(spark, dir, v)
    // segment name derived from the version it belongs to: a retry of
    // a crashed append overwrites its own orphan, never a committed
    // segment
    val segName = f"s${v + 1}%05d"
    val bCounts = writeSegment(batch, id, vec, cents, cfg, segPath(dir, segName))
    // an empty batch leaves no segment behind: the manifest must not
    // reference a data-less directory (readers infer schemas from it)
    val newSegs = if (bCounts.isEmpty) segs else segs :+ segName
    val merged = (prev.keySet ++ bCounts.keySet).iterator
      .map(k => k -> (prev.getOrElse(k, 0L) + bCounts.getOrElse(k, 0L))).toMap
    val total = merged.values.sum
    val skewed = merged.nonEmpty &&
      merged.values.max > cfg.maxImbalance * total.toDouble / cents.length
    if (skewed) {
      // drift guard tripped: retrain over the FULL corpus (old
      // segments ∪ the batch segment just written) and compact into
      // one fresh segment — the amortized corpus-sized job that keeps
      // list occupancy, probe cost and recall stable under drift
      val all = newSegs
        .map(s => spark.read.parquet(segPath(dir, s)))
        .reduce(_.unionByName(_))
        .select(col(id), col(vec))
      val cents2 = Similarity.trainCentroids(all, id, vec, cfg.dim,
        cfg.nList, cfg.iters)
      val comp = f"r${v + 1}%05d"
      val counts2 = writeSegment(all, id, vec, cents2, cfg, segPath(dir, comp))
      writeManifest(spark, dir, v + 1, cents2, Seq(comp), counts2)
    } else if (newSegs.length > cfg.maxSegments) {
      // SIZE-triggered compaction: a balanced workload never trips the
      // drift guard, so without this cap N appends = N segments = N
      // parquet datasets listed and unioned per probe — planner cost
      // and file listing growing forever. LSM stores compact on
      // segment count, not only on skew. Centroids are UNCHANGED, so
      // no retrain and no re-assignment: rows already carry their
      // list_id, the rewrite is one union → partitioned write, and
      // `merged` (derived from per-segment read-backs) already equals
      // on-disk truth. A crash before LATEST flips strands only the
      // r-segment, which the retry overwrites.
      //
      // TIERED, like an LSM store: only the batch-sized `s` segments
      // fold into the new `r` segment; prior `r` segments are KEPT —
      // merging them too would rewrite the whole corpus every
      // maxSegments appends (O(N²/maxSegments) total write volume for
      // N appends, a scale-killer for continuous ingest). Each size
      // compaction adds one `r`, so `r`-segments themselves merge
      // r-with-r only when their count would exceed the cap — every
      // ~maxSegments² appends, each merge amortized over the appends
      // that built it up.
      val (rSegs, sSegs) = newSegs.partition(_.startsWith("r"))
      val mergeAll = rSegs.length >= cfg.maxSegments
      val toMerge = if (mergeAll) newSegs else sSegs
      val kept = if (mergeAll) Seq.empty else rSegs
      val comp = f"r${v + 1}%05d"
      toMerge
        .map(s => spark.read.parquet(segPath(dir, s)))
        .reduce(_.unionByName(_))
        .write.mode("overwrite").partitionBy("list_id")
        .parquet(segPath(dir, comp))
      writeManifest(spark, dir, v + 1, cents, kept :+ comp, merged)
    } else {
      writeManifest(spark, dir, v + 1, cents, newSegs, merged)
    }
    commitLatest(spark, dir, v + 1, FormatVersion)
    v + 1
  }

  /** A version must be committed AND still on disk (see
    * [[MinhashIndex]]'s identical contract). */
  private def requireLiveVersion(spark: SparkSession, dir: String,
                                 version: Int): Unit = {
    val latest = latestVersion(spark, dir)
    require(version >= 1 && version <= latest,
      s"version $version out of [1, $latest] at $dir")
    require(fs(spark, dir).exists(new Path(versionDir(dir, version))),
      s"version $version at $dir was dropped by gc (retainLast) — only " +
        "versions still on disk can be queried; raise retainLast if " +
        "replay needs deeper history")
  }

  /** ANN top-k against the latest committed version. */
  def topK(spark: SparkSession, dir: String, queries: DataFrame,
           id: String, vec: String, k: Int, nProbe: Int = 4): DataFrame =
    topKAt(spark, dir, latestVersion(spark, dir), queries, id, vec, k, nProbe)

  /**
   * ANN top-k pinned to a committed version — the replay primitive.
   * Probe lists are computed driver-side from the version's centroids
   * (queries are small by contract — every formulation broadcasts
   * them); each manifest segment is scanned with a static
   * `list_id IN (…)` partition filter, so only probed directories are
   * listed and read regardless of how many appends the index has
   * absorbed.
   */
  def topKAt(spark: SparkSession, dir: String, version: Int,
             queries: DataFrame, id: String, vec: String, k: Int,
             nProbe: Int = 4): DataFrame = {
    requireLiveVersion(spark, dir, version)
    val cents = readCentroids(spark, dir, version)
    // Queries are small by contract (every formulation broadcasts
    // them), so probe lists are computed HERE, in Scala, from the
    // collected rows — the Catalyst alternative embeds an
    // nList × dim scoring expression whose analysis/codegen (not
    // execution) dominated the probe. Same arithmetic order as
    // Similarity.bestListsArr: left-associated double sums, ties by
    // centroid index.
    val centNorms = cents.map(c => math.sqrt(c.map(x => x * x).sum))
    val qRows = queries.select(col(id), col(vec)).collect()
    val qSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("query_id",
        queries.schema(id).dataType),
      org.apache.spark.sql.types.StructField("qv",
        queries.schema(vec).dataType),
      org.apache.spark.sql.types.StructField("list_id",
        org.apache.spark.sql.types.IntegerType, nullable = false)))
    val exploded = new java.util.ArrayList[org.apache.spark.sql.Row]()
    qRows.foreach { r =>
      // this driver probe accepts any boxed numeric element; the
      // Catalyst scoring kernel (FloatVecBestLists) is ARRAY<FLOAT>
      // only. Both demand full-dim, null/NaN-free vectors — enforced
      // HERE so malformed input fails loudly on one path instead of
      // silently diverging between the two (a cosine against null/NaN
      // is null/NaN, so "nearest lists" is undefined; a short vector
      // would truncate in Catalyst but throw in the driver fold).
      val v = r.getSeq[Number](1)
      require(v != null, s"null $vec for query ${r.get(0)}")
      require(v.length == cents.head.length,
        s"query ${r.get(0)} has dim ${v.length}, index has ${cents.head.length}")
      require(v.forall(x => x != null && !x.doubleValue.isNaN),
        s"null/NaN element in $vec for query ${r.get(0)}")
      val probes = cents.indices.map { ci =>
        // zero-norm centroids score -inf (they rank last), matching
        // Similarity.sortedListsByCos exactly — NaN ordering otherwise
        // diverges between the driver sort and Catalyst
        if (centNorms(ci) == 0.0) (Double.NegativeInfinity, ci)
        else {
          var dot = 0.0
          var i = 0
          while (i < cents(ci).length) {
            dot += v(i).doubleValue * cents(ci)(i)
            i += 1
          }
          (dot / centNorms(ci), ci)
        }
      }.sortBy { case (s, ci) => (-s, ci) }.take(nProbe)
      probes.foreach { case (_, ci) =>
        exploded.add(org.apache.spark.sql.Row(r.get(0), r.get(1), ci))
      }
    }
    val q = spark.createDataFrame(exploded, qSchema)
    val probedLists = exploded.iterator().asScala.map(_.getInt(2)).toSeq.distinct
    val c = readSegments(spark, dir, version)
      .map(s => spark.read.parquet(segPath(dir, s))
        .filter(col("list_id").isin(probedLists: _*))
        .select(col(id).as("neighbor_id"), col(vec).as("cv"), col("list_id")))
      .reduce(_.unionByName(_))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    c.join(broadcast(q), Seq("list_id"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos",
        dotF(col("qv"), col("cv")) / (normF(col("qv")) * normF(col("cv"))))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("rnk"), col("neighbor_id"), col("cos"))
  }

  /** Drop versions older than the last `retainLast` and every segment
    * no retained manifest references (compactions strand their
    * predecessors; crashed appends strand orphans). In-flight segments
    * are never touched: an uncommitted append's segment is numbered
    * latest+1, above the retained range this scans. Single-writer,
    * like [[append]]. */
  def gc(spark: SparkSession, dir: String, retainLast: Int): Unit = {
    require(retainLast >= 1, s"retainLast must be >= 1: $retainLast")
    val latest = latestVersion(spark, dir)
    val f = fs(spark, dir)
    val keepFrom = math.max(1, latest - retainLast + 1)
    (1 until keepFrom).foreach(v => f.delete(new Path(versionDir(dir, v)), true))
    // a prior gc with a smaller retainLast may already have dropped
    // versions inside today's retention window — only read manifests
    // that still exist
    val referenced = (keepFrom to latest)
      .filter(v => f.exists(new Path(versionDir(dir, v))))
      .flatMap(readSegments(spark, dir, _)).toSet
    val segRoot = new Path(s"${dir.stripSuffix("/")}/segments")
    if (f.exists(segRoot))
      f.listStatus(segRoot).foreach { st =>
        val name = st.getPath.getName
        // name = [sr]NNNNN; only reap segments at or below the latest
        // committed version — latest+1 may be an append in flight
        val num = name.drop(1).toIntOption.getOrElse(Int.MaxValue)
        if (!referenced.contains(name) && num <= latest)
          f.delete(st.getPath, true)
      }
  }
}
