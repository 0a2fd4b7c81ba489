package graft.operators

import graft.sources.Bucketing
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Persisted MinHash/LSH index for INCREMENTAL near-dup detection — the
 * steady-state form of [[Dedup.minhashIncremental]]: instead of
 * recomputing corpus shingles and signatures on every ingest, the
 * corpus-side state lives in three tables under a versioned directory
 * and each ingest probes them one-sided. Per-ingest COMPUTE is
 * proportional to the batch; the corpus text is never read again.
 * (Reference analogue: the cache-short-circuit discipline of
 * exec/compile.go:344-368 — recompute only what persisted state can't
 * answer.)
 *
 * Layout (`dir/` on any Hadoop filesystem):
 * {{{
 *   LATEST              current version number (atomic rename swap)
 *   v00001/shingles/    (id, shingle)   UNCAPPED distinct shingles/doc
 *   v00001/df/          (shingle, df)   corpus document frequency
 *   v00001/bands/       (id, band, bucket) LSH keys over CAPPED sets,
 *                       bucket-named parquet written CLUSTERED BY
 *                       (band, bucket) — probes join it shuffle-free
 * }}}
 *
 * Versions are immutable: [[appendToIndex]] writes v{n+1} and flips
 * LATEST last, so concurrent readers of v{n} are never disturbed and a
 * failed append leaves the index untouched (rename is atomic on
 * HDFS/local; on S3 keep LATEST in a manifest store). Old versions are
 * retained for the caller to garbage-collect.
 *
 * THE df-cap subtlety (what makes probe results EXACTLY equal to
 * [[Dedup.minhashIncremental]] over existing ∪ batch): the stop-shingle
 * set is defined over the COMBINED document frequency, and a batch can
 * push a shingle over the cap. Document frequency only grows, so
 * shingles only ever BECOME hot — the corpus docs whose capped shingle
 * set changed are exactly those containing a newly-hot shingle. Their
 * band rows are recomputed from the persisted (uncapped) shingle table;
 * everyone else's persisted bands are reused verbatim. The newly-hot
 * set is empty almost always (caps are set so only degenerate
 * boilerplate crosses them), so the steady-state ingest recomputes
 * nothing.
 */
object MinhashIndex {

  /** Index/query parameters — must match between build and probe (they
    * are part of the index's identity, like an index schema). */
  final case class Config(k: Int = 3, numPerms: Int = 64, bandRows: Int = 2,
                          minJ: Double = 0.5, maxShingleDf: Int = 100,
                          nBuckets: Int = 32) {
    def nBands: Int = numPerms / bandRows
  }

  // ------------------------------------------------------------------
  // Versioned layout plumbing (Hadoop FS — works on local/HDFS/object
  // stores with a Hadoop connector).
  // ------------------------------------------------------------------

  private def fs(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def versionDir(dir: String, v: Int): String =
    f"${dir.stripSuffix("/")}/v$v%05d"

  /** Current committed version, from the LATEST pointer. */
  def latestVersion(spark: SparkSession, dir: String): Int = {
    val p = new Path(dir, "LATEST")
    val f = fs(spark, dir)
    require(f.exists(p), s"no MinhashIndex at $dir (missing LATEST)")
    val in = f.open(p)
    try new String(org.apache.commons.io.IOUtils.toByteArray(in),
      java.nio.charset.StandardCharsets.UTF_8).trim.toInt
    finally in.close()
  }

  /** True if `dir` holds a committed index. */
  def exists(spark: SparkSession, dir: String): Boolean =
    fs(spark, dir).exists(new Path(dir, "LATEST"))

  private def writeLatest(spark: SparkSession, dir: String, v: Int): Unit = {
    val f = fs(spark, dir)
    val tmp = new Path(dir, s"LATEST.tmp.$v")
    val out = f.create(tmp, true)
    try out.write(v.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    val dst = new Path(dir, "LATEST")
    f.delete(dst, false)
    require(f.rename(tmp, dst), s"failed to commit LATEST at $dir")
  }

  /** Catalog name for a version's bands table: derived from the index
    * path so concurrent indexes in one session never collide. */
  private def bandsTableName(dir: String, v: Int): String =
    f"graft_mhidx_${Integer.toHexString(dir.hashCode)}%s_v$v%05d"

  /** The bands table, catalog-registered CLUSTERED BY (band, bucket) so
    * probe joins leave the index side unshuffled. Re-attaches the
    * bucket spec in a fresh session via CREATE TABLE … LOCATION; falls
    * back to a plain parquet read (correct, one extra Exchange) if the
    * catalog refuses. */
  private def readBands(spark: SparkSession, dir: String, v: Int,
                        cfg: Config): DataFrame = {
    val path = s"${versionDir(dir, v)}/bands"
    val t = bandsTableName(dir, v)
    try {
      if (!spark.catalog.tableExists(t)) {
        val cols = spark.read.parquet(path).schema.fields
          .map(f => s"`${f.name}` ${f.dataType.sql}").mkString(", ")
        spark.sql(s"CREATE TABLE `$t` ($cols) USING parquet " +
          s"CLUSTERED BY (band, bucket) SORTED BY (band, bucket) " +
          s"INTO ${cfg.nBuckets} BUCKETS LOCATION '$path'")
      }
      spark.table(t)
    } catch { case scala.util.control.NonFatal(_) => spark.read.parquet(path) }
  }

  // ------------------------------------------------------------------
  // Build / probe / append
  // ------------------------------------------------------------------

  /** Build v1 of the index over `corpus`. One shingle scan feeds all
    * three tables (persisted, like [[Dedup.minhashDupPairs]]'s). */
  def build(spark: SparkSession, corpus: DataFrame, id: String, text: String,
            dir: String, cfg: Config = Config()): Unit = {
    val sh = Dedup.shingles(corpus, id, text, cfg.k).persist()
    val dfTab = sh.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
    val hot = dfTab.filter(col("df") > cfg.maxShingleDf).select("shingle")
    val capped = sh.join(broadcast(hot), Seq("shingle"), "left_anti")
    val bands = Dedup.lshBands(
      Dedup.minhashSignaturesFrom(capped, id, cfg.numPerms),
      id, cfg.nBands, cfg.bandRows)
    val vd = versionDir(dir, 1)
    sh.write.mode("overwrite").parquet(s"$vd/shingles")
    dfTab.write.mode("overwrite").parquet(s"$vd/df")
    Bucketing.writeBucketedAt(bands, bandsTableName(dir, 1), cfg.nBuckets,
      Seq("band", "bucket"), s"$vd/bands")
    sh.unpersist()
    writeLatest(spark, dir, 1)
  }

  /** Everything one ingest needs: the verified pairs plus the three
    * updated tables (lazy — materialized only if the caller appends). */
  private final case class Probe(pairs: DataFrame, newShingles: DataFrame,
                                 newDf: DataFrame, newBands: DataFrame)

  /**
   * The one-sided probe against index version `v`, mirroring
   * [[Dedup.minhashIncremental]] step for step — every hash, cap and
   * verification runs through the same private helpers, which is what
   * makes the pair sets (including jaccard doubles) identical.
   */
  private def probe(spark: SparkSession, dir: String, v: Int,
                    batch: DataFrame, id: String, text: String,
                    cfg: Config): Probe = {
    val vd = versionDir(dir, v)
    val corpusSh = spark.read.parquet(s"$vd/shingles")
    val corpusDf = spark.read.parquet(s"$vd/df")
    val corpusBands = readBands(spark, dir, v, cfg)

    val batchSh = Dedup.shingles(batch, id, text, cfg.k).persist()
    val batchDf = batchSh.groupBy(col("shingle")).agg(count(lit(1)).as("bdf"))

    // combined df decides hotness; cdf detects the newly-hot subset
    val combined = corpusDf.withColumnRenamed("df", "cdf")
      .join(batchDf, Seq("shingle"), "full_outer")
      .select(col("shingle"),
        (coalesce(col("cdf"), lit(0L)) + coalesce(col("bdf"), lit(0L))).as("df"),
        coalesce(col("cdf"), lit(0L)).as("cdf"))
    val hot = combined.filter(col("df") > cfg.maxShingleDf)
      .select(col("shingle"), col("cdf")).persist()
    val hotShingles = hot.select("shingle")
    val newlyHot = hot.filter(col("cdf") <= cfg.maxShingleDf).select("shingle")

    // corpus docs whose capped set changed — bands recomputed from the
    // persisted shingle table (still no corpus-text read). `affected`
    // is bounded by the newly-hot shingles' (≤cap) memberships — tiny,
    // usually empty — so it BROADCASTS: the corpus-sized band and
    // shingle tables are filtered in place, never shuffled by doc id.
    val affected = corpusSh.join(broadcast(newlyHot), Seq("shingle"))
      .select(col(id)).distinct().persist()
    val keptBands = corpusBands.join(broadcast(affected), Seq(id), "left_anti")
    val affectedSh = corpusSh.join(broadcast(affected), Seq(id), "left_semi")
      .join(broadcast(hotShingles), Seq("shingle"), "left_anti")
    val recomputedBands = Dedup.lshBands(
      Dedup.minhashSignaturesFrom(affectedSh, id, cfg.numPerms),
      id, cfg.nBands, cfg.bandRows)

    val batchCapped = batchSh.join(broadcast(hotShingles), Seq("shingle"), "left_anti")
    val batchBands = Dedup.lshBands(
      Dedup.minhashSignaturesFrom(batchCapped, id, cfg.numPerms),
      id, cfg.nBands, cfg.bandRows).persist()

    // one-sided LSH probe: every candidate pair touches the batch. The
    // join is split so the corpus-sized side is the BUCKETED bands
    // scan joined directly on its (band, bucket) clustering — the
    // index side is never re-shuffled per ingest (the batch side
    // broadcasts or shuffles to the bucket count); only the
    // batch-scale fresh bands take the second, tiny join.
    val freshBands = recomputedBands.unionByName(batchBands)
    val r = batchBands.select(col(id).as("b"), col("band"), col("bucket"))
    val candidates =
      keptBands.select(col(id).as("a"), col("band"), col("bucket"))
        .join(r, Seq("band", "bucket"))
        .unionByName(
          freshBands.select(col(id).as("a"), col("band"), col("bucket"))
            .join(r, Seq("band", "bucket")))
        .filter(col("a") =!= col("b"))
        .select(least(col("a"), col("b")).as("a"),
          greatest(col("a"), col("b")).as("b"))
        .distinct().persist()

    // exact-Jaccard verification over capped sets, restricted to
    // candidate docs BEFORE the per-doc set aggregation — candidate
    // ids are batch-scale, so the restriction broadcasts and verify
    // work is candidate-sized, never corpus-sized
    val candIds = candidates.select(col("a").as(id))
      .unionByName(candidates.select(col("b").as(id))).distinct()
    val shCand = corpusSh.unionByName(batchSh)
      .join(broadcast(candIds), Seq(id), "left_semi")
      .join(broadcast(hotShingles), Seq("shingle"), "left_anti")
    val pairs = Dedup.verifyJaccard(shCand, id, candidates, cfg.minJ)

    Probe(pairs,
      newShingles = corpusSh.unionByName(batchSh),
      newDf = combined.select(col("shingle"), col("df")),
      newBands = keptBands.unionByName(freshBands))
  }

  /** Near-dup pairs of `batch` against the indexed corpus (and within
    * itself): (a, b, jaccard), a < b, at least one side in the batch —
    * exactly [[Dedup.minhashIncremental]]'s output. Read-only: the
    * index is not modified (see [[appendToIndex]] / [[ingest]]). */
  def incrementalDupPairs(spark: SparkSession, dir: String, batch: DataFrame,
                          id: String, text: String,
                          cfg: Config = Config()): DataFrame =
    probe(spark, dir, latestVersion(spark, dir), batch, id, text, cfg).pairs

  /** Fold `batch` into the index: writes version n+1 (shingles ∪ batch,
    * combined df, bands with the newly-hot recompute applied) and flips
    * LATEST. Returns the new version. After this, the index state is
    * IDENTICAL to [[build]] over corpus ∪ batch (asserted table-for-
    * table in IndexSpec) — appends never drift from a fresh build. */
  def appendToIndex(spark: SparkSession, dir: String, batch: DataFrame,
                    id: String, text: String,
                    cfg: Config = Config()): Int = {
    val v = latestVersion(spark, dir)
    val p = probe(spark, dir, v, batch, id, text, cfg)
    val vd = versionDir(dir, v + 1)
    p.newShingles.write.mode("overwrite").parquet(s"$vd/shingles")
    p.newDf.write.mode("overwrite").parquet(s"$vd/df")
    Bucketing.writeBucketedAt(p.newBands, bandsTableName(dir, v + 1),
      cfg.nBuckets, Seq("band", "bucket"), s"$vd/bands")
    writeLatest(spark, dir, v + 1)
    v + 1
  }

  /** Probe + append in one pass (the continuous-ingest loop body): the
    * returned pairs are materialized BEFORE the new version commits, so
    * a crash mid-ingest never leaves pairs emitted against an index
    * that doesn't contain them. */
  def ingest(spark: SparkSession, dir: String, batch: DataFrame,
             id: String, text: String, cfg: Config = Config()): DataFrame = {
    val v = latestVersion(spark, dir)
    val p = probe(spark, dir, v, batch, id, text, cfg)
    val pairs = p.pairs.persist()
    pairs.count() // materialize against v before v+1 commits
    val vd = versionDir(dir, v + 1)
    p.newShingles.write.mode("overwrite").parquet(s"$vd/shingles")
    p.newDf.write.mode("overwrite").parquet(s"$vd/df")
    Bucketing.writeBucketedAt(p.newBands, bandsTableName(dir, v + 1),
      cfg.nBuckets, Seq("band", "bucket"), s"$vd/bands")
    writeLatest(spark, dir, v + 1)
    pairs
  }
}
