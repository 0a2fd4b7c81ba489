package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/**
 * Shared versioned-directory plumbing for the persisted indexes
 * ([[MinhashIndex]], [[IvfIndex]]): immutable `v00001/`-style version
 * directories committed by an atomically-renamed `LATEST` pointer,
 * plus a `FORMAT` marker so a layout revision fails with "rebuild"
 * instead of a raw parquet path error. Works on any Hadoop filesystem
 * (rename is atomic on HDFS/local; on S3 keep the markers in a
 * manifest store).
 *
 * Reference analogue: the cache-validity discipline of
 * /root/reference/cache.go:51-66 — persisted state answers what it
 * can, is never trusted across an incompatible layout change, and is
 * swapped in atomically.
 */
private[graft] object VersionedLayout {

  def fs(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  def versionDir(dir: String, v: Int): String =
    f"${dir.stripSuffix("/")}/v$v%05d"

  def readSmall(f: FileSystem, p: Path): String = {
    val in = f.open(p)
    try new String(org.apache.commons.io.IOUtils.toByteArray(in),
      java.nio.charset.StandardCharsets.UTF_8).trim
    finally in.close()
  }

  /** tmp + rename so a crash mid-write never leaves a partial marker
    * visible (a 0-length FORMAT would poison every later read). */
  def atomicWrite(f: FileSystem, dst: Path, content: String): Unit = {
    val tmp = new Path(dst.getParent, s"${dst.getName}.tmp.${content.hashCode}")
    val out = f.create(tmp, true)
    try out.write(content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    f.delete(dst, false)
    require(f.rename(tmp, dst), s"failed to commit $dst")
  }

  /** True if `dir` holds a committed index. */
  def exists(spark: SparkSession, dir: String): Boolean =
    fs(spark, dir).exists(new Path(dir, "LATEST"))

  /** Current committed version from the LATEST pointer, after
    * validating the FORMAT marker against `format` (indexes without a
    * FORMAT marker are format 1). */
  def latestVersion(spark: SparkSession, dir: String, format: Int,
                    what: String): Int = {
    val f = fs(spark, dir)
    val p = new Path(dir, "LATEST")
    require(f.exists(p), s"no $what at $dir (missing LATEST)")
    val fmt = new Path(dir, "FORMAT")
    val fmtV = if (!f.exists(fmt)) 1 else readSmall(f, fmt).toInt
    require(fmtV == format,
      s"$what at $dir has layout format $fmtV; this build reads format " +
        s"$format — rebuild the index from the corpus")
    readSmall(f, p).toInt
  }

  /** Commit version `v`: FORMAT written once, then LATEST flipped
    * last — concurrent readers of the previous version are never
    * disturbed, and a crash before the flip leaves the index
    * untouched. */
  def commitLatest(spark: SparkSession, dir: String, v: Int,
                   format: Int): Unit = {
    val f = fs(spark, dir)
    val fmt = new Path(dir, "FORMAT")
    if (!f.exists(fmt)) atomicWrite(f, fmt, format.toString)
    atomicWrite(f, new Path(dir, "LATEST"), v.toString)
  }
}
