package graft.sources

import graft.Slice
import org.apache.spark.sql.{DataFrame, Encoder, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Sources — slice constructors (reference: Const slice.go:212-290,
 * ReaderFunc slice.go:292-402, ScanReader scan.go:22-69,
 * tarslice archive/tarslice/tarslice.go:29-74).
 *
 * Spark-first: file sources go through `spark.read` (splittable,
 * predicate-pushdown-capable, strictly better than the reference's
 * striped re-reading readers); programmatic sources through
 * `spark.range(nshard).flatMap` so per-shard generator state lives on
 * executors, never the driver.
 */
object Sources {

  /** In-memory literal table split into nshard shards (≅ Const,
    * slice.go:212-290). Driver-held by definition — for tests/small dims. */
  def const[T: Encoder](spark: SparkSession, nshard: Int, rows: Seq[T]): Slice =
    Slice(spark.createDataset(rows).repartition(nshard).toDF())

  /**
   * Custom programmatic source (≅ ReaderFunc, slice.go:292-402): one
   * generator invocation per shard, distributed — `spark.range` with
   * exactly nshard partitions puts shard i's generation on an executor.
   * The reference's vectorized (int, error) protocol collapses to a
   * plain Iterator; Spark handles batching (WholeStageCodegen) itself.
   */
  def readerFunc[T: Encoder](spark: SparkSession, nshard: Int)(
      gen: Int => Iterator[T]): Slice = {
    import spark.implicits._
    Slice(spark.range(0, nshard, 1, nshard)
      .flatMap(shard => gen(shard.toInt)).toDF())
  }

  /** Text-file source, one string column of lines (≅ ScanReader,
    * scan.go:22-69). spark.read.text is splittable — each shard reads
    * only its split, unlike the reference's skip-striping re-reads. */
  def scanReader(spark: SparkSession, path: String): Slice =
    Slice(spark.read.text(path))  // column: value STRING

  /** Parquet source (the corpus format; supersedes the reference's gob
    * cache files). Filters/projections push down to row groups. */
  def readParquet(spark: SparkSession, path: String): Slice =
    Slice(spark.read.parquet(path))

  def readCsv(spark: SparkSession, path: String, header: Boolean = true): Slice =
    Slice(spark.read.option("header", header.toString).csv(path))

  def readJson(spark: SparkSession, path: String): Slice =
    Slice(spark.read.json(path))

  /**
   * Tar-archive source (≅ tarslice.Reader,
   * archive/tarslice/tarslice.go:29-74): one task per archive, entries
   * STREAMED off an executor-side Hadoop input stream — the archive is
   * never materialized in memory and there is no size cap (the old
   * binaryFile formulation buffered the whole archive and inherited its
   * 2 GiB limit; the reference streams too, tarslice.go:58-66). Only
   * one ENTRY body is held at a time (inherent to row-shaped output).
   * Output: (file STRING, name STRING, size LONG, body BINARY). Uses
   * commons-compress (ships with Spark). The driver touches file NAMES
   * only (glob listing — the same metadata walk every file source does).
   */
  def readTar(spark: SparkSession, glob: String): Slice = {
    import spark.implicits._
    val sc = spark.sparkContext
    val hconf = new org.apache.spark.util.SerializableConfiguration(
      sc.hadoopConfiguration)
    val p = new org.apache.hadoop.fs.Path(glob)
    val paths = Option(p.getFileSystem(sc.hadoopConfiguration).globStatus(p))
      .getOrElse(Array.empty).filter(_.isFile).map(_.getPath.toString).toSeq
    val out = spark
      .createDataset(sc.parallelize(paths, math.max(paths.length, 1)))
      .flatMap { pathStr =>
        val fp = new org.apache.hadoop.fs.Path(pathStr)
        val in = new org.apache.commons.compress.archivers.tar.TarArchiveInputStream(
          new java.io.BufferedInputStream(
            fp.getFileSystem(hconf.value).open(fp), 256 * 1024))
        Option(org.apache.spark.TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit] { _ =>
            try in.close() catch { case _: java.io.IOException => } })
        Iterator.continually(in.getNextEntry).takeWhile(_ != null)
          .filter(_.isFile)
          .map { e =>
            // body read fully BEFORE the iterator advances to the next
            // entry (lazy flatMap: the consumer pulls one row at a time)
            val buf = new java.io.ByteArrayOutputStream(
              math.max(e.getSize.toInt, 64))
            val tmp = new Array[Byte](64 * 1024)
            var n = in.read(tmp)
            while (n > 0) { buf.write(tmp, 0, n); n = in.read(tmp) }
            (pathStr, e.getName, e.getSize, buf.toByteArray)
          }
      }.toDF("file", "name", "size", "body")
    Slice(out)
  }
}
