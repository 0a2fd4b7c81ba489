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
   * archive/tarslice/tarslice.go:29-74): binaryFile scan + executor-side
   * tar expansion. Output: (file STRING, name STRING, size LONG,
   * body BINARY). Uses commons-compress (ships with Spark).
   */
  def readTar(spark: SparkSession, glob: String): Slice = {
    import spark.implicits._
    val files = spark.read.format("binaryFile").load(glob)
      .select(col("path"), col("content"))
    val out = files.as[(String, Array[Byte])].flatMap { case (path, bytes) =>
      val in = new org.apache.commons.compress.archivers.tar.TarArchiveInputStream(
        new java.io.ByteArrayInputStream(bytes))
      Iterator.continually(in.getNextEntry).takeWhile(_ != null)
        .filter(_.isFile)
        .map { e =>
          val buf = new java.io.ByteArrayOutputStream()
          val tmp = new Array[Byte](64 * 1024)
          var n = in.read(tmp)
          while (n > 0) { buf.write(tmp, 0, n); n = in.read(tmp) }
          (path, e.getName, e.getSize, buf.toByteArray)
        }.toSeq // drain while the stream is open
    }.toDF("file", "name", "size", "body")
    Slice(out)
  }
}
