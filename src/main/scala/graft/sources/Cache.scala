package graft.sources

import graft.Slice
import org.apache.spark.sql.{Encoders, Row, SparkSession}
import java.nio.file.{Files, Paths}

/**
 * Cache family (reference: Cache/CachePartial cache.go:32-95,
 * internal/slicecache/slicecache.go:36-119).
 *
 *  - [[cache]]: all-or-nothing materialization, parquet-backed — the
 *    scalable path (columnar, splittable, readable by any engine).
 *  - [[cachePartial]]: per-shard reuse — cached shards are read back,
 *    missing shards recomputed and written. Spark's lazy partition
 *    iterators mean a cached shard's upstream narrow work is skipped
 *    (shuffle map sides still run, as in the reference where the
 *    shuffle already happened upstream). Same nondeterminism caveat as
 *    the reference (cache.go:56-61).
 */
object Cache {

  private def successMarker(dir: String) = Paths.get(dir, "_GRAFT_CACHE_OK")

  /** Materialize to `dir` as parquet; short-circuit to a read when the
    * cache is complete (≅ Cache, cache.go:32-49). */
  def cache(s: Slice, dir: String): Slice = {
    if (!Files.exists(successMarker(dir))) {
      s.df.write.mode("overwrite").parquet(dir)
      Files.createFile(successMarker(dir))
    }
    Slice(s.spark.read.parquet(dir), s.prefix)
  }

  /** Read-only view of an existing cache (≅ ReadCache, cache.go:86-95). */
  def readCache(spark: SparkSession, dir: String, prefix: Int = 1): Slice =
    Slice(spark.read.parquet(dir), prefix)

  /**
   * Hive-style partitioned parquet layout (`dir/col=value/…`) — the
   * 100 TB table organization: queries filtering on the partition
   * column prune whole directories at planning time (PartitionFilters
   * in the scan; asserted in PlanSpec). The reference has no
   * partitioned storage at all — its cache shards are opaque
   * `prefix-NNNN-of-MMMM` files (slicecache.go:36-50).
   */
  def writePartitioned(s: Slice, dir: String, partCols: Seq[String]): Unit =
    s.df.write.mode("overwrite").partitionBy(partCols: _*).parquet(dir)

  def readPartitioned(spark: SparkSession, dir: String, prefix: Int = 1): Slice =
    Slice(spark.read.parquet(dir), prefix)

  /**
   * Per-shard cache with partial reuse (≅ CachePartial, cache.go:51-66).
   * Shard i ↔ file `part-IIII-of-MMMM.bin` (Java-serialized Row batches —
   * an internal format, like the reference's gob shards). Each task
   * either replays its file or computes+writes it. Exact per-shard
   * semantics require a stable partition count: pin with reshard()
   * upstream if the lineage isn't deterministic.
   */
  def cachePartial(s: Slice, dir: String): Slice = {
    Files.createDirectories(Paths.get(dir))
    val m = s.df.rdd.getNumPartitions
    val schema = s.df.schema
    implicit val enc: org.apache.spark.sql.Encoder[Row] = Encoders.row(schema)
    val dirB = dir
    val out = s.df.mapPartitions { it =>
      val shard = org.apache.spark.TaskContext.getPartitionId()
      val f = Paths.get(dirB, f"part-$shard%04d-of-$m%04d.bin")
      if (Files.exists(f)) {
        // replay cached shard; upstream iterator never consumed (lazy)
        val in = new java.io.ObjectInputStream(Files.newInputStream(f))
        val n = in.readInt()
        val rows = Array.fill(n)(in.readObject().asInstanceOf[Row])
        in.close()
        rows.iterator
      } else {
        val rows = it.toArray
        val tmp = Files.createTempFile(Paths.get(dirB), s"part-$shard", ".tmp")
        val os = new java.io.ObjectOutputStream(Files.newOutputStream(tmp))
        os.writeInt(rows.length); rows.foreach(os.writeObject); os.close()
        try Files.move(tmp, f, java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        catch { case _: java.nio.file.FileAlreadyExistsException => Files.delete(tmp) }
        rows.iterator
      }
    }
    Slice(out, s.prefix)
  }
}
