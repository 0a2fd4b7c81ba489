package graft

import graft.operators.{Dedup, MinhashIndex}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Self-stress harness for the dedup/index family at ~10× the driver's
 * bench scale (run against tools/gen_stress_corpus.py output) — the
 * canary for superlinear surprises (pair-space blowups, band-table
 * file-count growth, hot-shingle array growth) before any larger SF.
 * Prints ONE JSON line: per-query seconds + the health metrics that
 * would go superlinear first. Not part of the driver contract; the
 * artifact is committed as STRESS_r{N}.json.
 *
 * Usage: Test/runMain graft.StressBench <corpusDir>
 */
object StressBench {
  private def loadAvg(): Seq[Double] = {
    val s = scala.io.Source.fromFile("/proc/loadavg").mkString.split(" ")
    s.take(3).map(_.toDouble).toSeq
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_stress")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$dir/documents.parquet").persist()
    val nDocs = docs.count()
    val loadBefore = loadAvg()

    val times = scala.collection.mutable.LinkedHashMap[String, Double]()
    val health = scala.collection.mutable.LinkedHashMap[String, Long]()
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val x = f
      times(tag) = (System.nanoTime() - t0) / 1e9
      x
    }

    health("n_docs") = nDocs
    health("exact_dup_groups") = time("dedup_exact") {
      Dedup.exact(docs, "doc_id", "text")
        .filter(col("n_copies") > 1).count()
    }
    val pairs = time("dedup_minhash") {
      val p = Dedup.minhashDupPairs(docs, "doc_id", "text").persist()
      val n = p.count(); health("minhash_pairs") = n; p
    }
    time("dedup_components") {
      health("components") =
        Dedup.connectedComponents(pairs).select("component").distinct().count()
    }
    pairs.unpersist()

    // index lifecycle at stress scale: build over 90%, ingest 2×5%
    // batches, then steady-state probe — the continuous-ingest shape
    val idx = java.nio.file.Files.createTempDirectory("graft_stress_idx")
      .toString + "/idx"
    val b1 = docs.filter(col("doc_id") % 20 === 0)
    val b2 = docs.filter(col("doc_id") % 20 === 1)
    val b3 = docs.filter(col("doc_id") % 20 === 2)
    val base = docs.filter(col("doc_id") % 20 >= 3)
    time("idx_build")(MinhashIndex.build(spark, base, "doc_id", "text", idx))
    time("idx_ingest_1") {
      val p = MinhashIndex.ingest(spark, idx, b1, "doc_id", "text")
      health("idx_ingest1_pairs") = p.count(); p.unpersist()
    }
    time("idx_ingest_2") {
      val p = MinhashIndex.ingest(spark, idx, b2, "doc_id", "text")
      health("idx_ingest2_pairs") = p.count(); p.unpersist()
    }
    // probe a batch the index has NOT ingested — probing an indexed
    // batch would double its docs in the verification set and time a
    // workload production never runs
    time("idx_probe_steady") {
      MinhashIndex.incrementalDupPairs(spark, idx, b3, "doc_id", "text").count()
    }

    // the metrics that would grow superlinearly if the shape is wrong
    val latest = MinhashIndex.latestVersion(spark, idx)
    def countFiles(p: String): Long = {
      val d = new java.io.File(p)
      if (!d.exists) -1 else d.listFiles.count(_.getName.endsWith(".parquet")).toLong
    }
    health("band_files_latest") = countFiles(f"$idx/v$latest%05d/bands")
    health("hot_shingles") =
      spark.read.parquet(f"$idx/v$latest%05d/hot").count()
    health("df_rows") = spark.read.parquet(f"$idx/v$latest%05d/df").count()

    val q = times.map { case (k, v) => s""""$k":${f"$v%.3f"}""" }.mkString(",")
    val h = health.map { case (k, v) => s""""$k":$v""" }.mkString(",")
    val la = (loadBefore ++ loadAvg()).map(v => f"$v%.2f").mkString(",")
    println(s"""{"metric":"stress_total","value":${f"${times.values.sum}%.3f"},""" +
      s""""unit":"sec","queries":{$q},"health":{$h},"loadavg":[$la],""" +
      s""""corpus":"$dir"}""")
    spark.stop()
  }
}
