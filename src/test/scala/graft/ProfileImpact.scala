package graft

import graft.operators.{TermIndex, Terms}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler (not a suite member): document-shaped probe cost
  * against the persisted BM25 index — the tidx_probe_steady shape from
  * StressBench — decomposed around the round-10 quantized-impact tier
  * (tier 1.5). Prints probe seconds, job count, pruned/fallback
  * engagement, and asserts pair-equality with the inline scorer. */
object ProfileImpact {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_stress_50k")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("graft.tidx.profile", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$dir/documents.parquet").persist()
    println(s"corpus rows: ${docs.count()}")
    var jobs = 0
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            s: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs += 1
      })
    def time[T](tag: String)(f: => T): T = {
      val j0 = jobs; val t0 = System.nanoTime()
      val x = f
      println(f"$tag%-20s ${(System.nanoTime() - t0) / 1e9}%7.2fs  " +
        f"jobs ${jobs - j0}%3d")
      x
    }
    val tidxDir = java.nio.file.Files
      .createTempDirectory("graft_prof_impact").toString + "/idx"
    val tCfg = TermIndex.Config(buckets = 32, maxSegments = 3)
    time("build")(
      TermIndex.build(spark, docs, "doc_id", "text", tidxDir, tCfg))
    val tProbes = docs.filter(col("doc_id") < 50)
    val idxPairs = time("probe_steady") {
      TermIndex.topK(spark, tidxDir, tProbes, "doc_id", "text", 5, tCfg)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSet
    }
    println(s"pruned=${TermIndex.lastMaxScoreDecision._1} " +
      s"fallback=${TermIndex.lastMaxScoreDecision._2}")
    // second probe (warm paths, the steady-state number)
    time("probe_steady_2") {
      TermIndex.topK(spark, tidxDir, tProbes, "doc_id", "text", 5, tCfg)
        .count()
    }
    val inlinePairs = time("inline_equiv") {
      Terms.bm25TopK(docs, tProbes, "doc_id", "text", k = 5)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSet
    }
    println(s"pair_equal=${idxPairs == inlinePairs}")
    spark.stop()
  }
}
