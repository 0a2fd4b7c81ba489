package graft

import graft.operators.TermIndex
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler (not a suite member): per-PHASE decomposition of
  * one `tidx_cdc_churn` commit — the largest absolute line in the
  * stress artifact (~8 s/commit at 500k). Reproduces the stress
  * harness's exact setup (build + 8 appends + in-loop compaction at
  * maxSegments=3, the 2%-churn applyCdc loop with per-commit gc) with
  * `graft.tidx.profile=true`, so every commit prints its
  * tombstone-write / live-delta / segment-write / fold-tf / fold-df /
  * fold-docs-stats / fold-rebase / manifest split — BENCH_NOTES
  * adjudication data, not guesswork. */
object ProfileTidxChurn {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_stress_500000")
    val commits = args.lift(1).map(_.toInt).getOrElse(12)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("graft.tidx.profile", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
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
      println(f"$tag%-24s ${(System.nanoTime() - t0) / 1e9}%7.2fs  " +
        f"jobs ${jobs - j0}%3d")
      x
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text")).persist()
    println(s"corpus rows: ${docs.count()}")
    val tidxDir = java.nio.file.Files
      .createTempDirectory("graft_prof_tchurn").toString + "/idx"
    // the stress harness's exact configuration (deliberate exact
    // self-churn — gate off, as in StressBench)
    val tCfg = TermIndex.Config(buckets = 32, maxSegments = 3,
      maxCandidateFraction = TermIndex.ExactUnbounded)
    time("build")(TermIndex.build(spark,
      docs.filter(col("doc_id") % 20 >= 8), "doc_id", "text", tidxDir, tCfg))
    (0 until 8).foreach { i =>
      time(s"append_${i + 1}") {
        TermIndex.append(spark, tidxDir,
          docs.filter(col("doc_id") % 20 === i), "doc_id", "text", tCfg)
        TermIndex.gc(spark, tidxDir, retainLast = 2)
      }
    }
    val churn = docs.filter(col("doc_id") % 50 === 13)
    println(s"churn batch rows: ${churn.count()}")
    (1 to commits).foreach { i =>
      val ups = churn.select(col("doc_id"),
        concat_ws(" ", lit(s"churn$i"), col("text")).as("text"))
      time(s"churn_commit_$i") {
        TermIndex.applyCdc(spark, tidxDir, ups,
          churn.select("doc_id").limit(0), "doc_id", "text", tCfg)
        TermIndex.gc(spark, tidxDir, retainLast = 2)
      }
    }
    docs.unpersist()
    spark.stop()
  }
}
