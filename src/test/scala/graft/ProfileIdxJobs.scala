package graft

import graft.operators.{MinhashIndex, Sampling}
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler: per-Spark-job wall times inside one steady-state
  * index probe (what the driver's dedup_incremental_idx bench times). */
object ProfileIdxJobs {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = Tables.load(spark, dir, "documents")
    val cut = Sampling.cuts(Seq(0.9))(1)
    val isNew = Sampling.hashBucket(col("doc_id")) >= lit(cut)
    val idx = java.nio.file.Files.createTempDirectory("graft_mhidx_pj").toString
    MinhashIndex.build(spark, d.filter(!isNew), "doc_id", "text", idx,
      MinhashIndex.Config())
    // warm
    MinhashIndex.incrementalDupPairs(spark, idx, d.filter(isNew),
      "doc_id", "text", MinhashIndex.Config()).count()
    spark.catalog.clearCache()

    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val lines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        starts.put(j.jobId, (System.nanoTime(),
          j.stageInfos.map(s => s"${s.name.takeWhile(_ != '\n').take(60)}[${s.numTasks}]")
            .mkString(" | ")))
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        val (t0, desc) = starts.getOrDefault(j.jobId, (0L, "?"))
        lines.add(f"job ${j.jobId}%3d ${(System.nanoTime() - t0) / 1e9}%7.3fs  $desc")
      }
    })
    val t0 = System.nanoTime()
    MinhashIndex.incrementalDupPairs(spark, idx, d.filter(isNew),
      "doc_id", "text", MinhashIndex.Config()).count()
    val total = (System.nanoTime() - t0) / 1e9
    Thread.sleep(500)
    lines.forEach(println)
    println(f"TOTAL probe $total%7.3fs")
    spark.stop()
  }
}
