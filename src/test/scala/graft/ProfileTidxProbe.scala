package graft

import graft.operators.{Sampling, TermIndex, Terms}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler (not a suite member): per-run timing + Spark job
  * count for the persisted-BM25 probe at a given SF dir — the
  * decomposition behind the q_bm25_topk_idx bench number. */
object ProfileTidxProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = Tables.load(spark, dir, "documents")
    val isProbe =
      Sampling.hashBucket(col("doc_id")) < lit(Sampling.cuts(Seq(0.05))(1))
    val cfg = TermIndex.Config(buckets = 8, termsTag = "bigram",
      maxCandidateFraction = TermIndex.ExactUnbounded)
    val idx = java.nio.file.Files.createTempDirectory("graft_tidx_prof")
      .toString + "/idx"
    var jobs = 0
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            s: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs += 1
      })
    def time[T](tag: String)(f: => T): T = {
      val j0 = jobs
      val t0 = System.nanoTime()
      val x = f
      println(f"$tag%-16s ${(System.nanoTime() - t0) / 1e9}%7.2fs  " +
        f"jobs ${jobs - j0}%3d")
      x
    }
    time("build")(TermIndex.build(spark, d.filter(!isProbe), "doc_id",
      "text", idx, cfg, Terms.bigramTerms))
    val probes = d.filter(isProbe)
    // classic-plan twin (the pre-max-score shape): scan all probe
    // buckets, join probe terms + idf slice, score and rank everything
    // — the same-box baseline the pruned path is judged against
    def classic(): Long = {
      val probeTerms = probes.select(col("doc_id").as("probe_id"),
          explode(array_distinct(Terms.bigramTerms(col("text")))).as("tok"))
        .persist()
      val bkts = probeTerms
        .select(pmod(xxhash64(col("tok")), lit(cfg.buckets.toLong))
          .cast("int").as("b"))
        .distinct().collect().map(_.getInt(0)).toSeq
      val seg = TermIndex.readManifest(spark, idx, 1).head
      val tf = spark.read
        .parquet(s"$idx/segments/${seg._1}/tf")
        .filter(col("bkt").isin(bkts: _*))
      val n = seg._2
      val tt = seg._3
      val vocab = probeTerms.select("tok").distinct()
      val idfSlice = tf.groupBy("tok").agg(count(lit(1)).as("df"))
        .join(broadcast(vocab), "tok")
        .withColumn("n", lit(n))
        .select(col("tok"),
          expr("cast(length(bin((2*n - 2*df + 1) div (2*df + 1) + 1)) - 1 as bigint)")
            .as("idf_q"))
      val out = graft.operators.Terms.bm25ScoreRank(tf
        .join(broadcast(probeTerms), "tok")
        .join(broadcast(idfSlice), "tok")
        .withColumn("n", lit(n))
        .withColumn("tt", lit(tt)), 5).collect()
      probeTerms.unpersist(blocking = false)
      out.length.toLong
    }
    (1 to 3).foreach { i =>
      spark.catalog.clearCache()
      time(s"pruned  run$i")(TermIndex.topK(spark, idx, probes, "doc_id",
        "text", 5, cfg, Terms.bigramTerms).collect())
      val (ok, fb) = TermIndex.lastMaxScoreDecision
      println(s"  pruned=$ok fallback=$fb")
      spark.catalog.clearCache()
      time(s"classic run$i")(classic())
    }
    spark.stop()
  }
}
