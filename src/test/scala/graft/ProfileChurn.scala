package graft

import graft.operators.IvfIndex
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler (not a suite member): per-commit cost of IVF CDC
  * churn as a function of LIST COUNT at fixed corpus/batch size — the
  * decomposition behind STRESS_r09's ivf_cdc_churn scaling (≈3.4× per
  * 10× data ≈ √10, the post-retrain nList=⌈√n⌉ growth law). Builds the
  * index at nList=16, times K churn commits, then retrains to ⌈√n⌉
  * lists and times K more: same corpus, same batch, only the
  * partition-dir fan-out of the segment write changes. */
object ProfileChurn {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_stress_500k")
    val commits = args.lift(1).map(_.toInt).getOrElse(4)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("graft.ivf.profile", "true")
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
    val dim = 64
    val toks = split(col("text"), "\\s+")
    val fvec = array((0 until dim).map(b =>
      size(filter(toks, t => pmod(xxhash64(t), lit(dim.toLong)) === b))
        .cast("float")): _*)
    val emb = docs.select(col("doc_id").as("vec_id"), fvec.as("embedding"))
      .persist()
    println(s"corpus rows: ${emb.count()}")
    val ivfDir = java.nio.file.Files.createTempDirectory("graft_prof_churn")
      .toString + "/idx"
    val cfg = IvfIndex.Config(dim = dim, nList = 16, iters = 2,
      maxSegments = 3)
    time("build nList=16")(
      IvfIndex.build(spark, emb, "vec_id", "embedding", ivfDir, cfg))
    val churn = emb.filter(col("vec_id") % 50 === 13)
    println(s"churn batch rows: ${churn.count()}")
    def commitRound(tag: String): Unit = (1 to commits).foreach { i =>
      val ups = if (i % 2 == 0) churn
        else churn.select(col("vec_id"),
          transform(col("embedding"), x => -x).as("embedding"))
      time(s"$tag commit$i") {
        IvfIndex.applyCdc(spark, ivfDir, ups,
          churn.select("vec_id").limit(0), "vec_id", "embedding", cfg)
        IvfIndex.gc(spark, ivfDir, retainLast = 2)
      }
    }
    commitRound("nList=16 ")
    time("retrain -> sqrt(n)")(IvfIndex.retrain(spark, ivfDir, cfg))
    val lists = IvfIndex.readCentroids(spark, ivfDir,
      IvfIndex.latestVersion(spark, ivfDir)).length
    println(s"lists after retrain: $lists")
    commitRound(s"nList=$lists")
    spark.stop()
  }
}
