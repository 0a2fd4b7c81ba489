package graft

import graft.operators.{Dedup, MinhashIndex, Sampling}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler (not a test suite member): stage timings for the
  * index-backed incremental probe at a given SF dir. */
object ProfileIdxProbe {
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
    val idx = java.nio.file.Files.createTempDirectory("graft_mhidx_prof").toString
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val x = f
      println(f"$tag%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
      x
    }
    time("build")(MinhashIndex.build(spark, d.filter(!isNew), "doc_id", "text",
      idx, MinhashIndex.Config()))
    // ---- manual probe decomposition (mirrors MinhashIndex.probe) ----
    locally {
      val cfg = MinhashIndex.Config()
      val vd = idx + "/v00001"
      val corpusDocs = spark.read.parquet(s"$vd/docs")
      val corpusDf = spark.read.parquet(s"$vd/df")
      val batch = d.filter(isNew)
      val batchDocs = Dedup.shingleArrays(batch, "doc_id", "text", cfg.k).persist()
      time("  batchDocs")(batchDocs.count())
      val batchDf = batchDocs.select(explode(col("sharr")).as("shingle"))
        .groupBy(col("shingle")).agg(count(lit(1)).as("bdf")).persist()
      time("  batchDf")(batchDf.count())
      val joint = corpusDf.join(broadcast(batchDf), Seq("shingle"))
        .select(col("shingle"), col("df"), col("bdf")).persist()
      time("  joint")(joint.count())
      val corpusHot = corpusDf.filter(col("df") > cfg.maxShingleDf).select("shingle")
      time("  corpusHot")(corpusHot.count())
      val newlyHot = joint.filter(col("df") <= cfg.maxShingleDf &&
        col("df") + col("bdf") > cfg.maxShingleDf).select("shingle").persist()
      time("  newlyHot.isEmpty")(if (newlyHot.isEmpty) 1 else 0)
      // full hot set (corpus-hot ∪ pushed-over-cap), as probe computes it
      val hot1r = corpusHot
        .unionByName(joint.filter(col("df") + col("bdf") > cfg.maxShingleDf)
          .select("shingle"))
        .distinct()
        .agg(collect_list(col("shingle")).as("hotarr")).persist()
      time("  hot1")(hot1r.count())
      val candDocs = corpusDocs.unionByName(batchDocs)
        .join(broadcast(batchDocs.select("doc_id")), Seq("doc_id"), "left_semi")
      time("  candDocs-ish scan")(candDocs.count())
      // bands side
      import graft.functions.MinhashFunctions.minhashSigF
      val capped = batchDocs.crossJoin(broadcast(hot1r))
        .select(col("doc_id"), array_except(col("sharr"), col("hotarr")).as("sharr"))
        .filter(size(col("sharr")) > 0)
      val batchBands = Dedup.lshBands(
        capped.select(col("doc_id"), minhashSigF(col("sharr"), 64).as("sig")),
        "doc_id", 32, 2).persist()
      time("  batchBands")(batchBands.count())
      val corpusBands = spark.read.parquet(s"$vd/bands")
      time("  corpusBands plain scan")(corpusBands.count())
      val r = batchBands.select(col("doc_id").as("b"), col("band"), col("bucket"))
      val cands = corpusBands.select(col("doc_id").as("a"), col("band"), col("bucket"))
        .join(r, Seq("band", "bucket"))
        .unionByName(batchBands.select(col("doc_id").as("a"), col("band"), col("bucket"))
          .join(r, Seq("band", "bucket")))
        .filter(col("a") =!= col("b"))
        .select(least(col("a"), col("b")).as("a"), greatest(col("a"), col("b")).as("b"))
        .distinct().persist()
      time("  candidates (plain scan)")(cands.count())
      val candIds = cands.select(col("a").as("doc_id"))
        .unionByName(cands.select(col("b").as("doc_id"))).distinct()
      val vdocs = corpusDocs.unionByName(batchDocs)
        .join(broadcast(candIds), Seq("doc_id"), "left_semi")
        .crossJoin(broadcast(hot1r))
        .select(col("doc_id"), array_except(col("sharr"), col("hotarr")).as("sharr"))
        .filter(size(col("sharr")) > 0)
      time("  verify")(Dedup.verifyJaccardArrays(vdocs, "doc_id", cands, 0.5).count())
      batchDocs.unpersist(); batchDf.unpersist(); joint.unpersist()
      newlyHot.unpersist(); hot1r.unpersist()
      spark.catalog.clearCache()
    }
    // warm probe (JIT, codegen cache)
    MinhashIndex.incrementalDupPairs(spark, idx, d.filter(isNew),
      "doc_id", "text", MinhashIndex.Config()).count()
    spark.catalog.clearCache()
    for (i <- 1 to 3) {
      time(s"probe run $i")(
        MinhashIndex.incrementalDupPairs(spark, idx, d.filter(isNew),
          "doc_id", "text", MinhashIndex.Config()).count())
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
