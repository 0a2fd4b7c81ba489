package graft

import graft.operators.Dedup
import graft.functions.MinhashFunctions.minhashSigF
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler (not a test suite member): stage timings for
  * dedup_minhash at a given SF dir. Run via Test/runMain. */
object ProfileMinhash {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.load(spark, dir, "documents")
    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$tag%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs  rows=$n")
    }
    // warm
    Dedup.minhashDupPairs(docs, "doc_id", "text", 3, 64, 2, 0.5).count()
    spark.catalog.clearCache()

    time("shingleArrays")(
      Dedup.shingleArrays(docs, "doc_id", "text", 3).count())
    val arr = Dedup.shingleArrays(docs, "doc_id", "text", 3).persist()
    arr.count()
    time("hot df count (from cached)") {
      arr.select(explode(col("sharr")).as("shingle"))
        .groupBy(col("shingle")).agg(count(lit(1)).as("df"))
        .filter(col("df") > 100).count()
    }
    val capped = Dedup.dfCappedArrays(arr, "doc_id", 100).persist()
    time("capped arrays (from cached)")(capped.count())
    time("sig kernel (from capped)") {
      capped.select(col("doc_id"), minhashSigF(col("sharr"), 64).as("sig")).count()
    }
    val sigs = capped.select(col("doc_id"),
      minhashSigF(col("sharr"), 64).as("sig")).persist()
    sigs.count()
    time("bands+candidates (cached sigs)") {
      val banded = Dedup.lshBands(sigs, "doc_id", 32, 2)
      val l = banded.select(col("doc_id").as("a"), col("band"), col("bucket"))
      val r = banded.select(col("doc_id").as("b"), col("band"), col("bucket"))
      l.join(r, Seq("band", "bucket")).filter(col("a") < col("b"))
        .select("a", "b").distinct().count()
    }
    val banded = Dedup.lshBands(sigs, "doc_id", 32, 2)
    val l = banded.select(col("doc_id").as("a"), col("band"), col("bucket"))
    val r = banded.select(col("doc_id").as("b"), col("band"), col("bucket"))
    val cands = l.join(r, Seq("band", "bucket")).filter(col("a") < col("b"))
      .select("a", "b").distinct().persist()
    cands.count()
    time("verify (cached capped+cands)")(
      Dedup.verifyJaccardArrays(capped, "doc_id", cands, 0.5).count())
    spark.catalog.clearCache()
    // cold-path decomposition (as Bench sees it)
    val cdocs = Dedup.shingleArrays(docs, "doc_id", "text", 3).persist()
    time("cold: docs materialize")(cdocs.count())
    val ccapped = Dedup.dfCappedArrays(cdocs, "doc_id", 100).persist()
    time("cold: capped materialize")(ccapped.count())
    time("cold: sigs+bands+cands") {
      val sigs = ccapped.select(col("doc_id"), minhashSigF(col("sharr"), 64).as("sig"))
      val banded = Dedup.lshBands(sigs, "doc_id", 32, 2)
      val lc = banded.select(col("doc_id").as("a"), col("band"), col("bucket"))
      val rc = banded.select(col("doc_id").as("b"), col("band"), col("bucket"))
      lc.join(rc, Seq("band", "bucket")).filter(col("a") < col("b"))
        .select("a", "b").distinct().count()
    }
    time("cold: verify") {
      val sigs = ccapped.select(col("doc_id"), minhashSigF(col("sharr"), 64).as("sig"))
      val banded = Dedup.lshBands(sigs, "doc_id", 32, 2)
      val lc = banded.select(col("doc_id").as("a"), col("band"), col("bucket"))
      val rc = banded.select(col("doc_id").as("b"), col("band"), col("bucket"))
      val cands2 = lc.join(rc, Seq("band", "bucket")).filter(col("a") < col("b"))
        .select("a", "b").distinct()
      Dedup.verifyJaccardArrays(ccapped, "doc_id", cands2, 0.5).count()
    }
    spark.catalog.clearCache()
    time("full minhashDupPairs")(
      Dedup.minhashDupPairs(docs, "doc_id", "text", 3, 64, 2, 0.5).count())
    time("full again")(
      Dedup.minhashDupPairs(docs, "doc_id", "text", 3, 64, 2, 0.5).count())
    spark.stop()
  }
}
