package graft

import graft.operators.Dedup
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
    time("shingles")(Dedup.shingles(docs, "doc_id", "text", 3).count())
    val sh = Dedup.shingles(docs, "doc_id", "text", 3).persist()
    sh.count()
    time("signatures(from cached)") {
      val aggs = (0 until 64).map(i => min(xxhash64(lit(i), col("shingle"))).as(s"m$i"))
      sh.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*).count()
    }
    time("sets(from cached)") {
      sh.groupBy(col("doc_id"))
        .agg(collect_list(col("shingle")).as("s"), count(lit(1)).as("sz")).count()
    }
    time("full minhashDupPairs")(
      Dedup.minhashDupPairs(docs, "doc_id", "text", 3, 64, 2, 0.5).count())
    spark.stop()
  }
}
