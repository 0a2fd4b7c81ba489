package graft

import graft.operators.FrequentItems
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Isolates the Misra-Gries SKETCH pass (candidate proposal) on the
  * exploded-token stream at sf0.1, comparing the throughput path
  * (hash-map partition summaries + merge-only aggregate) against the
  * all-Aggregator reference path — the full q_heavy_hitters query is
  * tokenize-dominated, so the sketch win is only visible in isolation. */
object ProfileMG {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val toks = spark.read.parquet(s"$dir/documents.parquet")
      .select(explode(graft.functions.TextFunctions.tokens(col("text"))).as("x"))
      .select(col("x")).as[String]
      .persist()
    println(s"tokens: ${toks.count()}")
    val cap = 200 // minFreq = 1%
    def time(label: String, f: => Seq[String]): Unit =
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        val n = f.size
        println(f"$label run$i: ${(System.nanoTime() - t0) / 1e9}%.2fs ($n cands)")
      }
    time("aggregator", FrequentItems.mgCandidatesViaAggregator(toks, cap))
    time("tuned     ", FrequentItems.mgCandidates(toks, cap))
    spark.stop()
  }
}
