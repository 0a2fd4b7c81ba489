package graft

import graft.operators.{Dedup, MinhashIndex}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off adjudicator: on the stress corpus, the index-backed ingest
  * pairs must equal the self-contained inline incremental pairs (the
  * same invariant IndexSpec pins at sf0.001). */
object StressEquiv {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_stress5k")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$dir/documents.parquet").persist()
    val b1 = docs.filter(col("doc_id") % 20 === 0)
    val base = docs.filter(col("doc_id") % 20 >= 3)
    val idx = java.nio.file.Files.createTempDirectory("graft_equiv_idx")
      .toString + "/idx"
    MinhashIndex.build(spark, base, "doc_id", "text", idx)
    val got = MinhashIndex.incrementalDupPairs(spark, idx, b1, "doc_id", "text")
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = Dedup.minhashIncremental(base, b1, "doc_id", "text")
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    println(s"idx pairs: ${got.size}, inline pairs: ${want.size}, equal: ${got == want}")
    if (got != want)
      println(s"missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
    spark.stop()
  }
}
