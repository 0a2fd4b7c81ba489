package graft

import graft.operators.{MinhashIndex, Sampling}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object ProfileIdxAqe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val aqe = args.lift(1).getOrElse("true")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", aqe)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = Tables.load(spark, dir, "documents")
    val cut = Sampling.cuts(Seq(0.9))(1)
    val isNew = Sampling.hashBucket(col("doc_id")) >= lit(cut)
    val idx = java.nio.file.Files.createTempDirectory("graft_mhidx_aqe").toString
    MinhashIndex.build(spark, d.filter(!isNew), "doc_id", "text", idx, MinhashIndex.Config())
    def once(): Double = {
      val t0 = System.nanoTime()
      MinhashIndex.incrementalDupPairs(spark, idx, d.filter(isNew),
        "doc_id", "text", MinhashIndex.Config()).count()
      spark.catalog.clearCache()
      (System.nanoTime() - t0) / 1e9
    }
    once() // warm
    println(f"aqe=$aqe runs: ${once()}%.2f ${once()}%.2f ${once()}%.2f")
    spark.stop()
  }
}
