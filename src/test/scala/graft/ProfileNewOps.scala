package graft

import org.apache.spark.sql.SparkSession

/** One-off plan/exchange-reuse inspection for q_bm25_topk /
  * q_lm_surprisal (Test/runMain graft.ProfileNewOps). */
object ProfileNewOps {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Seq("q_bm25_topk", "q_lm_surprisal").foreach { q =>
      val df = SparkEntry.queries(q)(spark, dir)
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      def n(pat: String) = pat.r.findAllIn(p).size
      // scans NOT inside an InMemoryRelation lineage dump: count via
      // the simpler signal — how many InMemoryTableScans serve the
      // consumers vs how many live parquet scans remain outside cache
      println(s"$q: memScan=${n("InMemoryTableScan")} " +
        s"scans=${n("Scan parquet")} inMemRel=${n("InMemoryRelation")}")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
