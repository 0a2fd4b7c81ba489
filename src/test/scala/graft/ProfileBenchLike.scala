package graft

import org.apache.spark.sql.SparkSession

/** Replicates Bench's call pattern for one query: warm at sf0.001,
  * then timed runs at sf0.1. */
object ProfileBenchLike {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("dedup_minhash")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // A/B lever for runtime SQL confs, e.g.
    // SPARK_GRAFT_CONF=spark.sql.parquet.pushdown.inFilterThreshold=512
    sys.env.get("SPARK_GRAFT_CONF").foreach { kv =>
      val Array(k, v) = kv.split("=", 2)
      spark.conf.set(k, v)
      println(s"[profile] $k=$v")
    }
    val fn = SparkEntry.queries(name)
    def run(dir: String): Double = {
      val t0 = System.nanoTime()
      fn(spark, dir).collect()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"warm sf0.001: ${run("/root/testdata/sf0.001")}%.2fs")
    println(f"run1 sf0.1:   ${run("/root/testdata/sf0.1")}%.2fs")
    println(f"run2 sf0.1:   ${run("/root/testdata/sf0.1")}%.2fs")
    println(f"run3 sf0.1:   ${run("/root/testdata/sf0.1")}%.2fs")
    spark.stop()
  }
}
