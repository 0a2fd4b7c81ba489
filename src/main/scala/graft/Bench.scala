package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times SparkEntry.benchQueries on SPARK_GRAFT_SF_DIR,
  * prints ONE JSON line for the driver (BENCH_r{N}.json). */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warmup: run each bench query once at the smallest SF so codegen
    // compilation and JIT are not billed to the measured run (the
    // generated-code cache is keyed by plan shape, which is identical).
    val warmDir = "/root/testdata/sf0.001"
    SparkEntry.benchQueries.foreach { name =>
      try SparkEntry.queries(name)(spark,
        if (new java.io.File(warmDir).isDirectory) warmDir else sfDir).collect()
      catch { case _: Throwable => }
    }
    val results = SparkEntry.benchQueries.map { name =>
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).collect() } catch { case _: Throwable => }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
