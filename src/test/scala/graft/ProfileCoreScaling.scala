package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** r15 punch item: core-ratio scaling evidence at a MEANINGFUL data
  * size. At sf0.1 the 8-core and 32-core bench runs are
  * indistinguishable (every query is scan-constant / driver-job-floor
  * bound — VERDICT_r14), so the driver's scaling block can never show
  * parallelism from the shipped SFs. This tool times the scan-heavy
  * headline queries on an 8×-replicated sf0.1 lineitem/orders corpus
  * (~48M lineitem rows ≈ sf0.8) at a caller-chosen core count; two
  * invocations (32 and 8) give the core-ratio table for
  * OPTIMIZATION_r15.md. The replicated corpus is deterministic (k
  * copies with shifted orderkeys) and lives in /tmp — nothing is
  * persisted into any query path (this is a measurement harness, not a
  * cache).
  *
  * Usage: Test/runMain graft.ProfileCoreScaling <cpus> [mult] [dir]
  */
object ProfileCoreScaling {
  def main(args: Array[String]): Unit = {
    val cpus = args.lift(0).map(_.toInt).getOrElse(32)
    val mult = args.lift(1).map(_.toInt).getOrElse(8)
    val dir = args.lift(2).getOrElse(s"/tmp/graft_sfbig_x$mult")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val src = "/root/testdata/sf0.1"
    val fs = java.nio.file.Paths.get(dir)
    if (!java.nio.file.Files.exists(fs.resolve("lineitem.parquet"))) {
      System.err.println(s"[scaling] generating $dir (mult=$mult)")
      def rep(table: String, keyCols: Seq[String]): Unit = {
        val t = spark.read.parquet(s"$src/$table.parquet")
        val copies = (0 until mult).map { i =>
          keyCols.foldLeft(t) { (df, k) =>
            df.withColumn(k, col(k) + lit(i.toLong * 100000000L))
          }
        }
        copies.reduce(_.unionByName(_))
          .write.mode("overwrite").parquet(s"$dir/$table.parquet")
      }
      rep("lineitem", Seq("l_orderkey"))
      rep("orders", Seq("o_orderkey"))
      // customer: single copy (dim side; broadcast either way)
      spark.read.parquet(s"$src/customer.parquet")
        .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    }

    // scan/agg/join-heavy subset whose tables the replicated corpus
    // carries (q1/q6: lineitem scan+agg; q18: the 3-table join)
    val qs = Seq("q1_pricing_summary", "q6_revenue", "q18_large_volume")
    def timeQ(name: String): Double = {
      val fn = SparkEntry.queries(name)
      (1 to 3).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        fn(spark, dir).collect()
        (System.nanoTime() - t0) / 1e9
      }.min
    }
    val rows = spark.read.parquet(s"$dir/lineitem.parquet").count()
    val results = qs.map(q => q -> timeQ(q))
    println(s"""{"cpus":$cpus,"mult":$mult,"lineitem_rows":$rows,""" +
      results.map { case (q, t) =>
        s""""$q":${String.format(java.util.Locale.ROOT, "%.3f",
          Double.box(t))}"""
      }.mkString(",") + "}")
    spark.stop()
  }
}
