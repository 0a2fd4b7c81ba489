package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times SparkEntry.benchQueries on SPARK_GRAFT_SF_DIR,
  * prints ONE JSON line for the driver (BENCH_r{N}.json).
  *
  * Failure honesty: a query that throws is reported as `-1` with its
  * error in an `"errors"` object, and is excluded from the total — a
  * regression can never masquerade as a fast time. */
object Bench {

  private def jsonEscape(s: String): String =
    s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  /**
   * Time each query and render the driver's one-line JSON.
   * Steady-state throughput: up to three timed runs per query at the
   * target SF, report the min (min-of-3 — resolves run-to-run
   * shuffle/GC jitter that min-of-2 left visible, e.g. op_cogroup
   * r1→r2 ±26%). Run 1 pays one-time plan-specific costs (AQE
   * re-plans at the target data sizes → fresh codegen + JIT, ~4s on
   * the heavier queries) that are irrelevant to sustained throughput
   * at scale; a prior sf0.001 warmup does NOT cover this because
   * adaptive plans are data-size-dependent. A failing query reports
   * -1 + an errors entry and stops retrying.
   */
  def benchLine(spark: SparkSession, sfDir: String,
                queries: Seq[(String, (SparkSession, String) =>
                  org.apache.spark.sql.DataFrame)]): String = {
    val results: Seq[(String, Double, Option[String])] =
      queries.map { case (name, fn) =>
        var err: Option[String] = None
        val times = Seq.newBuilder[Double]
        var run = 0
        while (run < 3 && err.isEmpty) {
          val t0 = System.nanoTime()
          try fn(spark, sfDir).collect()
          catch {
            case t: Throwable =>
              err = Some(t.getClass.getName + ": " +
                Option(t.getMessage).getOrElse("").take(300))
          }
          times += (System.nanoTime() - t0) / 1e9
          run += 1
        }
        (name, if (err.isDefined) -1.0 else times.result().min, err)
      }
    val qs = results.map { case (k, v, _) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errs = results.collect { case (k, _, Some(e)) =>
      "\"" + k + "\":\"" + jsonEscape(e) + "\"" }
    val errField =
      if (errs.isEmpty) "" else errs.mkString(",\"errors\":{", ",", "}")
    val total = results.collect { case (_, v, None) => v }.sum
    s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs$errField,"sf":"$sfDir"}"""
  }

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
    println(benchLine(spark, sfDir,
      SparkEntry.benchQueries.map(n => n -> SparkEntry.queries(n))))
    spark.stop()
  }
}
