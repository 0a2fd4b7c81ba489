package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measures candidate-pushdown effectiveness on an existing MergeTable
  * state dir: scan rows returned with and without the In-filter prune,
  * at the executed-plan level (FileSourceScanExec numOutputRows — the
  * IvmSpec technique, against real stress data instead of a synthetic
  * toy). Usage: Test/runMain graft.ProfilePrune <mergeTableDir> [nCand] */
object ProfilePrune {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val nCand = args.lift(1).map(_.toInt).getOrElse(200)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.parquet.pushdown.inFilterThreshold", "512")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.MergeTable
    val m = MergeTable.readMeta(spark, dir)
    val v = MergeTable.latestVersion(spark, dir)
    val k1 = m.keyCols.head
    val all = MergeTable.read(spark, dir)
    val n = all.count()
    // nCand evenly spread first-key values
    val cand = all.select(col(k1)).distinct().orderBy(col(k1))
      .collect().map(_.get(0))
    val step = math.max(1, cand.length / nCand)
    val cs = cand.grouped(step).map(_.head).toSeq.take(nCand)
    println(s"[prune] table rows=$n distinct $k1=${cand.length} candidates=${cs.length}")
    val touched = (0 until 10000).toSet // all buckets
    def scanRows(df: DataFrame): Long = {
      df.collect()
      import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
      import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
      def scans(p: SparkPlan): Seq[Long] = p.collect {
        case f: FileSourceScanExec => Seq(f.metrics("numOutputRows").value)
        case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      }.flatten
      scans(df.queryExecution.executedPlan).sum
    }
    // raw scan (no overlay reconciliation — the base-file half of the
    // read, where the pushdown either prunes or doesn't)
    val paths = {
      val fs = org.apache.hadoop.fs.FileSystem.getLocal(
        spark.sparkContext.hadoopConfiguration)
      val state = new org.apache.hadoop.fs.Path(dir, "state")
      fs.listStatus(state).filter(_.getPath.getName.startsWith("p"))
        .sortBy(_.getPath.getName).takeRight(1)
        .map(_.getPath.toString)
    }
    println(s"[prune] scanning base dir ${paths.mkString(",")}")
    val base = spark.read.schema(m.schema).parquet(paths: _*)
    val t0 = System.nanoTime()
    val whole = scanRows(base)
    val t1 = System.nanoTime()
    val pruned = scanRows(base.filter(col(k1).isin(cs.toSeq: _*)))
    val t2 = System.nanoTime()
    println(f"[prune] whole scan rows=$whole (${(t1-t0)/1e9}%.2fs)  " +
      f"pruned scan rows=$pruned (${(t2-t1)/1e9}%.2fs)  " +
      f"ratio=${pruned.toDouble / math.max(1, whole)}%.3f")
    spark.stop()
  }
}
