package graft

import org.apache.spark.sql.SparkSession

/** Plan audit over every SparkEntry query: per query, count exchanges
  * and join kinds, flag cartesian/BNLJ stages. Run via Test/runMain.
  * Expected BNLJ flags (all benign):
  *  - sim_topk_bruteforce, mm_embed_topk: the deliberate exact
  *    baselines (broadcast queries × streamed corpus; candidates are
  *    by definition all pairs)
  *  - sim_topk_pq: the ADC pass scores broadcast queries × the
  *    streamed CODE stream (m bytes/row, not vectors) — the all-pairs
  *    shape is the point, 32× narrower than brute force; the re-rank
  *    is a broadcast-hash candidate join
  *  - q22_idle_customers, q11_important_parts: Spark's scalar-subquery
  *    plan — a ONE-ROW broadcast side crossed with the fact table
  *  - q_heavy_hitters: the explicit ONE-ROW total-count broadcast
  *    crossed with the (≤ cap rows) candidate counts — same class
  *  - dedup_minhash/dedup_incremental(_idx)/q_quantile_bins/
  *    q_mixture_sample/q_mixture_upsample: ONE-ROW broadcast of the
  *    hot-shingle array / quantile thresholds / capacity scalar —
  *    same class (PlanSpec whitelists BNLJ by its hotarr condition)
  *  - q_bm25_topk/q_lm_surprisal: the ONE-ROW corpus-constants
  *    broadcast ((N, T) / (T)) crossed with the term frames — same
  *    class
  * dedup_embedding is a block-pair equi-join and sim_topk_lsh/ivf are
  * bucket equi-joins — no BNLJ (PlanSpec asserts). */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val p = fn(spark, dir).queryExecution.executedPlan.toString
        def n(pat: String) = pat.r.findAllIn(p).size
        val flags = Seq(
          if (n("CartesianProduct") > 0) "CARTESIAN!" else "",
          if (n("BroadcastNestedLoopJoin") > 0) "BNLJ" else "").filter(_.nonEmpty)
        println(f"$name%-28s exch=${n("Exchange")}%2d bhj=${n("BroadcastHashJoin")}%2d " +
          f"smj=${n("SortMergeJoin")}%2d shj=${n("ShuffledHashJoin")}%2d ${flags.mkString(" ")}")
      } catch { case e: Throwable => println(f"$name%-28s PLAN-ERROR ${e.getMessage.take(80)}") }
    }
    spark.stop()
  }
}
