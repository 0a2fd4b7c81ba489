package graft.queries

import graft.Tables
import graft.functions.{TextFunctions => TF}
import graft.operators.{BloomJoin, FrequentItems}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Scale-pattern operators: the shapes that keep 100 TB pipelines off
 * the pathological paths — sketch-bounded heavy hitters (never a full
 * vocabulary shuffle), Bloom semi-join reduction (never an unpruned
 * fact shuffle), and gap sessionization (the batch twin of the
 * streaming session windows in streaming/Streams.scala). All
 * oracle-exact: each sketch/pruning pass is candidate generation
 * only, with an exact verify behind it.
 */
object ScaleOps {

  private val SessionGapUs = 30L * 60 * 1000000 // 30 min

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Exact heavy hitters (tokens with freq > 1%) via Misra-Gries
    // candidates + exact verify — see operators/FrequentItems.scala.
    "q_heavy_hitters" -> { (spark, dir) =>
      val tok = Tables.load(spark, dir, "documents")
        .select(explode(TF.tokens(col("text"))).as("tok"))
      FrequentItems.heavyHitters(tok, "tok", minFreq = 0.01)
        .orderBy("tok")
    },

    // Bloom semi-join reduction: lineitem pre-filtered by a Bloom
    // filter of the qualifying part keys BEFORE any shuffle, then the
    // real semi join drops false positives — exact vs the plain
    // semi-join oracle. might_contain is a native codegen'd predicate.
    "op_bloom_join" -> { (spark, dir) =>
      val li = Tables.load(spark, dir, "lineitem")
        .select(col("l_partkey"), col("l_returnflag"),
          col("l_quantity").cast("long").as("q"))
      val build = Tables.load(spark, dir, "part")
        .filter(col("p_size") <= 5).select(col("p_partkey"))
      BloomJoin.semiJoinReduced(li, "l_partkey", build, "p_partkey",
        expectedItems = 200000L, fpp = 0.01)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"), sum(col("q")).as("sum_q"))
        .orderBy("l_returnflag")
    },

    // Gap sessionization (batch): per-user sessions split at >30-min
    // silences; one shuffle (the user window), session stats exact.
    "q_sessionize" -> { (spark, dir) =>
      val ev = Tables.load(spark, dir, "events")
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("us"))
      val w = Window.partitionBy("user_id").orderBy("us", "event_id")
      val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      ev.withColumn("prev", lag(col("us"), 1).over(w))
        .withColumn("brk",
          when(col("prev").isNull ||
            col("us") - col("prev") > SessionGapUs, 1L).otherwise(0L))
        .withColumn("session_id", sum(col("brk")).over(run))
        .groupBy(col("user_id"), col("session_id"))
        .agg(count(lit(1)).as("n_events"),
          min(col("us")).as("start_us"), max(col("us")).as("end_us"))
        .withColumn("dur_us", col("end_us") - col("start_us"))
        .orderBy("user_id", "session_id")
    }
  )

  val oracleSql: Map[String, String] = Map(
    "q_heavy_hitters" ->
      """WITH tok AS (SELECT unnest(list_filter(
        |    string_split_regex(text,'\s+'), x -> len(x)>0)) AS tok
        |  FROM documents),
        |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS total FROM tok)
        |SELECT tok, CAST(COUNT(*) AS BIGINT) AS cnt,
        |  CAST(COUNT(*) AS DOUBLE) / CAST(total AS DOUBLE) AS freq
        |FROM tok, tot GROUP BY tok, total
        |HAVING CAST(COUNT(*) AS DOUBLE) > 0.01 * CAST(total AS DOUBLE)
        |ORDER BY tok""".stripMargin,
    "op_bloom_join" ->
      """SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_q
        |FROM lineitem
        |WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size <= 5)
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_sessionize" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
        |s AS (SELECT user_id, event_id, us,
        |    CASE WHEN lag(us) OVER w IS NULL
        |         OR us - lag(us) OVER w > 1800000000 THEN 1 ELSE 0 END AS brk
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
        |t AS (SELECT user_id, us,
        |    CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY us, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS session_id
        |  FROM s)
        |SELECT user_id, session_id, CAST(COUNT(*) AS BIGINT) AS n_events,
        |  MIN(us) AS start_us, MAX(us) AS end_us,
        |  MAX(us) - MIN(us) AS dur_us
        |FROM t GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin
  )
}
