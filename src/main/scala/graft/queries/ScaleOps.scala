package graft.queries

import graft.Tables
import graft.functions.{TextFunctions => TF}
import graft.operators.{BloomJoin, FrequentItems, Sampling, Skew}
import graft.sources.Bucketing
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
    },

    // Deterministic per-group sample: up to 20 docs per language in
    // md5-bucket order — the reservoir-sample shape made reproducible.
    // Skew-safe: Skew.groupTopK never sorts a whole hot group (the
    // dominant language) in one task.
    "q_group_sample" -> { (spark, dir) =>
      val d = Tables.load(spark, dir, "documents")
        .select(col("doc_id"), TF.langId(col("text")).as("lang"))
      Skew.groupTopK(d, Seq("lang"),
        Seq(Sampling.hashBucket(col("doc_id")), col("doc_id")),
        n = 20, nSalts = 8)
        .select(col("lang"), col("rk"), col("doc_id"))
        .orderBy("lang", "rk")
    },

    // Distributed vocabulary tokenization: top-100 corpus vocabulary
    // (two-phase: TakeOrderedAndProject global top-V, then ranks over
    // V rows only — never a corpus-sized single-partition window),
    // broadcast-joined onto exploded tokens; docs summarized by exact
    // token/OOV counts and position-weighted id checksums that pin
    // every id and its position.
    "text_vocab_ids" -> { (spark, dir) =>
      val tok = Tables.load(spark, dir, "documents")
        .select(col("doc_id"), posexplode(TF.tokens(col("text"))))
        .toDF("doc_id", "pos", "tok")
      val topV = tok.groupBy("tok").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("tok")).limit(100)
      // rank the <= V retained rows on the driver (bounded metadata,
      // like the IVF centroid collect) — an unpartitioned WindowExec
      // here would be correct but floods the logs with a
      // single-partition warning per run
      val vocabRows = topV.collect().toSeq.zipWithIndex
        .map { case (r, i) => (r.getString(0), (i + 1).toLong) }
      import spark.implicits._
      val vocab = vocabRows.toDF("tok", "id")
      tok.join(broadcast(vocab), Seq("tok"), "left")
        .withColumn("id0", coalesce(col("id"), lit(0)).cast("long"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_tokens"),
          sum(when(col("id").isNull, 1L).otherwise(0L)).as("n_oov"),
          sum(col("id0")).as("ids_sum"),
          sum(col("id0") * (col("pos") + 1)).as("ids_posw"))
        .orderBy("doc_id")
    },

    // Z-order clustering key (Bucketing.zValue / writeZOrdered): the
    // multi-dimension layout key — bit-interleave two join/filter
    // columns so files hold narrow ranges of BOTH. The key itself is
    // deterministic integer algebra → oracled; the layout benefit
    // (disjoint per-file z-ranges, narrowed per-file column stats) is
    // asserted in ScaleSpec.
    "q_zorder_key" -> { (spark, dir) =>
      Tables.load(spark, dir, "orders")
        .select(col("o_orderkey"),
          Bucketing.zValue(col("o_custkey").bitwiseAND(lit(65535L)),
            col("o_orderkey").bitwiseAND(lit(65535L)), 16).as("z"))
        .orderBy("o_orderkey")
    },

    // d>=3 Z-order key with UNEVEN bit budgets (zValueN): customer and
    // order keys spend 16 bits, the price bucket 10 — the general
    // layout key for fact tables range-filtered on several columns at
    // once. Same engine-replicable integer algebra → exact oracle.
    "q_zorder_key3" -> { (spark, dir) =>
      Tables.load(spark, dir, "orders")
        .select(col("o_orderkey"),
          Bucketing.zValueN(Seq(
            col("o_custkey").bitwiseAND(lit(65535L)) -> 16,
            col("o_orderkey").bitwiseAND(lit(65535L)) -> 16,
            floor(col("o_totalprice")).cast("long")
              .bitwiseAND(lit(1023L)) -> 10)).as("z3"))
        .orderBy("o_orderkey")
    }
  )

  /** The oracle-side mirror of [[Bucketing.zValueN]]'s round-robin bit
    * placement, emitted as SQL — one generator for both engines keeps
    * the positions provably identical. */
  private def zValueNSql(dims: Seq[(String, Int)]): String = {
    val terms = Seq.newBuilder[String]
    var out = 0
    for (level <- 0 until dims.map(_._2).max; (e, b) <- dims) {
      if (level < b) {
        terms += s"((($e >> $level) & 1) << $out)"
        out += 1
      }
    }
    terms.result().mkString(" | ")
  }

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
        |ORDER BY user_id, session_id""".stripMargin,
    "q_group_sample" ->
      s"""WITH t AS (SELECT doc_id,
         |  list_filter(string_split_regex(text,'\\s+'), x -> len(x)>0) AS toks
         |  FROM documents),
         |s AS (SELECT doc_id, toks, ${PipelineOps.langBestSql} AS best FROM t),
         |l AS (SELECT doc_id, ${PipelineOps.langPickSql} AS lang FROM s),
         |r AS (SELECT lang, doc_id, ROW_NUMBER() OVER (PARTITION BY lang
         |    ORDER BY ('0x' || substr(md5(CAST(doc_id AS VARCHAR)),1,8))::BIGINT,
         |             doc_id) AS rk
         |  FROM l)
         |SELECT lang, rk, doc_id FROM r WHERE rk <= 20
         |ORDER BY lang, rk""".stripMargin,
    "text_vocab_ids" ->
      """WITH t AS (SELECT doc_id,
        |  list_filter(string_split_regex(text,'\s+'), x -> len(x)>0) AS toks
        |  FROM documents),
        |tok AS (SELECT doc_id, unnest(toks) AS tok,
        |    unnest(range(1, len(toks)+1)) AS pos FROM t),
        |c AS (SELECT tok, CAST(count(*) AS BIGINT) AS cnt FROM tok GROUP BY tok),
        |v AS (SELECT tok, CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, tok) AS BIGINT) AS id
        |      FROM c ORDER BY cnt DESC, tok LIMIT 100),
        |j AS (SELECT doc_id, pos, v.id AS id, COALESCE(v.id, 0) AS id0
        |      FROM tok LEFT JOIN v USING (tok))
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
        |  CAST(SUM(CASE WHEN id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
        |  CAST(SUM(id0) AS BIGINT) AS ids_sum,
        |  CAST(SUM(id0 * pos) AS BIGINT) AS ids_posw
        |FROM j GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_zorder_key" -> {
      val terms = (0 until 16).flatMap { i =>
        Seq(s"((((o_custkey & 65535) >> $i) & 1) << ${2 * i})",
          s"((((o_orderkey & 65535) >> $i) & 1) << ${2 * i + 1})")
      }.mkString(" | ")
      s"""SELECT o_orderkey, CAST($terms AS BIGINT) AS z
         |FROM orders ORDER BY o_orderkey""".stripMargin
    },
    "q_zorder_key3" -> {
      val terms = zValueNSql(Seq(
        "(o_custkey & 65535)" -> 16,
        "(o_orderkey & 65535)" -> 16,
        "(CAST(FLOOR(o_totalprice) AS BIGINT) & 1023)" -> 10))
      s"""SELECT o_orderkey, CAST($terms AS BIGINT) AS z3
         |FROM orders ORDER BY o_orderkey""".stripMargin
    }
  )
}
