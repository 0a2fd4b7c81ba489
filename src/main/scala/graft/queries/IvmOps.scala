package graft.queries

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{Ivm, IvmOverJoin, JoinIvm, MergeTable}

/**
 * Incremental-view-maintenance queries: the persisted [[MergeTable]] /
 * [[Ivm]] state machines driven through a DETERMINISTIC multi-batch
 * CDC history, then read back — so the DuckDB oracle can replay the
 * netted final state in plain SQL and pin the maintained state itself
 * cross-engine (the sim_topk_ivf0_cdc_idx discipline, applied to the
 * downstream-consumer layer).
 *
 * History (documents table, projection doc_id/lang/source/n_chars):
 *   init    insert  doc_id%5 != 0
 *   batch1  delete  doc_id%9 == 4 (of the live set)
 *           insert  doc_id%5 == 0 AND doc_id%2 == 0
 *   batch2  update  live rows with doc_id%7 == 3 →
 *           (source='aug', n_chars+=1000)  [delete before-image +
 *           insert new row — the standard CDC update encoding]
 *
 * State dirs are memoized per corpus dir (bench/verify reruns time the
 * steady-state read; a fresh JVM rebuilds), like the index queries.
 */
object IvmOps {

  private val dirs = new ConcurrentHashMap[String, String]()

  private def docsProj(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))

  /** (inserts, deletes) per batch of the shared CDC history. `live`
    * tracking is replayed functionally from the documents table — the
    * history is deterministic, never random. */
  private def history(docs: DataFrame): Seq[(DataFrame, DataFrame)] = {
    val init = docs.filter(col("doc_id") % 5 =!= 0)
    val b1del = init.filter(col("doc_id") % 9 === 4)
    val b1ins = docs.filter(col("doc_id") % 5 === 0 &&
      col("doc_id") % 2 === 0)
    // live after batch1
    val live1 = init.filter(col("doc_id") % 9 =!= 4).unionByName(b1ins)
    val b2tgt = live1.filter(col("doc_id") % 7 === 3)
    val b2ins = b2tgt.withColumn("source", lit("aug"))
      .withColumn("n_chars", col("n_chars") + 1000)
    val empty = docs.limit(0)
    Seq((init, empty), (b1ins, b1del), (b2ins, b2tgt))
  }

  private def ivmDir(spark: SparkSession, dir: String): String =
    dirs.computeIfAbsent(dir + "#ivm", _ => {
      val d = java.nio.file.Files
        .createTempDirectory("graft_ivm").toString + "/agg"
      val docs = docsProj(spark, dir)
      Ivm.create(spark, d, docs.schema, Ivm.Spec(
        groupCols = Seq("lang"),
        aggs = Seq(
          Ivm.Count("cnt"),
          Ivm.Sum("n_chars", "sum_chars"),
          Ivm.Min("doc_id", "min_id"),
          Ivm.Max("n_chars", "max_chars"),
          Ivm.Avg("n_chars", "avg_chars"),
          Ivm.CountDistinct("source", "n_sources"))),
        nBuckets = 8)
      history(docs).foreach { case (ins, del) =>
        Ivm.applyDelta(spark, d, ins, del)
      }
      d
    })

  private def mirrorDir(spark: SparkSession, dir: String): String =
    dirs.computeIfAbsent(dir + "#mirror", _ => {
      val d = java.nio.file.Files
        .createTempDirectory("graft_mirror").toString + "/tbl"
      val docs = docsProj(spark, dir)
      MergeTable.build(spark, d, docs.filter(col("doc_id") % 5 =!= 0),
        keyCols = Seq("doc_id"), bucketCols = Seq("doc_id"), nBuckets = 16)
      // one merge: upsert-or-insert the even multiples of 5 plus the
      // %7==3 augmentations (single projection — a key never appears
      // twice in the batch); delete %9==4, delete-wins on the overlap,
      // deletes of absent keys are no-ops
      val upserts = docs
        .filter((col("doc_id") % 5 === 0 && col("doc_id") % 2 === 0) ||
          col("doc_id") % 7 === 3)
        .withColumn("source",
          when(col("doc_id") % 7 === 3, lit("aug")).otherwise(col("source")))
        .withColumn("n_chars",
          when(col("doc_id") % 7 === 3, col("n_chars") + 1000)
            .otherwise(col("n_chars")))
      val deletes = docs.filter(col("doc_id") % 9 === 4).select("doc_id")
      MergeTable.merge(spark, d, upserts, deletes)
      d
    })

  /** orders ⋈ customer rollup maintained through a two-sided CDC batch
    * (order churn + customer segment reassignments). Prices quantize
    * to integer cents (floor — identical in both engines) so sums are
    * bit-exact under retraction. */
  private def joinDir(spark: SparkSession, dir: String): String =
    dirs.computeIfAbsent(dir + "#joinivm", _ => {
      val d = java.nio.file.Files
        .createTempDirectory("graft_joinivm").toString + "/view"
      val fact = Tables.load(spark, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey").as("custkey"),
          floor(col("o_totalprice") * 100).cast("long").as("cents"))
      val dim = Tables.load(spark, dir, "customer")
        .select(col("c_custkey").as("custkey"),
          col("c_mktsegment").as("segment"))
      val factP = fact.select("custkey", "cents")
      JoinIvm.create(spark, d, factP.schema, dim.schema, JoinIvm.Spec(
        joinCols = Seq("custkey"), groupCols = Seq("segment"),
        aggs = Seq(Ivm.Count("orders"), Ivm.Sum("cents", "revenue"),
          Ivm.Avg("cents", "avg_cents"))), nBuckets = 8)
      val none = factP.limit(0)
      val noneD = dim.limit(0)
      JoinIvm.applyDelta(spark, d, factP, none, dim, noneD)
      // one two-sided batch: order churn (deletes carry the projected
      // before-images) + customer segment reassignments (delete old
      // dim row, insert the new one)
      JoinIvm.applyDelta(spark, d,
        fact.filter(col("o_orderkey") % 5 === 0)
          .select(col("custkey"), (col("cents") + 555).as("cents")),
        fact.filter(col("o_orderkey") % 9 === 4)
          .select("custkey", "cents"),
        dim.filter(col("custkey") % 7 === 3)
          .withColumn("segment", lit("AUG")),
        dim.filter(col("custkey") % 7 === 3))
      d
    })

  /** The same two-sided orders ⋈ customer history as [[joinDir]], but
    * maintained by [[IvmOverJoin]] with the NON-INVERTIBLE aggregate
    * set (min/max/count-distinct) — the joined-projection z-set path.
    * The order deletes retract group minima (every %9==4 order dies,
    * including segment-minimum prices), so the oracle equality proves
    * the extremes recompute exactly under retraction. */
  private def joinMinmaxDir(spark: SparkSession, dir: String): String =
    dirs.computeIfAbsent(dir + "#ivmoj", _ => {
      val d = java.nio.file.Files
        .createTempDirectory("graft_ivmoj").toString + "/view"
      val fact = Tables.load(spark, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey").as("custkey"),
          floor(col("o_totalprice") * 100).cast("long").as("cents"))
      val dim = Tables.load(spark, dir, "customer")
        .select(col("c_custkey").as("custkey"),
          col("c_mktsegment").as("segment"))
      val factP = fact.select("custkey", "cents")
      IvmOverJoin.create(spark, d, factP.schema, dim.schema,
        IvmOverJoin.Spec(
          joinCols = Seq("custkey"), groupCols = Seq("segment"),
          aggs = Seq(Ivm.Count("orders"), Ivm.Min("cents", "min_cents"),
            Ivm.Max("cents", "max_cents"),
            Ivm.CountDistinct("cents", "n_prices"),
            Ivm.Sum("cents", "revenue"))), nBuckets = 8)
      IvmOverJoin.applyDelta(spark, d, factP, factP.limit(0),
        dim, dim.limit(0))
      IvmOverJoin.applyDelta(spark, d,
        fact.filter(col("o_orderkey") % 5 === 0)
          .select(col("custkey"), (col("cents") + 555).as("cents")),
        fact.filter(col("o_orderkey") % 9 === 4)
          .select("custkey", "cents"),
        dim.filter(col("custkey") % 7 === 3)
          .withColumn("segment", lit("AUG")),
        dim.filter(col("custkey") % 7 === 3))
      d
    })

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- steady-state REFRESH benchmarks (bench headline set) ----
    // Each run applies a NET-ZERO churn pair (insert a deterministic
    // batch, then delete exactly it) against the memoized maintained
    // state and reads the view back: the timed cost is two refresh
    // commits + per-batch gc + the view read — the steady-state
    // maintenance workload itself, NOT the build (which amortizes on
    // run 1 like the index queries). Net-zero churn keeps the final
    // state equal to the non-refresh twin, so each shares that twin's
    // oracle EXACTLY — a wrong refresh path shows up as a correctness
    // failure, not just a slow time.

    // Ivm: one insert batch (live %3==1 docs re-keyed +10M) and its
    // exact deletion — two z-set folds + group recomputes + gc.
    "q_ivm_refresh" -> { (spark, dir) =>
      val d = ivmDir(spark, dir)
      val batch = docsProj(spark, dir)
        .filter(col("doc_id") % 3 === 1)
        .withColumn("doc_id", col("doc_id") + 10000000L)
      Ivm.applyDelta(spark, d, batch, batch.limit(0))
      Ivm.applyDelta(spark, d, batch.limit(0), batch)
      Ivm.gc(spark, d, retainLast = 2)
      Ivm.readView(spark, d).orderBy("lang")
    },

    // JoinIvm: a two-sided net-zero pair — fact churn on existing
    // customers + a batch of temporary dim rows, then the exact
    // inverse — two bilinear-delta refreshes + gc.
    "q_ivm_join_refresh" -> { (spark, dir) =>
      val d = joinDir(spark, dir)
      val fBatch = Tables.load(spark, dir, "orders")
        .filter(col("o_orderkey") % 11 === 5)
        .select(col("o_custkey").as("custkey"),
          (floor(col("o_totalprice") * 100).cast("long") + 999)
            .as("cents"))
      val dBatch = Tables.load(spark, dir, "customer")
        .filter(col("c_custkey") % 13 === 2)
        .select((col("c_custkey") + 10000000L).as("custkey"),
          lit("TMP").as("segment"))
      JoinIvm.applyDelta(spark, d, fBatch, fBatch.limit(0),
        dBatch, dBatch.limit(0))
      JoinIvm.applyDelta(spark, d, fBatch.limit(0), fBatch,
        dBatch.limit(0), dBatch)
      JoinIvm.gc(spark, d, retainLast = 2)
      JoinIvm.readView(spark, d).orderBy("segment")
    },

    // IvmOverJoin (the non-invertible aggregate set): a two-sided
    // net-zero pair against the memoized joined-projection state —
    // two bilinear refreshes, each feeding the inner Ivm's group-local
    // recompute (the most state-heavy maintained family) + gc. Shares
    // q_ivm_join_minmax's oracle exactly.
    "q_ivm_join_minmax_refresh" -> { (spark, dir) =>
      val d = joinMinmaxDir(spark, dir)
      val fBatch = Tables.load(spark, dir, "orders")
        .filter(col("o_orderkey") % 11 === 5)
        .select(col("o_custkey").as("custkey"),
          (floor(col("o_totalprice") * 100).cast("long") + 999)
            .as("cents"))
      val dBatch = Tables.load(spark, dir, "customer")
        .filter(col("c_custkey") % 13 === 2)
        .select((col("c_custkey") + 10000000L).as("custkey"),
          lit("TMP").as("segment"))
      IvmOverJoin.applyDelta(spark, d, fBatch, fBatch.limit(0),
        dBatch, dBatch.limit(0))
      IvmOverJoin.applyDelta(spark, d, fBatch.limit(0), fBatch,
        dBatch.limit(0), dBatch)
      IvmOverJoin.gc(spark, d, retainLast = 2)
      IvmOverJoin.readView(spark, d).orderBy("segment")
    },

    // MergeTable: upsert a batch of fresh keys, then delete exactly
    // those keys — two touched-bucket copy-on-write merges + gc.
    "q_ivm_mirror_refresh" -> { (spark, dir) =>
      val d = mirrorDir(spark, dir)
      val batch = docsProj(spark, dir)
        .filter(col("doc_id") % 3 === 2)
        .withColumn("doc_id", col("doc_id") + 10000000L)
      MergeTable.merge(spark, d, batch,
        batch.select("doc_id").limit(0))
      MergeTable.merge(spark, d, batch.limit(0),
        batch.select("doc_id"))
      MergeTable.gc(spark, d, retainLast = 2)
      MergeTable.read(spark, d).orderBy("doc_id")
    },

    // The maintained join view with the NON-INVERTIBLE aggregates —
    // min/max/count-distinct over orders ⋈ customer kept exact through
    // the same two-sided CDC batch as q_ivm_join_agg: the joined
    // projection π(segment, cents) is itself maintained as a counting
    // z-set (IvmOverJoin = bilinear join delta feeding Ivm's
    // group-local recompute), so retracting a segment's minimum price
    // recovers the runner-up exactly.
    "q_ivm_join_minmax" -> { (spark, dir) =>
      IvmOverJoin.readView(spark, joinMinmaxDir(spark, dir))
        .orderBy("segment")
    },

    // The maintained JOIN-aggregate (orders ⋈ customer revenue rollup)
    // after a two-sided CDC batch — the bilinear join-delta algebra
    // (ΔF⋈D' + F⋈ΔD) over join-key-bucketed z-sets; the oracle
    // replays the netted final state and joins/aggregates it from
    // scratch.
    "q_ivm_join_agg" -> { (spark, dir) =>
      JoinIvm.readView(spark, joinDir(spark, dir)).orderBy("segment")
    },

    // The maintained GROUP BY after the 3-batch CDC history — counting
    // IVM (z-set + group-local recompute), every refresh O(batch +
    // touched buckets), exact under deletes for min/max/distinct too.
    // The oracle replays the netted final state and aggregates it from
    // scratch: maintained state == recomputed state, cross-engine.
    "q_ivm_agg" -> { (spark, dir) =>
      Ivm.readView(spark, ivmDir(spark, dir)).orderBy("lang")
    },

    // The maintained keyed mirror (copy-on-write bucketed table) after
    // build + one upsert/delete merge: replace-by-key, delete-wins,
    // absent-key deletes as no-ops — the netted state replays in SQL.
    "q_ivm_mirror" -> { (spark, dir) =>
      MergeTable.read(spark, mirrorDir(spark, dir)).orderBy("doc_id")
    })

  def oracleSql: Map[String, String] = baseOracleSql ++ Map(
    // the refresh benchmarks apply NET-ZERO churn pairs, so each ends
    // in exactly its twin's state and shares that oracle verbatim —
    // refresh-path correctness is oracle-gated, not just timed
    "q_ivm_refresh" -> baseOracleSql("q_ivm_agg"),
    "q_ivm_join_refresh" -> baseOracleSql("q_ivm_join_agg"),
    "q_ivm_join_minmax_refresh" -> baseOracleSql("q_ivm_join_minmax"),
    "q_ivm_mirror_refresh" -> baseOracleSql("q_ivm_mirror"))

  private val baseOracleSql: Map[String, String] = Map(
    "q_ivm_join_minmax" ->
      """WITH fact AS (
        |  SELECT o_custkey AS custkey,
        |         CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders WHERE o_orderkey % 9 <> 4
        |  UNION ALL
        |  SELECT o_custkey,
        |         CAST(floor(o_totalprice * 100) AS BIGINT) + 555
        |  FROM orders WHERE o_orderkey % 5 = 0),
        |dim AS (
        |  SELECT c_custkey AS custkey,
        |         CASE WHEN c_custkey % 7 = 3 THEN 'AUG'
        |              ELSE c_mktsegment END AS segment
        |  FROM customer)
        |SELECT segment,
        |       CAST(count(*) AS BIGINT) AS orders,
        |       min(cents) AS min_cents,
        |       max(cents) AS max_cents,
        |       CAST(count(DISTINCT cents) AS BIGINT) AS n_prices,
        |       CAST(sum(cents) AS BIGINT) AS revenue
        |FROM fact JOIN dim USING (custkey)
        |GROUP BY segment ORDER BY segment""".stripMargin,
    "q_ivm_join_agg" ->
      """WITH fact AS (
        |  SELECT o_custkey AS custkey,
        |         CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders WHERE o_orderkey % 9 <> 4
        |  UNION ALL
        |  SELECT o_custkey,
        |         CAST(floor(o_totalprice * 100) AS BIGINT) + 555
        |  FROM orders WHERE o_orderkey % 5 = 0),
        |dim AS (
        |  SELECT c_custkey AS custkey,
        |         CASE WHEN c_custkey % 7 = 3 THEN 'AUG'
        |              ELSE c_mktsegment END AS segment
        |  FROM customer)
        |SELECT segment,
        |       CAST(count(*) AS BIGINT) AS orders,
        |       CAST(sum(cents) AS BIGINT) AS revenue,
        |       CAST(sum(CAST(cents AS DOUBLE)) / count(cents) AS DOUBLE)
        |         AS avg_cents
        |FROM fact JOIN dim USING (custkey)
        |GROUP BY segment ORDER BY segment""".stripMargin,
    "q_ivm_agg" ->
      """WITH live AS (
        |  SELECT doc_id, lang, source, n_chars FROM documents
        |  WHERE (doc_id % 5 <> 0 AND doc_id % 9 <> 4)
        |     OR (doc_id % 5 = 0 AND doc_id % 2 = 0)),
        |final AS (
        |  SELECT doc_id, lang,
        |         CASE WHEN doc_id % 7 = 3 THEN 'aug' ELSE source END AS source,
        |         CASE WHEN doc_id % 7 = 3 THEN n_chars + 1000
        |              ELSE n_chars END AS n_chars
        |  FROM live)
        |SELECT lang,
        |       CAST(count(*) AS BIGINT) AS cnt,
        |       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |       min(doc_id) AS min_id,
        |       max(n_chars) AS max_chars,
        |       CAST(sum(CAST(n_chars AS DOUBLE)) / count(n_chars) AS DOUBLE)
        |         AS avg_chars,
        |       CAST(count(DISTINCT source) AS BIGINT) AS n_sources
        |FROM final GROUP BY lang ORDER BY lang""".stripMargin,
    "q_ivm_mirror" ->
      """SELECT doc_id, lang,
        |       CASE WHEN doc_id % 7 = 3 THEN 'aug' ELSE source END AS source,
        |       CASE WHEN doc_id % 7 = 3 THEN n_chars + 1000
        |            ELSE n_chars END AS n_chars
        |FROM documents
        |WHERE (doc_id % 5 <> 0 OR doc_id % 2 = 0 OR doc_id % 7 = 3)
        |  AND doc_id % 9 <> 4
        |ORDER BY doc_id""".stripMargin)
}
