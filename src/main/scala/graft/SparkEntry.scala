package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{CorpusOps, ExtOps, IvmOps, PipelineOps, RefOps, ScaleOps, Tpch, Tpch2, Tpch3}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Tpch.queries("q1_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2 (op_*), plus
    * headline analytical queries (q*) and the LLM-pipeline operators. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RefOps.queries ++ Tpch.queries ++ Tpch2.queries ++ Tpch3.queries ++
      PipelineOps.queries ++ ExtOps.queries ++ ScaleOps.queries ++
      CorpusOps.queries ++ IvmOps.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    RefOps.oracleSql ++ Tpch.oracleSql ++ Tpch2.oracleSql ++ Tpch3.oracleSql ++
      PipelineOps.oracleSql ++ ExtOps.oracleSql ++ ScaleOps.oracleSql ++
      CorpusOps.oracleSql ++ IvmOps.oracleSql

  /** Headline subset timed by Bench (BENCH_r{N}.json) — the round-1
    * analytical core plus the round-4 scale operators, so regressions
    * in the new machinery (sketches, bloom join, sessionization,
    * incremental dedup, vocab/segment pipelines) are driver-visible. */
  def benchQueries: Seq[String] = Seq(
    "q1_pricing_summary", "q3_shipping_priority", "q5_local_supplier",
    "q6_revenue", "q_window_top_customers", "q_events_daily",
    "op_flatmap", "op_cogroup", "op_reduce",
    "q18_large_volume", "dedup_minhash",
    "q_heavy_hitters", "op_bloom_join", "q_sessionize",
    "dedup_incremental", "dedup_incremental_idx",
    "text_vocab_ids", "text_seg_dedup", "text_dup_ngram_frac",
    "sim_topk_ivf_idx", "text_bpe_tokens",
    // round 8: semantic dedup, BM25 retrieval and LM surprisal join
    // the headline set (totals are not comparable to BENCH_r07 and
    // earlier — 24 queries vs 21)
    "q_semdedup", "q_bm25_topk", "q_lm_surprisal",
    // round 8 cont.: fuzzy entity lookup, NB quality labeling, PPS
    // sampling, persisted-BM25 probe (28 queries; the idx form's
    // min-of-3 captures the steady-state probe — build amortizes on
    // run 1, like dedup_incremental_idx)
    "q_editdist_lookup", "q_nb_quality", "q_pps_sample",
    "q_bm25_topk_idx",
    // round 8 cont. (session 2): snapshot diff (full-outer digest
    // join) and table profile (multi-distinct expand) — two plan
    // classes the headline set didn't cover (30 queries)
    "q_dataset_diff", "q_profile",
    // round 9: the steady-state RAG first stage — TermIndex + IvfIndex
    // probes fused by RRF; min-of-3 times the index-probe fusion,
    // builds amortize on run 1 (31 queries)
    "q_hybrid_rrf_idx",
    // round 9 cont.: deterministic HLL — the sketch-family scan+agg
    // shape (32 queries)
    "q_hll_distinct",
    // round 9 cont. (session 4): weighted sampling (per-group window +
    // global TakeOrderedAndProject) — the A-ES exponential-clocks
    // samplers (34 queries)
    "q_weighted_sample", "q_weighted_sample_global",
    // round 9 cont. (session 5): the fourth persisted family — exact
    // dedup via the digest index; min-of-3 times the steady-state
    // probe (bloom pass + candidate-sized verify), build amortizes on
    // run 1 like its siblings (35 queries)
    "dedup_exact_idx",
    // round 12: the maintained-view layer's STEADY-STATE REFRESH cost
    // (net-zero churn pair per run: two commits + gc + view read;
    // builds amortize on run 1) — mt/ivm/jivm regressions now show in
    // the driver artifact (38 queries; totals not comparable to r11)
    "q_ivm_refresh", "q_ivm_join_refresh", "q_ivm_mirror_refresh",
    // round 13: the NON-INVERTIBLE maintained join's refresh (joined-
    // projection z-set + group-local recompute) joins its three
    // siblings (39 queries; totals not comparable to r12)
    "q_ivm_join_minmax_refresh")
}
