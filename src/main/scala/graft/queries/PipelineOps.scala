package graft.queries

import graft.Tables
import graft.functions.{Multimodal, TextFunctions => TF}
import graft.operators.{Dedup, DigestIndex, Graph, IvfIndex, MinhashIndex, Packing, Pq, Quality, Retrieval, Sampling, Similarity, TermIndex, Terms}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * LLM-training-data pipeline queries (dedup / similarity / text /
 * multimodal) over the documents and embeddings tables, with DuckDB
 * oracles wherever the algorithm is SQL-expressible — including the
 * simhash sketch and rolling fingerprint (md5-derived bits, replicated
 * in SQL below). Only the hyperplane/k-means/PQ ANN queries
 * (sim_topk_lsh, sim_topk_ivf, sim_topk_ivf_idx, sim_topk_pq) stay
 * rows-only: their pruning depends on signature/codebook internals a
 * SQL oracle would have to re-implement wholesale; instead their
 * RECALL against the oracled brute-force baseline is asserted in
 * PipelineSpec (and for PQ, exactness of the re-ranked cosines) —
 * AND each family's candidate rule is additionally pinned cross-engine
 * by a fully-oracled configuration: sim_topk_ivf0 / sim_topk_ivf0_idx
 * (frozen-seed IVF, inline and persisted-LSM forms), sim_topk_lsh_q
 * (integer-signature banded LSH), and sim_topk_pq0 (frozen-seed
 * PQ/ADC — encode, lookup-table ranking and re-rank all replayed);
 * q_hybrid_rrf_idx pins the whole indexed retrieval-fusion stage.
 */
object PipelineOps {

  private val EmbDim = 64 // corpus embedding dimensionality (both SFs)

  /** DuckDB SQL for the explicit 64-term dot product — matches
    * Similarity.dotUnrolled's left-associated double arithmetic. */
  private def dotSql(a: String, b: String): String =
    (1 to EmbDim).map(i =>
      s"CAST($a.embedding[$i] AS DOUBLE)*CAST($b.embedding[$i] AS DOUBLE)")
      .mkString(" + ")
  private def cosSql(a: String, b: String): String =
    s"(${dotSql(a, b)}) / (sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)}))"

  /** Per-JVM memo of built minhash indexes, keyed by corpus dir: the
    * dedup_incremental_idx query is a pure function of (spark, dir),
    * so the index is built once per process and probed thereafter —
    * Bench's later runs time the steady-state ingest, and a fresh JVM
    * always rebuilds (no stale on-disk index can leak across code
    * versions). */
  private val mhIndexes =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Per-JVM memo of built IVF indexes (same contract as mhIndexes). */
  private val ivfIndexes =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Per-JVM memo of corpus-trained BPE vocabs keyed by corpus dir —
    * training is deterministic (one wordcount aggregate + driver-side
    * merge learning), so later bench runs time ENCODING, not
    * re-training. */
  private val bpeVocabs =
    new java.util.concurrent.ConcurrentHashMap[String, graft.functions.Bpe.Vocab]()
  private def bpeVocabFor(spark: SparkSession, dir: String): graft.functions.Bpe.Vocab =
    bpeVocabs.computeIfAbsent(dir, _ =>
      graft.functions.Bpe.train(Tables.load(spark, dir, "documents"), "text"))
  private def minhashIndexFor(spark: SparkSession, dir: String,
                              existing: DataFrame): String =
    mhIndexes.computeIfAbsent(dir, _ => {
      val d = java.nio.file.Files.createTempDirectory("graft_mhidx_q").toString
      MinhashIndex.build(spark, existing, "doc_id", "text", d,
        MinhashIndex.Config())
      d
    })

  /** Per-JVM memo of built digest indexes (same contract as
    * mhIndexes — first run pays the build, later runs time the
    * steady-state probe). */
  private val digestIndexes =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def digestIndexFor(spark: SparkSession, dir: String,
                             corpus: DataFrame): String =
    digestIndexes.computeIfAbsent(dir, _ => {
      val d = java.nio.file.Files.createTempDirectory("graft_didx_q").toString
      DigestIndex.build(spark, corpus, "doc_id", "text", d).unpersist()
      d
    })

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // --- text analysis -------------------------------------------------
    "text_token_stats" -> { (spark, dir) =>
      Tables.load(spark, dir, "documents")
        .select(col("doc_id"),
          TF.wsTokenCount(col("text")).cast("long").as("n_ws"),
          TF.bpeTokenCount(col("text")).cast("long").as("n_bpe"),
          length(col("text")).cast("long").as("n_chars_obs"))
        .orderBy("doc_id")
    },

    "text_quality" -> { (spark, dir) =>
      Tables.load(spark, dir, "documents")
        .select(col("doc_id"),
          TF.alphaRatio(col("text")).as("alpha_ratio"),
          TF.stopwordRatio(col("text")).as("stopword_ratio"),
          TF.qualityScore(col("text")).as("quality"))
        .orderBy("doc_id")
    },

    "text_langid" -> { (spark, dir) =>
      Tables.load(spark, dir, "documents")
        .select(col("doc_id"), TF.langId(col("text")).as("lang_pred"))
        .orderBy("doc_id")
    },

    "text_fingerprint" -> { (spark, dir) =>
      Tables.load(spark, dir, "documents")
        .select(col("doc_id"), TF.fingerprintMd5(col("text")).as("digest"))
        .orderBy("doc_id")
    },

    // rolling polynomial fingerprint over md5-derived token values —
    // engine-replicable, oracled below via DuckDB list_reduce.
    "text_fingerprint_rolling" -> { (spark, dir) =>
      Tables.load(spark, dir, "documents")
        .select(col("doc_id"), TF.fingerprintRolling(col("text")).as("fp"))
        .orderBy("doc_id")
    },

    // --- dedup ----------------------------------------------------------
    "dedup_exact" -> { (spark, dir) =>
      Dedup.exact(Tables.load(spark, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")
    },

    // maxShingleDf bounds the hot-shingle quadratic (see Dedup.dfCapped);
    // the oracle mirrors the cap, so it is load-bearing semantics, not a
    // hint (on this corpus max df is 25, so the 100 cap drops nothing).
    "dedup_ngram_jaccard" -> { (spark, dir) =>
      Dedup.ngramJaccardPairs(Tables.load(spark, dir, "documents"),
        "doc_id", "text", k = 3, minJ = 0.5, maxShingleDf = 100)
        .orderBy("a", "b")
    },

    // Asymmetric containment pairs (doc-in-doc / excerpt detection):
    // C(A→B) = |A∩B|/|A| over the same capped trigram shingles. Exact
    // inverted-index join, both orientations kept.
    "dedup_containment" -> { (spark, dir) =>
      Dedup.containmentPairs(Tables.load(spark, dir, "documents"),
        "doc_id", "text", k = 3, minC = 0.6, maxShingleDf = 100)
        .orderBy("a", "b")
    },

    // MinHash+LSH with exact verification; deterministic. Oracle = the
    // exact-Jaccard pair set (LSH recall at these parameters is 1.0 on
    // this corpus — validated empirically; misses would show instantly
    // in the hash compare).
    "dedup_minhash" -> { (spark, dir) =>
      Dedup.minhashDupPairs(Tables.load(spark, dir, "documents"),
        "doc_id", "text", k = 3, numPerms = 64, bandRows = 2, minJ = 0.5,
        maxShingleDf = 100)
        .orderBy("a", "b")
    },

    // SimHash near-dup pairs. md5-derived sketch bits are
    // engine-replicable, so this carries a full DuckDB oracle that
    // mirrors BOTH the sketch and the 4×16-bit pigeonhole candidate
    // rule (complete for dist<=3; block-sharing is part of the
    // operator's contract at maxDist=8).
    "dedup_simhash" -> { (spark, dir) =>
      Dedup.simhashDupPairs(Tables.load(spark, dir, "documents"),
        "doc_id", "text", maxDist = 8)
        .withColumn("dist", col("dist").cast("long"))
        .orderBy("a", "b")
    },

    // Dup clusters: connected components over the (exact-verified)
    // minhash pair set — the canonical-doc-per-cluster step.
    "dedup_components" -> { (spark, dir) =>
      val pairs = Dedup.minhashDupPairs(Tables.load(spark, dir, "documents"),
        "doc_id", "text", k = 3, numPerms = 64, bandRows = 2, minJ = 0.5,
        maxShingleDf = 100)
      Dedup.connectedComponents(pairs).orderBy("doc_id")
    },

    // Triangle enumeration over the dup graph — clique-vs-hub cluster
    // structure. Degree-oriented wedge join; output = id-sorted
    // triples, exactly what the id-ordered oracle recomputes.
    "q_graph_triangles" -> { (spark, dir) =>
      val pairs = Dedup.ngramJaccardPairs(Tables.load(spark, dir, "documents"),
        "doc_id", "text", k = 3, minJ = 0.3, maxShingleDf = 100)
      Graph.triangles(pairs).orderBy("ta", "tb", "tc")
    },

    // Integer-quantized fixed-iteration PageRank over the dup graph —
    // duplication-web centrality as a canonical-pick signal. Exact
    // 64-bit arithmetic (floor divisions), so the ranks carry a full
    // oracle — float PageRank never could.
    "q_pagerank" -> { (spark, dir) =>
      val pairs = Dedup.ngramJaccardPairs(Tables.load(spark, dir, "documents"),
        "doc_id", "text", k = 3, minJ = 0.3, maxShingleDf = 100)
      Graph.pageRankInt(pairs, iters = 3).orderBy("doc_id")
    },

    // Exact threshold pair join via balanced block-pair partitioning —
    // equi-join plan, no BNLJ (asserted in PlanSpec). At this corpus's
    // threshold (0.4, with dense background just below) exact output is
    // provably all-pairs work; cosineDupPairsLSH is the sub-quadratic
    // path for separated thresholds (recall-tested in PipelineSpec).
    "dedup_embedding" -> { (spark, dir) =>
      Similarity.cosineDupPairs(Tables.load(spark, dir, "embeddings"),
        "vec_id", "embedding", EmbDim, minCos = 0.4)
        .orderBy("a", "b")
    },

    // Semantic dedup (SemDeDup): seed-clustered embedding space
    // (iters=0 → the clustering itself is exactly SQL-replayable),
    // min-id representative kept per within-cluster cos>=tau
    // neighborhood. The one dedup family the engine lacked.
    "q_semdedup" -> { (spark, dir) =>
      Similarity.semDedup(Tables.load(spark, dir, "embeddings"),
        "vec_id", "embedding", EmbDim, nClusters = 8, iters = 0, tau = 0.45)
        .orderBy("vec_id")
    },

    // --- similarity search ----------------------------------------------
    "sim_topk_bruteforce" -> { (spark, dir) =>
      val emb = Tables.load(spark, dir, "embeddings")
      Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 10),
        "vec_id", "embedding", EmbDim, k = 5)
        .orderBy("query_id", "rnk")
    },

    // kNN pseudo-labeling: majority label among the 10 exact nearest
    // neighbors (tie → smaller label). Neighbor sets = the oracled
    // brute-force ranking, votes are integers → predictions oracled.
    "q_knn_classify" -> { (spark, dir) =>
      val emb = Tables.load(spark, dir, "embeddings")
      Similarity.knnClassify(emb, emb.filter(col("vec_id") < 10),
        "vec_id", "embedding", "label", EmbDim, k = 10)
        .orderBy("query_id")
    },

    // Hybrid retrieval: BM25 (bigram terms) + dense cosine fused by
    // integer-scaled reciprocal-rank fusion. Probes = docs 0..9 (the
    // sim_topk probe set), corpus = the rest; inner lists of 20 fuse
    // to a final top-5. Ranks are the only ranker output used, so the
    // fusion is bit-exact cross-engine.
    "q_hybrid_rrf" -> { (spark, dir) =>
      val d = Tables.load(spark, dir, "documents")
      val e = Tables.load(spark, dir, "embeddings")
        .withColumnRenamed("vec_id", "doc_id")
      Retrieval.hybridRrf(
        d.filter(col("doc_id") >= 10), d.filter(col("doc_id") < 10),
        e.filter(col("doc_id") >= 10), e.filter(col("doc_id") < 10),
        "doc_id", "text", "embedding", EmbDim,
        kInner = 20, k = 5, terms = Terms.bigramTerms)
        .orderBy("probe_id", "rank")
    },

    // The INDEXED hybrid retrieval stage, fully oracled: the lexical
    // leg probes a persisted TermIndex (exact BM25 by contract — the
    // inline leg's oracle replays it verbatim) and the dense leg
    // probes a persisted IvfIndex at the iters=0 frozen-seed
    // configuration (the sim_topk_ivf0_idx replay), fused by the same
    // all-integer RRF as q_hybrid_rrf — so the ENTIRE steady-state
    // RAG first stage (two LSM index probes + fusion) is pinned
    // cross-engine, not just its legs.
    "q_hybrid_rrf_idx" -> { (spark, dir) =>
      val d = Tables.load(spark, dir, "documents")
      val e = Tables.load(spark, dir, "embeddings")
        .withColumnRenamed("vec_id", "doc_id")
      // gate opt-out: this query's contract is EQUALITY with the
      // inline hybrid (both legs always run) — a deliberate exact
      // sparse leg over document-shaped probes, oracled
      val tCfg = TermIndex.Config(buckets = 8, termsTag = "bigram",
        maxCandidateFraction = TermIndex.ExactUnbounded)
      val vCfg = IvfIndex.Config(dim = EmbDim, nList = 8, iters = 0,
        maxImbalance = 1e12)
      val tDir = ivfIndexes.computeIfAbsent(dir + "#hyb_t", _ => {
        val p = java.nio.file.Files
          .createTempDirectory("graft_hyb_tidx").toString + "/idx"
        TermIndex.build(spark, d.filter(col("doc_id") >= 10),
          "doc_id", "text", p, tCfg, Terms.bigramTerms)
        p
      })
      val vDir = ivfIndexes.computeIfAbsent(dir + "#hyb_v", _ => {
        val p = java.nio.file.Files
          .createTempDirectory("graft_hyb_ivf").toString + "/idx"
        IvfIndex.build(spark, e.filter(col("doc_id") >= 10),
          "doc_id", "embedding", p, vCfg)
        p
      })
      Retrieval.hybridRrfIndexed(spark, tDir, vDir,
        d.filter(col("doc_id") < 10), e.filter(col("doc_id") < 10),
        "doc_id", "text", "embedding", kInner = 20, k = 5,
        terms = Terms.bigramTerms, termCfg = tCfg, nProbe = 2)
        .orderBy("probe_id", "rank")
    },

    // hyperplane-LSH ANN — planes not SQL-replicable → rows-only;
    // recall vs brute force asserted in PipelineSpec.
    "sim_topk_lsh" -> { (spark, dir) =>
      val emb = Tables.load(spark, dir, "embeddings")
      Similarity.lshTopK(emb, emb.filter(col("vec_id") < 10),
        "vec_id", "embedding", EmbDim, k = 5)
        .orderBy("query_id", "rnk")
    },

    // Quantized-LSH ANN — the fully-ORACLED banded-LSH configuration:
    // integer sign signatures over the int8 codes (the emb_project
    // projection machinery), so the candidate rule AND the exact
    // float-cosine re-rank both replay verbatim in DuckDB.
    // sim_topk_lsh stays the float-hyperplane production path; this
    // pins the banded candidate semantics cross-engine the way
    // sim_topk_ivf0 pins IVF's.
    "sim_topk_lsh_q" -> { (spark, dir) =>
      val emb = Tables.load(spark, dir, "embeddings")
      Similarity.lshTopKQuantized(emb, emb.filter(col("vec_id") < 10),
        "vec_id", "embedding", EmbDim, k = 5)
        .orderBy("query_id", "rnk")
    },

    // Product-quantized ANN (the memory/IO scale path: m one-byte
    // codes per vector instead of 4·dim bytes, ADC lookup-table
    // scoring, exact re-rank of the top k·refine) — codebooks not
    // SQL-replicable → rows-only; recall vs brute force AND exactness
    // of the emitted cosines asserted in PipelineSpec.
    "sim_topk_pq" -> { (spark, dir) =>
      val emb = Tables.load(spark, dir, "embeddings")
      Pq.adcTopK(emb, emb.filter(col("vec_id") < 10),
        "vec_id", "embedding", EmbDim, k = 5)
        .orderBy("query_id", "rnk")
    },

    // PQ/ADC at iters=0 — the codebooks are the 32 lowest-id vectors'
    // subvectors VERBATIM, so encode (per-subspace argmin squared-L2,
    // ties to the lowest entry), the ADC lookup-table ranking, AND the
    // exact re-rank all replay in SQL: PQ joins IVF (sim_topk_ivf0 /
    // sim_topk_ivf0_idx) and LSH (sim_topk_lsh_q) as the third ANN
    // family carrying a fully-oracled configuration pin.
    "sim_topk_pq0" -> { (spark, dir) =>
      val emb = Tables.load(spark, dir, "embeddings")
      Pq.adcTopK(emb, emb.filter(col("vec_id") < 10),
        "vec_id", "embedding", EmbDim, k = 5, iters = 0)
        .withColumn("rnk", col("rnk").cast("long"))
        .orderBy("query_id", "rnk")
    },

    // IVF ANN (centroid-partitioned scale path) — k-means lists not
    // SQL-replicable → rows-only; recall vs brute force asserted in
    // PipelineSpec.
    "sim_topk_ivf" -> { (spark, dir) =>
      val emb = Tables.load(spark, dir, "embeddings")
      Similarity.ivfTopK(emb, emb.filter(col("vec_id") < 10),
        "vec_id", "embedding", EmbDim, k = 5)
        .orderBy("query_id", "rnk")
    },

    // The SAME IVF machinery at iters=0, where centroids are the eight
    // lowest-id seed vectors VERBATIM — fully SQL-replayable, so the
    // whole candidate rule (seed ranking with index tie-break, nProbe
    // probe, one-list membership, exact within-list cosine re-rank) is
    // pinned cross-engine instead of only recall-gated. The q_semdedup
    // oracle's assignment CTE, extended with the probe/re-rank stages.
    "sim_topk_ivf0" -> { (spark, dir) =>
      val emb = Tables.load(spark, dir, "embeddings")
      Similarity.ivfTopK(emb, emb.filter(col("vec_id") < 10),
        "vec_id", "embedding", EmbDim, k = 5, nList = 8, nProbe = 2,
        iters = 0)
        .withColumn("rnk", col("rnk").cast("long"))
        .orderBy("query_id", "rnk")
    },

    // The PERSISTED index at the same iters=0 configuration: seeds are
    // the eight lowest-id vectors of the BUILD slice, the append slice
    // is assigned to those frozen centroids (exactly appendImpl's
    // contract), and the driver-side probe ranking is the same
    // dot/|c|-desc-ties-by-index rule — so the whole LSM candidate
    // path (build segment + append segment + list pruning + exact
    // re-rank) replays in SQL. maxImbalance is effectively disabled:
    // the drift guard's retrain would re-seed, which is exactly the
    // freezing this oracle pins against.
    "sim_topk_ivf0_idx" -> { (spark, dir) =>
      val emb = Tables.load(spark, dir, "embeddings")
      val cfg = IvfIndex.Config(dim = EmbDim, nList = 8, iters = 0,
        maxImbalance = 1e12)
      val idxDir = ivfIndexes.computeIfAbsent(dir + "#ivf0", _ => {
        val d = java.nio.file.Files
          .createTempDirectory("graft_ivf0_idx").toString + "/idx"
        IvfIndex.build(spark, emb.filter(col("vec_id") % 5 =!= 0),
          "vec_id", "embedding", d, cfg)
        IvfIndex.append(spark, d, emb.filter(col("vec_id") % 5 === 0),
          "vec_id", "embedding", cfg)
        d
      })
      IvfIndex.topK(spark, idxDir, emb.filter(col("vec_id") < 10),
        "vec_id", "embedding", k = 5, nProbe = 2)
        .withColumn("rnk", col("rnk").cast("long"))
        .orderBy("query_id", "rnk")
    },

    // The persisted index's STEADY-STATE CDC configuration, fully
    // oracled (round 10, closing the gap between "the oracled twin
    // pins the machinery" and "the CDC'd index state itself is
    // pinned"): frozen iters=0 seeds, build + append, then ONE
    // applyCdc commit that re-embeds vec_id%7==3 (negated vectors —
    // float negation is exact, so cosines replay bit-for-bit) and
    // deletes vec_id%9==4, delete-wins on the overlap. The probe runs
    // against the tombstone-masked LSM state; the oracle replays the
    // final live set (non-touched rows ∪ upserted negations),
    // assignment to the FROZEN original seeds, 2-probe candidate rule
    // and exact re-rank in SQL.
    "sim_topk_ivf0_cdc_idx" -> { (spark, dir) =>
      val emb = Tables.load(spark, dir, "embeddings")
      val cfg = IvfIndex.Config(dim = EmbDim, nList = 8, iters = 0,
        maxImbalance = 1e12)
      val idxDir = ivfIndexes.computeIfAbsent(dir + "#ivf0cdc", _ => {
        val d = java.nio.file.Files
          .createTempDirectory("graft_ivf0_cdc_idx").toString + "/idx"
        IvfIndex.build(spark, emb.filter(col("vec_id") % 5 =!= 0),
          "vec_id", "embedding", d, cfg)
        IvfIndex.append(spark, d, emb.filter(col("vec_id") % 5 === 0),
          "vec_id", "embedding", cfg)
        IvfIndex.applyCdc(spark, d,
          emb.filter(col("vec_id") % 7 === 3)
            .select(col("vec_id"),
              transform(col("embedding"), x => -x).as("embedding")),
          emb.filter(col("vec_id") % 9 === 4).select("vec_id"),
          "vec_id", "embedding", cfg)
        d
      })
      IvfIndex.topK(spark, idxDir, emb.filter(col("vec_id") < 10),
        "vec_id", "embedding", k = 5, nProbe = 2)
        .withColumn("rnk", col("rnk").cast("long"))
        .orderBy("query_id", "rnk")
    },

    // IVF ANN against the INCREMENTAL persisted index (IvfIndex):
    // build over 80% of the corpus, append the rest against the frozen
    // centroids (the continuous-ingest path), query the committed
    // version. Index memoized per corpus dir like the minhash index —
    // bench reruns time the steady-state PROBE, a fresh JVM rebuilds.
    // Rows-only like sim_topk_ivf (k-means lists not SQL-replicable);
    // recall + append==frozen-assignment equivalence asserted in
    // PipelineSpec/IvfIndexSpec.
    "sim_topk_ivf_idx" -> { (spark, dir) =>
      val emb = Tables.load(spark, dir, "embeddings")
      val cfg = IvfIndex.Config(dim = EmbDim, nList = 16, iters = 2)
      val idxDir = ivfIndexes.computeIfAbsent(dir, _ => {
        val d = java.nio.file.Files
          .createTempDirectory("graft_ivf_idx").toString + "/idx"
        IvfIndex.build(spark, emb.filter(col("vec_id") % 5 =!= 0),
          "vec_id", "embedding", d, cfg)
        IvfIndex.append(spark, d, emb.filter(col("vec_id") % 5 === 0),
          "vec_id", "embedding", cfg)
        d
      })
      IvfIndex.topK(spark, idxDir, emb.filter(col("vec_id") < 10),
        "vec_id", "embedding", k = 5)
        .orderBy("query_id", "rnk")
    },

    // IVF-PQ persisted index: same incremental build/append shape,
    // but the PQ layer makes steady-state probes read m-byte codes +
    // stored norm from the pruned partitions instead of full vectors
    // (32x narrower at dim 64), with an exact re-rank of the ADC top
    // k·refine whose candidate ids are pushed into the vector scan.
    // Rows-only like the other ANN queries; recall, exact-cosine and
    // frozen-books assertions in IvfIndexSpec.
    "sim_topk_ivfpq_idx" -> { (spark, dir) =>
      val emb = Tables.load(spark, dir, "embeddings")
      val cfg = IvfIndex.Config(dim = EmbDim, nList = 16, iters = 2,
        pq = Some(IvfIndex.PqConfig()))
      val idxDir = ivfIndexes.computeIfAbsent(dir + "#pq", _ => {
        val d = java.nio.file.Files
          .createTempDirectory("graft_ivfpq_idx").toString + "/idx"
        IvfIndex.build(spark, emb.filter(col("vec_id") % 5 =!= 0),
          "vec_id", "embedding", d, cfg)
        IvfIndex.append(spark, d, emb.filter(col("vec_id") % 5 === 0),
          "vec_id", "embedding", cfg)
        d
      })
      IvfIndex.topK(spark, idxDir, emb.filter(col("vec_id") < 10),
        "vec_id", "embedding", k = 5)
        .orderBy("query_id", "rnk")
    },

    // PII scrubbing: emails + long digit runs redacted. The synthetic
    // corpus contains no PII, so the query PLANTS deterministic PII
    // (derived from doc_id) into each document and verifies redaction
    // end-to-end — the oracle builds the identical augmented text.
    "text_redact" -> { (spark, dir) =>
      val dirty = concat(col("text"), lit(" contact user"),
        col("doc_id").cast("string"), lit("@example.com or 5551234567"))
      Tables.load(spark, dir, "documents")
        .select(col("doc_id"),
          length(dirty).cast("long").as("n_before"),
          length(TF.redactPii(dirty)).cast("long").as("n_after"),
          TF.redactPii(dirty).as("clean"))
        .orderBy("doc_id")
    },

    // Repetition/quality signal: distinct-token ratio per doc.
    "text_repetition" -> { (spark, dir) =>
      Tables.load(spark, dir, "documents")
        .select(col("doc_id"),
          TF.wsTokenCount(col("text")).cast("long").as("n_tokens"),
          size(array_distinct(TF.tokens(col("text")))).cast("long").as("n_distinct"),
          TF.distinctTokenRatio(col("text")).as("distinct_ratio"))
        .orderBy("doc_id")
    },

    // The deduplicated corpus itself: keep the canonical (min-id) doc
    // per duplicate cluster, drop the rest.
    "dedup_canonical" -> { (spark, dir) =>
      val d = Tables.load(spark, dir, "documents")
      val pairs = Dedup.minhashDupPairs(d, "doc_id", "text",
        k = 3, numPerms = 64, bandRows = 2, minJ = 0.5, maxShingleDf = 100)
      Dedup.keepCanonical(d, "doc_id", pairs)
        .select("doc_id").orderBy("doc_id")
    },

    // The whole training-data story composed end-to-end, oracle-exact:
    // quality filter → minhash dedup to canonical docs → deterministic
    // split → per-split corpus stats.
    "pipeline_end_to_end" -> { (spark, dir) =>
      val d = Tables.load(spark, dir, "documents")
      val filtered = d.filter(TF.qualityScore(col("text")) >= 0.45)
      val pairs = Dedup.minhashDupPairs(filtered, "doc_id", "text",
        k = 3, numPerms = 64, bandRows = 2, minJ = 0.5, maxShingleDf = 100)
      val kept = Dedup.keepCanonical(filtered, "doc_id", pairs)
      Sampling.assignSplit(kept, "doc_id",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .groupBy("split")
        .agg(count(lit(1)).as("n_docs"),
          sum(TF.wsTokenCount(col("text")).cast("long")).as("n_tokens"))
        .orderBy("split")
    },

    // --- corpus organization ---------------------------------------------
    // Deterministic hash split: membership is a pure function of the
    // key's md5 bucket — stable across reruns, engines, repartitions.
    "q_hash_split" -> { (spark, dir) =>
      Sampling.assignSplit(Tables.load(spark, dir, "documents"), "doc_id",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .select(col("doc_id"), col("split"))
        .orderBy("doc_id")
    },

    // Leakage-safe split: hash-split by duplicate-CLUSTER id, so near-
    // duplicate documents can never straddle train/test — membership is
    // a pure function of the cluster's canonical id.
    "q_split_by_cluster" -> { (spark, dir) =>
      val d = Tables.load(spark, dir, "documents")
      val pairs = Dedup.minhashDupPairs(d, "doc_id", "text",
        k = 3, numPerms = 64, bandRows = 2, minJ = 0.5, maxShingleDf = 100)
      val comp = Dedup.connectedComponents(pairs)
      val withComp = d.select(col("doc_id"))
        .join(comp, Seq("doc_id"), "left")
        .withColumn("component", coalesce(col("component"), col("doc_id")))
      Sampling.assignSplit(withComp, "component",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .select(col("doc_id"), col("component"), col("split"))
        .orderBy("doc_id")
    },

    // Sequence packing: token-budget bin per doc via the two-pass
    // distributed prefix sum (never a single-partition global window).
    "text_pack_bins" -> { (spark, dir) =>
      val withN = Tables.load(spark, dir, "documents")
        .select(col("doc_id"),
          TF.wsTokenCount(col("text")).cast("long").as("n_tokens"))
      Packing.packBins(withN, "doc_id", "n_tokens", capacity = 2048, parts = 8)
        .orderBy("doc_id")
    },

    // Systematic PPS sampling: ~100 docs picked proportional to token
    // count (token-budgeted subsample) — a grid of step = ⌊W/100⌋
    // points over the id-ordered token line, via the same two-pass
    // prefix sum as text_pack_bins. Pure 64-bit integer arithmetic →
    // cross-engine exact, long docs carry a multiplicity.
    "q_pps_sample" -> { (spark, dir) =>
      val withN = Tables.load(spark, dir, "documents")
        .select(col("doc_id"),
          TF.wsTokenCount(col("text")).cast("long").as("n_tokens"))
      Packing.ppsSample(withN, "doc_id", "n_tokens", m = 100, parts = 8)
        .orderBy("doc_id")
    },

    // Real-BPE token counts (merges learned from this corpus — see
    // functions.Bpe): ws count + regex approximation alongside, so the
    // drift the approximation introduces is itself measurable. Learned
    // merges aren't SQL-expressible → rows-only; the encoder is
    // property-tested against an independent replay-the-merges
    // implementation in BpeSpec.
    "text_bpe_tokens" -> { (spark, dir) =>
      val v = bpeVocabFor(spark, dir)
      Tables.load(spark, dir, "documents")
        .select(col("doc_id"),
          TF.wsTokenCount(col("text")).cast("long").as("n_ws"),
          TF.bpeTokenCount(col("text")).cast("long").as("n_bpe_regex"),
          graft.functions.Bpe.bpeTokenCountF(col("text"), v)
            .cast("long").as("n_bpe"))
        .orderBy("doc_id")
    },

    // Sequence packing driven by the REAL tokenizer — the form a
    // training pipeline actually runs (bin shapes move materially when
    // counts come from learned merges instead of the regex
    // approximation). Rows-only; packing invariants (capacity, no doc
    // lost, deterministic bins) asserted in BpeSpec.
    "text_pack_bins_bpe" -> { (spark, dir) =>
      val v = bpeVocabFor(spark, dir)
      val withN = Tables.load(spark, dir, "documents")
        .select(col("doc_id"),
          graft.functions.Bpe.bpeTokenCountF(col("text"), v)
            .cast("long").as("n_tokens"))
      Packing.packBins(withN, "doc_id", "n_tokens", capacity = 2048, parts = 8)
        .orderBy("doc_id")
    },

    // Per-language top-10 vocabulary: two-phase top-k — the (lang,
    // token) count aggregate is uniform; the per-lang window then ranks
    // |vocab| rows, not |corpus| rows.
    "text_top_tokens" -> { (spark, dir) =>
      val tok = Tables.load(spark, dir, "documents")
        .select(TF.langId(col("text")).as("lang"),
          explode(TF.tokens(col("text"))).as("tok"))
      val counts = tok.groupBy("lang", "tok").agg(count(lit(1)).as("cnt"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("lang").orderBy(col("cnt").desc, col("tok"))
      counts.withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 10)
        .select("lang", "rnk", "tok", "cnt")
        .orderBy("lang", "rnk")
    },

    // int8 quantization audit: per-vector scale + integer summary of
    // the quantized values (sum/min/max — array columns stay out of the
    // driver's hash compare; the integer summary pins every element).
    "emb_quantize" -> { (spark, dir) =>
      val q = Similarity.int8Quantize(col("embedding"))
      Tables.load(spark, dir, "embeddings")
        .withColumn("__q", q)
        .select(col("vec_id"), col("__q.scale").as("scale"),
          aggregate(col("__q.q"), lit(0L), (a, x) => a + x).as("q_sum"),
          array_min(col("__q.q")).cast("long").as("q_min"),
          array_max(col("__q.q")).cast("long").as("q_max"))
        .orderBy("vec_id")
    },

    // Embedding-space outlier scoring: cosine of each vector to its
    // label's integer-mean centroid (int8 codes → exact ints into the
    // final float ops) — the prune-far-from-centroid curation step,
    // fully oracled.
    "emb_centroid_outliers" -> { (spark, dir) =>
      Similarity.centroidCos(Tables.load(spark, dir, "embeddings"),
        "vec_id", "embedding", "label", EmbDim)
        .orderBy("vec_id")
    },

    // Integer random projection (±1 md5-derived matrix over the int8
    // codes): 64 → 16 dims, cross-engine exact — the JL step that cuts
    // every downstream vector-shuffle byte count 4×.
    "emb_project" -> { (spark, dir) =>
      Similarity.randomProject(Tables.load(spark, dir, "embeddings"),
        "vec_id", "embedding", EmbDim, dOut = 16)
        .orderBy("vec_id")
    },

    // Incremental dedup: the newest ~10% of documents (by hash bucket —
    // the "today's crawl" batch) deduped against the existing corpus
    // and within itself; old-old pairs are previous ingests' work and
    // are never re-paired. Output = full pair set minus old-old pairs.
    "dedup_incremental" -> { (spark, dir) =>
      val d = Tables.load(spark, dir, "documents")
      val isNew =
        Sampling.hashBucket(col("doc_id")) >= lit(Sampling.cuts(Seq(0.9))(1))
      Dedup.minhashIncremental(d.filter(!isNew), d.filter(isNew),
        "doc_id", "text", k = 3, numPerms = 64, bandRows = 2, minJ = 0.5,
        maxShingleDf = 100)
        .orderBy("a", "b")
    },

    // Index-backed incremental dedup: the same ingest as
    // dedup_incremental, but probing the persisted LSH index instead
    // of recomputing corpus signatures — the steady-state form. The
    // index is built once per JVM (first run pays the build; later
    // runs, like Bench's min-of-3, time the probe alone — the
    // per-ingest cost that matters). Same oracle as dedup_incremental:
    // the two paths are pair-for-pair identical (IndexSpec).
    //
    // Expected local-bench shape: at sf0.1 the corpus is only 10× the
    // batch, so index I/O + the probe's extra joins cost about as much
    // as recomputing the corpus outright and the probe benches ~2-3×
    // the inline query. The probe's advantage scales with the
    // corpus/batch ratio (its plan touches corpus tables only via
    // scans + broadcasts — IndexSpec asserts no corpus-text read, and
    // no corpus-sized Exchange exists in the probe): at 1000× the
    // recompute is a non-starter while the probe stays batch-sized.
    "dedup_incremental_idx" -> { (spark, dir) =>
      val d = Tables.load(spark, dir, "documents")
      val isNew =
        Sampling.hashBucket(col("doc_id")) >= lit(Sampling.cuts(Seq(0.9))(1))
      val idx = minhashIndexFor(spark, dir, d.filter(!isNew))
      Dedup.minhashIncrementalFromIndex(spark, idx, d.filter(isNew),
        "doc_id", "text", MinhashIndex.Config())
        .orderBy("a", "b")
    },

    // Index-backed EXACT dedup — the fourth persisted family
    // (DigestIndex: per-segment Blooms propose, a digest equi-join
    // with candidate pushdown verifies). The corpus has no exact
    // duplicates, so the probe batch is synthesized deterministically
    // from the corpus tables: re-id'd byte-identical copies
    // (doc_id % 7 = 3, +1e6), novel suffixed texts (doc_id % 7 = 5,
    // +2e6), and a within-batch duplicate of each novel text at an
    // even doc_id (% 14 = 5, +3e6) — the oracle replays the same
    // construction. Emits (doc_id, dup_of) under seen-first-wins:
    // indexed canonical beats batch ids; within-batch min id wins the
    // rest. Index built once per JVM; Bench's min-of-3 times the
    // steady-state probe (bloom pass + candidate-sized verify scan).
    "dedup_exact_idx" -> { (spark, dir) =>
      val d = Tables.load(spark, dir, "documents")
        .select(col("doc_id"), col("text"))
      val batch = d.filter(col("doc_id") % 7 === 3)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
        .unionByName(d.filter(col("doc_id") % 7 === 5)
          .select((col("doc_id") + 2000000L).as("doc_id"),
            concat(col("text"), lit(" xnovel")).as("text")))
        .unionByName(d.filter(col("doc_id") % 14 === 5)
          .select((col("doc_id") + 3000000L).as("doc_id"),
            concat(col("text"), lit(" xnovel")).as("text")))
      val idx = digestIndexFor(spark, dir, d)
      DigestIndex.dupPairs(spark, idx, batch, "doc_id", "text")
        .orderBy("doc_id")
    },

    // k-fold cross-validation assignment: fold = md5-bucket mod 5 —
    // the split family completed (train/val/test, cluster-keyed,
    // stratified, folds), all pure hash membership.
    "q_kfold" -> { (spark, dir) =>
      Sampling.kFold(Tables.load(spark, dir, "documents"), "doc_id", k = 5)
        .select(col("doc_id"), col("fold"))
        .orderBy("doc_id")
    },

    // Stratified corpus rebalancing: deterministic per-language keep
    // fractions (downsample dominant languages, keep rare ones whole).
    // Membership = pure function of (doc_id, lang) → fully oracled.
    "q_stratified_sample" -> { (spark, dir) =>
      val d = Tables.load(spark, dir, "documents")
        .withColumn("lang", TF.langId(col("text")))
      Sampling.stratifiedSample(d, "doc_id", col("lang"),
        Map("en" -> 0.25, "fr" -> 0.5), defaultFraction = 1.0)
        .select(col("doc_id"), col("lang"))
        .orderBy("doc_id")
    },

    // Target-MIXTURE sampling: keep fractions DERIVED from declared
    // mixture weights (25% per listed language; zh excluded) so the
    // surviving corpus matches the recipe with maximum data — the
    // binding (most under-represented) language keeps every row. One
    // tiny count aggregate + one broadcast scalar; membership stays a
    // pure hash function.
    "q_mixture_sample" -> { (spark, dir) =>
      val d = Tables.load(spark, dir, "documents")
      Sampling.mixtureSample(d, "doc_id", col("lang"),
        Map("en" -> 0.25, "de" -> 0.25, "es" -> 0.25, "fr" -> 0.25))
        .select(col("doc_id"), col("lang"))
        .orderBy("doc_id")
    },

    // TEMPERATURE mixture (alpha = 0.5): targets derived from the data
    // itself, w_d ∝ sqrt(n_d) — head languages flattened by a
    // square-root law (en keeps sqrt(n_fr/n_en) of its rows, the
    // smallest language keeps all). IEEE sqrt is correctly rounded, so
    // the derived cut integers are cross-engine exact.
    "q_mixture_temperature" -> { (spark, dir) =>
      val d = Tables.load(spark, dir, "documents")
      Sampling.mixtureTemperature(d, "doc_id", col("lang"),
        Seq("en", "de", "es", "fr", "zh"))
        .select(col("doc_id"), col("lang"))
        .orderBy("doc_id")
    },

    // Mixture UP-sampling: repeat under-represented domains (epochs)
    // to hit target weights in a data-constrained corpus — the binding
    // domain repeats exactly maxEpochs times, others proportionally
    // fewer (fractional epochs = deterministic hash-membership extra
    // copy). Output carries a copy index per repeated example.
    "q_mixture_upsample" -> { (spark, dir) =>
      val d = Tables.load(spark, dir, "documents")
      Sampling.mixtureUpsample(d, "doc_id", col("lang"),
        Map("en" -> 0.4, "de" -> 0.3, "zh" -> 0.3), maxEpochs = 2.0)
        .select(col("doc_id"), col("lang"), col("copy"))
        .orderBy("doc_id", "copy")
    },

    // Deterministic epoch shuffle: reproducible pseudo-random training
    // order (hash of doc_id = the permutation; the salt would select
    // the epoch). One range-partitioned sort + zipWithIndex — never a
    // single-partition window.
    "q_shuffle_epoch" -> { (spark, dir) =>
      Sampling.shuffleEpoch(
        Tables.load(spark, dir, "documents").select(col("doc_id")), "doc_id")
        .orderBy("pos")
    },

    // WEIGHTED sample without replacement (Efraimidis–Spirakis
    // exponential clocks), k per group: 5 docs per language, weighted
    // by n_chars — longer docs proportionally likelier, no row twice.
    // The exponential variate is quantized to an integer so the oracle
    // replays the exact draw; priority = E/weight is one IEEE division.
    "q_weighted_sample" -> { (spark, dir) =>
      val d = Tables.load(spark, dir, "documents")
      Sampling.weightedSample(d, "doc_id", col("lang"), col("n_chars"), k = 5)
        .select(col("lang"), col("doc_id"), col("n_chars"))
        .orderBy("lang", "doc_id")
    },

    // GLOBAL weighted sample: 20 docs corpus-wide, still proportional-
    // to-length without replacement. TakeOrderedAndProject (per-
    // partition top-k + k-sized merge) — no global sort, no one-group
    // window; the plan a 100 TB "pick k exemplars" wants.
    "q_weighted_sample_global" -> { (spark, dir) =>
      val d = Tables.load(spark, dir, "documents")
      Sampling.weightedSampleGlobal(d, "doc_id", col("n_chars"), k = 20)
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .orderBy("doc_id")
    },

    // Duplicated n-gram fraction (RefinedWeb/Gopher quality feature):
    // per doc, how many of its distinct 5-shingles occur in any other
    // document. Wordcount-shaped — shingle df aggregate re-joined onto
    // the shingle stream; no pair space at any corpus size.
    "text_dup_ngram_frac" -> { (spark, dir) =>
      Dedup.dupShingleStats(Tables.load(spark, dir, "documents"),
        "doc_id", "text", k = 5)
        .orderBy("doc_id")
    },

    // Length-bucketed batching: token-count DECILE per doc (exact
    // interpolated percentiles — Spark `percentile` and DuckDB
    // `quantile_cont` share the definition bit-for-bit), the standard
    // padding-efficiency move before batch assembly. One tiny scalar
    // aggregate broadcast back over the corpus; ties bucket downward.
    "q_quantile_bins" -> { (spark, dir) =>
      val withN = Tables.load(spark, dir, "documents")
        .select(col("doc_id"),
          TF.wsTokenCount(col("text")).cast("long").as("n_tokens"))
      val thr = withN.agg(percentile(col("n_tokens"),
        array((1 to 9).map(i => lit(i / 10.0)): _*)).as("thr"))
      withN.crossJoin(broadcast(thr))
        .select(col("doc_id"), col("n_tokens"),
          (size(filter(col("thr"),
            t => col("n_tokens").cast("double") > t)) + 1).cast("long").as("bin"))
        .orderBy("doc_id")
    },

    // Benchmark decontamination: corpus docs sharing any 5-token
    // shingle with the probe (eval) set — a deterministic ~20% hash
    // bucket standing in for a benchmark. The probe shingle set
    // broadcasts; the corpus never shuffles its text.
    "q_decontaminate" -> { (spark, dir) =>
      val d = Tables.load(spark, dir, "documents")
      val isProbe =
        Sampling.hashBucket(col("doc_id")) < lit(Sampling.cuts(Seq(0.2))(1))
      Dedup.contaminated(d.filter(!isProbe), d.filter(isProbe),
        "doc_id", "text", k = 5)
        .withColumn("n_shared", col("n_shared").cast("long"))
        .orderBy("doc_id")
    },

    // Bloom-prefiltered decontamination: identical output (and oracle)
    // to q_decontaminate, with a codegen'd might_contain over
    // xxhash64(shingle) killing non-candidate corpus shingles at the
    // scan — the form for probe sets too large to broadcast as text.
    "q_decontaminate_bloom" -> { (spark, dir) =>
      val d = Tables.load(spark, dir, "documents")
      val isProbe =
        Sampling.hashBucket(col("doc_id")) < lit(Sampling.cuts(Seq(0.2))(1))
      Dedup.contaminatedBloom(d.filter(!isProbe), d.filter(isProbe),
        "doc_id", "text", k = 5)
        .withColumn("n_shared", col("n_shared").cast("long"))
        .orderBy("doc_id")
    },

    // Contamination rolled up per source — the actionable view ("which
    // source leaked the benchmark"); contaminated ids broadcast back
    // for the label, corpus never shuffles.
    "q_contamination_report" -> { (spark, dir) =>
      val d = Tables.load(spark, dir, "documents")
      val isProbe =
        Sampling.hashBucket(col("doc_id")) < lit(Sampling.cuts(Seq(0.2))(1))
      Dedup.contaminationReport(d.filter(!isProbe), d.filter(isProbe),
        "doc_id", "text", "source", k = 5)
        .orderBy("source")
    },

    // Data-quality gates: every document tagged with the named rules
    // it violates (quality "expectations" — quarantine with reasons,
    // never a silent drop). Scan-speed column algebra, fails closed on
    // NULL predicates.
    "q_quarantine" -> { (spark, dir) =>
      val rules = Seq(
        "too_short" -> (length(col("text")) >= 100),
        "low_alpha" -> (TF.alphaRatio(col("text")) >= 0.5),
        "few_tokens" -> (TF.wsTokenCount(col("text")) >= 20),
        "unknown_lang" -> (TF.langId(col("text")) =!= "und"))
      Quality.withViolations(Tables.load(spark, dir, "documents"), rules)
        .select(col("doc_id"),
          size(col("violations")).cast("long").as("n_violations"),
          array_join(col("violations"), ",").as("viol"))
        .orderBy("doc_id")
    },

    // --- multimodal plumbing ---------------------------------------------
    "mm_features" -> { (spark, dir) =>
      val assets = Multimodal.synthesizeAssets(
        Tables.load(spark, dir, "documents"), "doc_id", "text")
      Multimodal.extractFeatures(assets, "doc_id", "payload")
        .select(col("id").as("doc_id"), col("nBytes").as("n_bytes"),
          col("checksum"), col("meta.width").cast("long").as("width"))
        .orderBy("doc_id")
    },

    // The multimodal loop CLOSED: payload → (stub) embedding kernel →
    // ANN search. The stub's arithmetic is exact in float and double
    // (residue < 2^10, power-of-two scale) so the cosine ranking
    // carries a full oracle — the real-model swap changes one kernel
    // body, not the pipeline.
    "mm_embed_topk" -> { (spark, dir) =>
      val assets = Multimodal.synthesizeAssets(
        Tables.load(spark, dir, "documents"), "doc_id", "text")
      val emb = Multimodal.embed(assets, "doc_id", "payload", dim = 16)
      Similarity.bruteForceTopK(emb, emb.filter(col("doc_id") < 10),
        "doc_id", "embedding", 16, k = 5)
        .orderBy("query_id", "rnk")
    },

    // frame sampling: stub demux slices fixed-size chunks, so counts
    // and byte totals are exactly derivable from len(text) → oracled.
    "mm_frame_sample" -> { (spark, dir) =>
      val assets = Multimodal.synthesizeAssets(
        Tables.load(spark, dir, "documents"), "doc_id", "text")
      Multimodal.frameSample(assets, "doc_id", "payload", 256, 4)
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_frames"),
          sum(length(col("frame_bytes")).cast("long")).as("total_bytes"))
        .orderBy("doc_id")
    }
  )

  val oracleSql: Map[String, String] = Map(
    "text_token_stats" ->
      s"""SELECT doc_id,
         |  len(list_filter(string_split_regex(text,'\\s+'), t -> len(t)>0)) AS n_ws,
         |  len(regexp_extract_all(text, '${TF.bpePattern}')) AS n_bpe,
         |  len(text) AS n_chars_obs
         |FROM documents ORDER BY doc_id""".stripMargin,
    "text_quality" -> {
      val allStops = TF.stopwords.values.flatten.toSeq.distinct
        .map(s => s"'$s'").mkString(", ")
      s"""WITH t AS (SELECT doc_id, text,
         |  list_filter(string_split_regex(text,'\\s+'), x -> len(x)>0) AS toks
         |  FROM documents)
         |SELECT doc_id,
         |  CAST(len(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE)
         |    / CAST(len(text) AS DOUBLE) AS alpha_ratio,
         |  CAST(len(list_filter(toks, x -> x IN ($allStops))) AS DOUBLE)
         |    / greatest(CAST(len(toks) AS DOUBLE), 1.0) AS stopword_ratio,
         |  0.4 * (CAST(len(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE)
         |         / CAST(len(text) AS DOUBLE))
         |  + 0.3 * least(1.0, CAST(len(toks) AS DOUBLE) / 100.0)
         |  + 0.3 * (CAST(len(list_filter(toks, x -> x IN ($allStops))) AS DOUBLE)
         |           / greatest(CAST(len(toks) AS DOUBLE), 1.0)) AS quality
         |FROM t ORDER BY doc_id""".stripMargin
    },
    "text_langid" ->
      s"""WITH t AS (SELECT doc_id,
         |  list_filter(string_split_regex(text,'\\s+'), x -> len(x)>0) AS toks
         |  FROM documents),
         |s AS (SELECT doc_id, toks, $langBestSql AS best FROM t)
         |SELECT doc_id, $langPickSql AS lang_pred FROM s ORDER BY doc_id""".stripMargin,
    "text_fingerprint" ->
      "SELECT doc_id, md5(text) AS digest FROM documents ORDER BY doc_id",
    // rolling fingerprint: same md5-derived 32-bit token values + the
    // same mod-(2^57-13) fold, via list_reduce with the seed prepended.
    "text_fingerprint_rolling" ->
      s"""SELECT doc_id,
         |  list_reduce(
         |    list_prepend(CAST(${TF.FpSeed} AS BIGINT),
         |      list_transform(
         |        list_filter(string_split_regex(text,'\\s+'), t -> len(t)>0),
         |        t -> ('0x' || substr(md5(t),1,8))::BIGINT)),
         |    (h, x) -> (h*31 + x) % ${TF.FpP}) AS fp
         |FROM documents ORDER BY doc_id""".stripMargin,
    "dedup_simhash" -> simhashOracle(8),
    "text_redact" -> {
      val dirty = "(text || ' contact user' || CAST(doc_id AS VARCHAR) " +
        "|| '@example.com or 5551234567')"
      val redact = s"regexp_replace(regexp_replace($dirty, " +
        s"'${TF.emailPattern}', '<EMAIL>', 'g'), " +
        s"'${TF.longDigitPattern}', '<NUM>', 'g')"
      s"""SELECT doc_id, CAST(len($dirty) AS BIGINT) AS n_before,
         |  CAST(len($redact) AS BIGINT) AS n_after,
         |  $redact AS clean
         |FROM documents ORDER BY doc_id""".stripMargin
    },
    "text_repetition" ->
      """WITH t AS (SELECT doc_id,
        |  list_filter(string_split_regex(text,'\s+'), x -> len(x)>0) AS toks
        |  FROM documents)
        |SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
        |  CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct,
        |  CAST(len(list_distinct(toks)) AS DOUBLE)
        |    / greatest(CAST(len(toks) AS DOUBLE), 1.0) AS distinct_ratio
        |FROM t ORDER BY doc_id""".stripMargin,
    "dedup_canonical" ->
      s"""WITH RECURSIVE pairs AS (${jaccardOracle(0.5)}),
         |e AS (SELECT a, b FROM pairs UNION SELECT b, a FROM pairs),
         |reach(src, dst) AS (
         |  SELECT a AS src, b AS dst FROM e
         |  UNION
         |  SELECT r.src, e.b AS dst FROM reach r JOIN e ON r.dst = e.a),
         |comp AS (SELECT src AS doc_id, least(src, min(dst)) AS component
         |         FROM reach GROUP BY src)
         |SELECT doc_id FROM documents
         |WHERE doc_id NOT IN (SELECT doc_id FROM comp WHERE component <> doc_id)
         |ORDER BY doc_id""".stripMargin,
    "pipeline_end_to_end" -> {
      val cs = Sampling.cuts(Seq(0.8, 0.1, 0.1))
      val allStops = TF.stopwords.values.flatten.toSeq.distinct
        .map(s => s"'$s'").mkString(", ")
      val b = "('0x' || substr(md5(CAST(doc_id AS VARCHAR)),1,8))::BIGINT"
      // quality formula verbatim from the text_quality oracle (same
      // float evaluation order → bit-identical threshold decision)
      s"""WITH RECURSIVE filtered AS (
         |  SELECT doc_id, text FROM (
         |    SELECT doc_id, text,
         |      list_filter(string_split_regex(text,'\\s+'), x -> len(x)>0) AS toks
         |    FROM documents)
         |  WHERE 0.4 * (CAST(len(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE)
         |         / CAST(len(text) AS DOUBLE))
         |  + 0.3 * least(1.0, CAST(len(toks) AS DOUBLE) / 100.0)
         |  + 0.3 * (CAST(len(list_filter(toks, x -> x IN ($allStops))) AS DOUBLE)
         |           / greatest(CAST(len(toks) AS DOUBLE), 1.0)) >= 0.45),
         |pairs AS (${jaccardOracle(0.5, 100, "filtered")}),
         |e AS (SELECT a, b FROM pairs UNION SELECT b, a FROM pairs),
         |reach(src, dst) AS (
         |  SELECT a AS src, b AS dst FROM e
         |  UNION
         |  SELECT r.src, e.b AS dst FROM reach r JOIN e ON r.dst = e.a),
         |comp AS (SELECT src AS doc_id, least(src, min(dst)) AS component
         |         FROM reach GROUP BY src),
         |kept AS (SELECT doc_id, text FROM filtered
         |  WHERE doc_id NOT IN (SELECT doc_id FROM comp WHERE component <> doc_id)),
         |s AS (SELECT
         |  CASE WHEN $b < ${cs(1)} THEN 'train'
         |       WHEN $b < ${cs(2)} THEN 'val'
         |       ELSE 'test' END AS split,
         |  CAST(len(list_filter(string_split_regex(text,'\\s+'), x -> len(x)>0))
         |       AS BIGINT) AS n_tokens
         |  FROM kept)
         |SELECT split, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
         |FROM s GROUP BY split ORDER BY split""".stripMargin
    },
    "q_split_by_cluster" -> {
      val cs = Sampling.cuts(Seq(0.8, 0.1, 0.1))
      val b = "('0x' || substr(md5(CAST(component AS VARCHAR)),1,8))::BIGINT"
      s"""WITH RECURSIVE pairs AS (${jaccardOracle(0.5)}),
         |e AS (SELECT a, b FROM pairs UNION SELECT b, a FROM pairs),
         |reach(src, dst) AS (
         |  SELECT a AS src, b AS dst FROM e
         |  UNION
         |  SELECT r.src, e.b AS dst FROM reach r JOIN e ON r.dst = e.a),
         |comp AS (SELECT src AS doc_id, least(src, min(dst)) AS component
         |         FROM reach GROUP BY src),
         |m AS (SELECT d.doc_id, COALESCE(c.component, d.doc_id) AS component
         |      FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id)
         |SELECT doc_id, component,
         |  CASE WHEN $b < ${cs(1)} THEN 'train'
         |       WHEN $b < ${cs(2)} THEN 'val'
         |       ELSE 'test' END AS split
         |FROM m ORDER BY doc_id""".stripMargin
    },
    "emb_quantize" ->
      """WITH m AS (SELECT vec_id, embedding,
        |    list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS mx
        |  FROM embeddings),
        |q AS (SELECT vec_id,
        |    CASE WHEN mx > 0 THEN mx/127.0 ELSE 1.0 END AS scale,
        |    embedding FROM m),
        |t AS (SELECT vec_id, scale,
        |    list_transform(embedding,
        |      x -> CAST(floor(CAST(x AS DOUBLE)/scale + 0.5) AS BIGINT)) AS qv
        |  FROM q)
        |SELECT vec_id, scale, CAST(list_sum(qv) AS BIGINT) AS q_sum,
        |  CAST(list_min(qv) AS BIGINT) AS q_min,
        |  CAST(list_max(qv) AS BIGINT) AS q_max
        |FROM t ORDER BY vec_id""".stripMargin,
    "emb_centroid_outliers" -> {
      val dim = EmbDim
      s"""WITH m AS (SELECT vec_id, label, embedding,
         |    list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS mx
         |  FROM embeddings),
         |t AS (SELECT vec_id, label,
         |    list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) /
         |      (CASE WHEN mx > 0 THEN mx/127.0 ELSE 1.0 END) + 0.5) AS BIGINT)) AS qv
         |  FROM m),
         |sums AS (SELECT label, i, CAST(sum(qv[i+1]) AS BIGINT) AS s,
         |         COUNT(*) AS n
         |  FROM t, (SELECT unnest(range($dim)) AS i) ix GROUP BY label, i),
         |cent AS (SELECT label,
         |    list(CAST(floor(CAST(s AS DOUBLE) / n) AS BIGINT) ORDER BY i) AS cl
         |  FROM sums GROUP BY label),
         |sc AS (SELECT vec_id, t.label AS label,
         |    CAST(list_sum(list_transform(range($dim),
         |      i -> qv[i+1] * cl[i+1])) AS BIGINT) AS dot,
         |    CAST(list_sum(list_transform(qv, x -> x*x)) AS BIGINT) AS qq,
         |    CAST(list_sum(list_transform(cl, x -> x*x)) AS BIGINT) AS cc
         |  FROM t JOIN cent ON t.label = cent.label)
         |SELECT vec_id, label,
         |  CASE WHEN qq > 0 AND cc > 0
         |    THEN CAST(dot AS DOUBLE) /
         |         (sqrt(CAST(qq AS DOUBLE)) * sqrt(CAST(cc AS DOUBLE)))
         |    ELSE 0.0 END AS cos_centroid
         |FROM sc ORDER BY vec_id""".stripMargin
    },

    "emb_project" -> {
      val dim = EmbDim
      val colSql = (0 until 16).map { j =>
        s"""  CAST(list_sum(list_transform(range($dim), i ->
           |    qv[i+1] * (CASE WHEN ('0x' || substr(md5(
           |      CAST(i AS VARCHAR) || '_$j'),1,8))::BIGINT % 2 = 0
           |      THEN 1 ELSE -1 END))) AS BIGINT) AS ${f"p$j%02d"}"""
          .stripMargin
      }.mkString(",\n")
      s"""WITH m AS (SELECT vec_id, embedding,
         |    list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS mx
         |  FROM embeddings),
         |t AS (SELECT vec_id,
         |    list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) /
         |      (CASE WHEN mx > 0 THEN mx/127.0 ELSE 1.0 END) + 0.5) AS BIGINT)) AS qv
         |  FROM m)
         |SELECT vec_id,
         |$colSql
         |FROM t ORDER BY vec_id""".stripMargin
    },

    "q_hash_split" -> {
      val cs = Sampling.cuts(Seq(0.8, 0.1, 0.1))
      s"""SELECT doc_id,
         |  CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)),1,8))::BIGINT
         |            < ${cs(1)} THEN 'train'
         |       WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)),1,8))::BIGINT
         |            < ${cs(2)} THEN 'val'
         |       ELSE 'test' END AS split
         |FROM documents ORDER BY doc_id""".stripMargin
    },
    "text_pack_bins" ->
      """WITH c AS (SELECT doc_id,
        |  CAST(len(list_filter(string_split_regex(text,'\s+'), t -> len(t)>0))
        |       AS BIGINT) AS n_tokens
        |  FROM documents)
        |SELECT doc_id, n_tokens,
        |  COALESCE(CAST(SUM(n_tokens) OVER (ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
        |    0) // 2048 AS bin
        |FROM c ORDER BY doc_id""".stripMargin,
    "q_pps_sample" ->
      """WITH c AS (SELECT doc_id,
        |  CAST(len(list_filter(string_split_regex(text,'\s+'), t -> len(t)>0))
        |       AS BIGINT) AS n_tokens
        |  FROM documents),
        |p AS (SELECT doc_id, n_tokens,
        |  COALESCE(CAST(SUM(n_tokens) OVER (ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
        |    0) AS cum FROM c),
        |g AS (SELECT GREATEST(1, CAST(SUM(n_tokens) AS BIGINT) // 100) AS step
        |      FROM c),
        |o AS (SELECT step,
        |      ('0x' || substr(md5('pps'),1,8))::BIGINT % step AS off FROM g),
        |k AS (SELECT doc_id, n_tokens,
        |   (CASE WHEN cum + n_tokens <= off THEN 0
        |         ELSE 1 + (cum + n_tokens - 1 - off) // step END) -
        |   (CASE WHEN cum <= off THEN 0
        |         ELSE 1 + (cum - 1 - off) // step END) AS copies
        | FROM p, o)
        |SELECT doc_id, n_tokens, CAST(copies AS BIGINT) AS copies FROM k
        |WHERE copies > 0 ORDER BY doc_id""".stripMargin,
    "text_top_tokens" ->
      s"""WITH t AS (SELECT doc_id,
         |  list_filter(string_split_regex(text,'\\s+'), x -> len(x)>0) AS toks
         |  FROM documents),
         |s AS (SELECT doc_id, toks, $langBestSql AS best FROM t),
         |l AS (SELECT doc_id, toks, $langPickSql AS lang FROM s),
         |tok AS (SELECT lang, unnest(toks) AS tok FROM l),
         |c AS (SELECT lang, tok, CAST(count(*) AS BIGINT) AS cnt
         |      FROM tok GROUP BY 1, 2),
         |r AS (SELECT lang, tok, cnt,
         |        ROW_NUMBER() OVER (PARTITION BY lang
         |                           ORDER BY cnt DESC, tok) AS rnk
         |      FROM c)
         |SELECT lang, rnk, tok, cnt FROM r WHERE rnk <= 10
         |ORDER BY lang, rnk""".stripMargin,
    "dedup_exact" ->
      """SELECT md5(text) AS digest, min(doc_id) AS doc_id, count(*) AS n_copies
        |FROM documents GROUP BY md5(text) ORDER BY doc_id""".stripMargin,
    "dedup_ngram_jaccard" -> jaccardOracle(0.5),

    "dedup_containment" ->
      s"""WITH toks AS (
         |  SELECT doc_id,
         |    list_filter(string_split_regex(text,'\\s+'), x -> len(x)>0) AS t
         |  FROM documents),
         |shd AS (
         |  SELECT DISTINCT doc_id, s FROM toks,
         |  LATERAL (SELECT unnest(list_transform(range(1, len(t)-1),
         |                  i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s)
         |  WHERE len(t) >= 3),
         |sh AS (SELECT * FROM shd WHERE s IN (
         |  SELECT s FROM shd GROUP BY s HAVING count(*) <= 100)),
         |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
         |pairs AS (
         |  SELECT a.doc_id AS a, b.doc_id AS b, count(*) AS c
         |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id <> b.doc_id
         |  GROUP BY 1, 2)
         |SELECT a, b, CAST(c AS DOUBLE)/CAST(sa.n AS DOUBLE) AS containment
         |FROM pairs JOIN sizes sa ON a = sa.doc_id
         |WHERE CAST(c AS DOUBLE)/CAST(sa.n AS DOUBLE) >= 0.6
         |ORDER BY a, b""".stripMargin,
    "dedup_minhash" -> jaccardOracle(0.5),
    // transitive closure over the exact-Jaccard pair set (= the
    // verified minhash pairs); component = min reachable id.
    "dedup_components" ->
      s"""WITH RECURSIVE pairs AS (${jaccardOracle(0.5)}),
         |e AS (SELECT a, b FROM pairs UNION SELECT b, a FROM pairs),
         |reach(src, dst) AS (
         |  SELECT a AS src, b AS dst FROM e
         |  UNION
         |  SELECT r.src, e.b AS dst FROM reach r JOIN e ON r.dst = e.a)
         |SELECT src AS doc_id, least(src, min(dst)) AS component
         |FROM reach GROUP BY src ORDER BY doc_id""".stripMargin,
    // id-ordered triple join — same triangle set the degree-oriented
    // wedge join generates, independent of orientation.
    "q_graph_triangles" ->
      s"""WITH pairs AS (${jaccardOracle(0.3)}),
         |e AS (SELECT DISTINCT a AS u, b AS v FROM pairs)
         |SELECT e1.u AS ta, e1.v AS tb, e2.v AS tc
         |FROM e e1 JOIN e e2 ON e2.u = e1.v
         |JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
         |ORDER BY ta, tb, tc""".stripMargin,
    "q_pagerank" -> {
      val iters = 3
      val steps = (1 to iters).map { i =>
        s"""c$i AS (SELECT e.dst AS doc_id, SUM(p${i - 1}.pr // deg.d) AS s
           |  FROM e JOIN p${i - 1} ON p${i - 1}.doc_id = e.src
           |  JOIN deg ON deg.src = e.src GROUP BY 1),
           |p$i AS (SELECT v.doc_id,
           |  CAST(150000 + (85 * COALESCE(c$i.s, 0)) // 100 AS BIGINT) AS pr
           |  FROM v LEFT JOIN c$i USING (doc_id))""".stripMargin
      }.mkString(",\n")
      s"""WITH pairs AS (${jaccardOracle(0.3)}),
         |e AS (SELECT a AS src, b AS dst FROM pairs
         |      UNION SELECT b AS src, a AS dst FROM pairs),
         |deg AS (SELECT src, COUNT(*) AS d FROM e GROUP BY 1),
         |v AS (SELECT DISTINCT src AS doc_id FROM e),
         |p0 AS (SELECT doc_id, CAST(1000000 AS BIGINT) AS pr FROM v),
         |$steps
         |SELECT doc_id, pr FROM p$iters ORDER BY doc_id""".stripMargin
    },
    "dedup_embedding" ->
      s"""SELECT a.vec_id AS a, b.vec_id AS b, ${cosSql("a", "b")} AS cos
         |FROM embeddings a, embeddings b
         |WHERE a.vec_id < b.vec_id AND ${cosSql("a", "b")} >= 0.4
         |ORDER BY a, b""".stripMargin,
    // full replay of the iters=0 IVF pipeline: seed centroids (8
    // lowest-id vectors), argmax dot/|c| assignment with index
    // tie-break, per-query top-2 probe lists by the same ranking,
    // within-probed-lists exact cosine top-5
    "sim_topk_ivf0" ->
      s"""WITH seeds AS (
         |  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS list_id,
         |         embedding
         |  FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 8)),
         |assign AS (
         |  SELECT e.vec_id, e.embedding,
         |    (SELECT s.list_id FROM seeds s
         |     ORDER BY (${dotSql("e", "s")}) / sqrt(${dotSql("s", "s")}) DESC,
         |              s.list_id LIMIT 1) AS list_id
         |  FROM embeddings e),
         |pr AS (
         |  SELECT q.vec_id AS query_id, q.embedding, s.list_id,
         |    row_number() OVER (PARTITION BY q.vec_id
         |      ORDER BY (${dotSql("q", "s")}) / sqrt(${dotSql("s", "s")}) DESC,
         |               s.list_id) AS r
         |  FROM embeddings q, seeds s WHERE q.vec_id < 10),
         |cand AS (
         |  SELECT p.query_id, a.vec_id AS neighbor_id, ${cosSql("p", "a")} AS cos
         |  FROM (SELECT query_id, embedding, list_id FROM pr WHERE r <= 2) p
         |  JOIN assign a USING (list_id)
         |  WHERE a.vec_id <> p.query_id),
         |rk AS (SELECT query_id, neighbor_id, cos,
         |  row_number() OVER (PARTITION BY query_id
         |                     ORDER BY cos DESC, neighbor_id) AS rnk
         |  FROM cand)
         |SELECT query_id, CAST(rnk AS BIGINT) AS rnk, neighbor_id, cos
         |FROM rk WHERE rnk <= 5 ORDER BY query_id, rnk""".stripMargin,
    // PQ at iters=0: codebooks = subvectors of the 32 lowest-id
    // vectors; encode replayed as per-subspace argmin of the unrolled
    // squared-L2 (ties to the lowest entry id — the kernel's strict <),
    // ADC = the per-subspace LUT values summed in subspace order
    // (explicit left-associated + chain, matching PqAdcDot), top
    // k·refine by (adc DESC, id), exact cosine re-rank
    "sim_topk_pq0" -> {
      val m = 8; val dsub = 8; val ksub = 32; val kRefine = 40
      def dSql(s: Int) = (0 until dsub).map { i =>
        val idx = s * dsub + i + 1
        s"""(CAST(e.embedding[$idx] AS DOUBLE) - CAST(sd.embedding[$idx] AS DOUBLE))
           |      * (CAST(e.embedding[$idx] AS DOUBLE) - CAST(sd.embedding[$idx] AS DOUBLE))"""
          .stripMargin
      }.mkString("\n      + ")
      val distSelects = (0 until m).map(s =>
        s"  SELECT e.vec_id, $s AS s, sd.j,\n      ${dSql(s)} AS d\n" +
          "  FROM embeddings e, seeds32 sd").mkString("\n  UNION ALL\n")
      def lutSql(s: Int) = (0 until dsub).map { i =>
        val idx = s * dsub + i + 1
        s"CAST(q.embedding[$idx] AS DOUBLE) * CAST(sd.embedding[$idx] AS DOUBLE)"
      }.mkString("\n      + ")
      val lutSelects = (0 until m).map(s =>
        s"  SELECT q.vec_id AS query_id, $s AS s, sd.j,\n      ${lutSql(s)} AS lv\n" +
          "  FROM embeddings q, seeds32 sd WHERE q.vec_id < 10")
        .mkString("\n  UNION ALL\n")
      val adcSum = (0 until m).map(s => s"l$s").mkString(" + ")
      val lcols = (0 until m).map(s =>
        s"    MAX(CASE WHEN cs.s = $s THEN lt.lv END) AS l$s").mkString(",\n")
      s"""WITH seeds32 AS (
         |  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS j,
         |         embedding
         |  FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT $ksub)),
         |dists AS (
         |$distSelects),
         |codes AS (
         |  SELECT vec_id, s, j AS code FROM (
         |    SELECT vec_id, s, j,
         |      row_number() OVER (PARTITION BY vec_id, s
         |                         ORDER BY d ASC, j ASC) AS rn
         |    FROM dists) WHERE rn = 1),
         |luts AS (
         |$lutSelects),
         |norms AS (SELECT vec_id, sqrt(${dotSql("e", "e")}) AS cn
         |  FROM embeddings e),
         |pairl AS (
         |  SELECT lt.query_id, cs.vec_id AS neighbor_id,
         |$lcols
         |  FROM codes cs JOIN luts lt ON cs.s = lt.s AND cs.code = lt.j
         |  WHERE lt.query_id <> cs.vec_id
         |  GROUP BY 1, 2),
         |adc AS (
         |  SELECT p.query_id, p.neighbor_id,
         |    CASE WHEN n.cn = 0 THEN CAST('-infinity' AS DOUBLE)
         |         ELSE ($adcSum) / n.cn END AS adc
         |  FROM pairl p JOIN norms n ON p.neighbor_id = n.vec_id),
         |cand AS (SELECT query_id, neighbor_id FROM (
         |    SELECT query_id, neighbor_id,
         |      row_number() OVER (PARTITION BY query_id
         |                         ORDER BY adc DESC, neighbor_id) AS r
         |    FROM adc) WHERE r <= $kRefine),
         |scored AS (SELECT c.query_id, c.neighbor_id, ${cosSql("a", "b")} AS cos
         |  FROM cand c JOIN embeddings a ON a.vec_id = c.query_id
         |              JOIN embeddings b ON b.vec_id = c.neighbor_id),
         |rk AS (SELECT query_id, neighbor_id, cos,
         |    row_number() OVER (PARTITION BY query_id
         |                       ORDER BY cos DESC, neighbor_id) AS rnk
         |  FROM scored)
         |SELECT query_id, CAST(rnk AS BIGINT) AS rnk, neighbor_id, cos
         |FROM rk WHERE rnk <= 5 ORDER BY query_id, rnk""".stripMargin
    },
    // identical replay, but seeds come from the BUILD slice only
    // (vec_id % 5 <> 0) — the append slice is assigned to the same
    // frozen centroids, which is exactly what the segmented index does
    "sim_topk_ivf0_idx" ->
      s"""WITH seeds AS (
         |  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS list_id,
         |         embedding
         |  FROM (SELECT * FROM embeddings WHERE vec_id % 5 <> 0
         |        ORDER BY vec_id LIMIT 8)),
         |assign AS (
         |  SELECT e.vec_id, e.embedding,
         |    (SELECT s.list_id FROM seeds s
         |     ORDER BY (${dotSql("e", "s")}) / sqrt(${dotSql("s", "s")}) DESC,
         |              s.list_id LIMIT 1) AS list_id
         |  FROM embeddings e),
         |pr AS (
         |  SELECT q.vec_id AS query_id, q.embedding, s.list_id,
         |    row_number() OVER (PARTITION BY q.vec_id
         |      ORDER BY (${dotSql("q", "s")}) / sqrt(${dotSql("s", "s")}) DESC,
         |               s.list_id) AS r
         |  FROM embeddings q, seeds s WHERE q.vec_id < 10),
         |cand AS (
         |  SELECT p.query_id, a.vec_id AS neighbor_id, ${cosSql("p", "a")} AS cos
         |  FROM (SELECT query_id, embedding, list_id FROM pr WHERE r <= 2) p
         |  JOIN assign a USING (list_id)
         |  WHERE a.vec_id <> p.query_id),
         |rk AS (SELECT query_id, neighbor_id, cos,
         |  row_number() OVER (PARTITION BY query_id
         |                     ORDER BY cos DESC, neighbor_id) AS rnk
         |  FROM cand)
         |SELECT query_id, CAST(rnk AS BIGINT) AS rnk, neighbor_id, cos
         |FROM rk WHERE rnk <= 5 ORDER BY query_id, rnk""".stripMargin,
    // the CDC replay: live set = untouched rows ∪ negated upserts
    // (delete-wins on the %7∩%9 overlap), seeds stay the ORIGINAL
    // 8 lowest-id build-slice vectors (centroids are frozen at build;
    // an upserted or deleted seed id never moves its centroid),
    // assignment/cosines read the FINAL live embeddings
    "sim_topk_ivf0_cdc_idx" ->
      s"""WITH ups AS (
         |  SELECT vec_id,
         |         list_transform(embedding, x -> -x) AS embedding
         |  FROM embeddings WHERE vec_id % 7 = 3 AND vec_id % 9 <> 4),
         |final AS (
         |  SELECT vec_id, embedding FROM embeddings
         |  WHERE vec_id % 9 <> 4 AND vec_id % 7 <> 3
         |  UNION ALL SELECT vec_id, embedding FROM ups),
         |seeds AS (
         |  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS list_id,
         |         embedding
         |  FROM (SELECT * FROM embeddings WHERE vec_id % 5 <> 0
         |        ORDER BY vec_id LIMIT 8)),
         |assign AS (
         |  SELECT e.vec_id, e.embedding,
         |    (SELECT s.list_id FROM seeds s
         |     ORDER BY (${dotSql("e", "s")}) / sqrt(${dotSql("s", "s")}) DESC,
         |              s.list_id LIMIT 1) AS list_id
         |  FROM final e),
         |pr AS (
         |  SELECT q.vec_id AS query_id, q.embedding, s.list_id,
         |    row_number() OVER (PARTITION BY q.vec_id
         |      ORDER BY (${dotSql("q", "s")}) / sqrt(${dotSql("s", "s")}) DESC,
         |               s.list_id) AS r
         |  FROM embeddings q, seeds s WHERE q.vec_id < 10),
         |cand AS (
         |  SELECT p.query_id, a.vec_id AS neighbor_id, ${cosSql("p", "a")} AS cos
         |  FROM (SELECT query_id, embedding, list_id FROM pr WHERE r <= 2) p
         |  JOIN assign a USING (list_id)
         |  WHERE a.vec_id <> p.query_id),
         |rk AS (SELECT query_id, neighbor_id, cos,
         |  row_number() OVER (PARTITION BY query_id
         |                     ORDER BY cos DESC, neighbor_id) AS rnk
         |  FROM cand)
         |SELECT query_id, CAST(rnk AS BIGINT) AS rnk, neighbor_id, cos
         |FROM rk WHERE rnk <= 5 ORDER BY query_id, rnk""".stripMargin,
    // the oracle replays the whole pipeline: seed centroids (8
    // lowest-id vectors), argmax dot/|c| assignment (ties by centroid
    // index — same contract as FloatVecBestLists), within-cluster
    // lower-id witness at cos >= tau, min-id representative kept
    "q_semdedup" ->
      s"""WITH seeds AS (
         |  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS list_id,
         |         embedding
         |  FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 8)),
         |assign AS (
         |  SELECT e.vec_id, e.embedding,
         |    (SELECT s.list_id FROM seeds s
         |     ORDER BY (${dotSql("e", "s")}) / sqrt(${dotSql("s", "s")}) DESC,
         |              s.list_id LIMIT 1) AS list_id
         |  FROM embeddings e),
         |drops AS (
         |  SELECT DISTINCT greatest(x.vec_id, y.vec_id) AS vec_id
         |  FROM assign x JOIN assign y
         |    ON x.list_id = y.list_id AND x.vec_id < y.vec_id
         |  WHERE ${cosSql("x", "y")} >= 0.45)
         |SELECT a.vec_id, a.list_id, (d.vec_id IS NULL) AS keep
         |FROM assign a LEFT JOIN drops d ON a.vec_id = d.vec_id
         |ORDER BY a.vec_id""".stripMargin,
    "q_hybrid_rrf" ->
      s"""WITH t0 AS (SELECT doc_id,
         |  list_filter(string_split_regex(text,'\\s+'), x -> len(x)>0) AS toks
         |  FROM documents),
         |t AS (SELECT doc_id, CASE WHEN len(toks) >= 2
         |        THEN list_transform(range(1, len(toks)),
         |             i -> toks[i] || ' ' || toks[i+1])
         |        ELSE [] END AS toks FROM t0),
         |corp AS (SELECT doc_id, unnest(toks) AS tok FROM t
         |         WHERE doc_id >= 10),
         |tf AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
         |       FROM corp GROUP BY 1, 2),
         |dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl
         |       FROM tf GROUP BY 1),
         |k AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |             CAST(sum(dl) AS BIGINT) AS tt FROM dl),
         |dfq AS (SELECT tok, CAST(count(*) AS BIGINT) AS df
         |        FROM tf GROUP BY 1),
         |idf AS (SELECT tok,
         |  CAST(len(bin((2*n - 2*df + 1)//(2*df + 1) + 1)) - 1 AS BIGINT)
         |    AS idf_q FROM dfq, k),
         |pt AS (SELECT doc_id AS probe_id, unnest(list_distinct(toks)) AS tok
         |       FROM t WHERE doc_id < 10),
         |s AS (SELECT probe_id, tf.doc_id AS doc_id,
         |  CAST(sum((idf_q * tf * 220000)
         |           //(1000*tf + 300 + 9*((100*dl*n)//tt))) AS BIGINT) AS score
         |  FROM pt JOIN tf USING (tok) JOIN idf USING (tok)
         |       JOIN dl ON tf.doc_id = dl.doc_id, k
         |  GROUP BY 1, 2),
         |rt AS (SELECT probe_id, doc_id,
         |  row_number() OVER (PARTITION BY probe_id
         |                     ORDER BY score DESC, doc_id) AS r FROM s),
         |rt20 AS (SELECT * FROM rt WHERE r <= 20),
         |dns AS (SELECT a.vec_id AS probe_id, b.vec_id AS doc_id,
         |         ${cosSql("a", "b")} AS cos
         |  FROM embeddings a, embeddings b
         |  WHERE a.vec_id < 10 AND b.vec_id >= 10),
         |rd AS (SELECT probe_id, doc_id,
         |  row_number() OVER (PARTITION BY probe_id
         |                     ORDER BY cos DESC, doc_id) AS r FROM dns),
         |rd20 AS (SELECT * FROM rd WHERE r <= 20),
         |fuse AS (SELECT COALESCE(rt20.probe_id, rd20.probe_id) AS probe_id,
         |  COALESCE(rt20.doc_id, rd20.doc_id) AS doc_id,
         |  CAST(COALESCE(1000000//(60 + rt20.r), 0)
         |     + COALESCE(1000000//(60 + rd20.r), 0) AS BIGINT) AS rrf
         |  FROM rt20 FULL OUTER JOIN rd20
         |    ON rt20.probe_id = rd20.probe_id AND rt20.doc_id = rd20.doc_id),
         |rk AS (SELECT probe_id, doc_id, rrf,
         |  row_number() OVER (PARTITION BY probe_id
         |                     ORDER BY rrf DESC, doc_id) AS rank FROM fuse)
         |SELECT probe_id, CAST(rank AS BIGINT) AS rank, doc_id, rrf
         |FROM rk WHERE rank <= 5 ORDER BY probe_id, rank""".stripMargin,
    // the indexed form: lexical leg identical (TermIndex == inline
    // BM25 by contract); dense leg replays the frozen-seed IVF index
    // (seeds = 8 lowest-id corpus vectors, 2-probe lists, exact
    // within-list cosine); fusion tail identical
    "q_hybrid_rrf_idx" ->
      s"""WITH t0 AS (SELECT doc_id,
         |  list_filter(string_split_regex(text,'\\s+'), x -> len(x)>0) AS toks
         |  FROM documents),
         |t AS (SELECT doc_id, CASE WHEN len(toks) >= 2
         |        THEN list_transform(range(1, len(toks)),
         |             i -> toks[i] || ' ' || toks[i+1])
         |        ELSE [] END AS toks FROM t0),
         |corp AS (SELECT doc_id, unnest(toks) AS tok FROM t
         |         WHERE doc_id >= 10),
         |tf AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
         |       FROM corp GROUP BY 1, 2),
         |dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl
         |       FROM tf GROUP BY 1),
         |k AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |             CAST(sum(dl) AS BIGINT) AS tt FROM dl),
         |dfq AS (SELECT tok, CAST(count(*) AS BIGINT) AS df
         |        FROM tf GROUP BY 1),
         |idf AS (SELECT tok,
         |  CAST(len(bin((2*n - 2*df + 1)//(2*df + 1) + 1)) - 1 AS BIGINT)
         |    AS idf_q FROM dfq, k),
         |pt AS (SELECT doc_id AS probe_id, unnest(list_distinct(toks)) AS tok
         |       FROM t WHERE doc_id < 10),
         |s AS (SELECT probe_id, tf.doc_id AS doc_id,
         |  CAST(sum((idf_q * tf * 220000)
         |           //(1000*tf + 300 + 9*((100*dl*n)//tt))) AS BIGINT) AS score
         |  FROM pt JOIN tf USING (tok) JOIN idf USING (tok)
         |       JOIN dl ON tf.doc_id = dl.doc_id, k
         |  GROUP BY 1, 2),
         |rt AS (SELECT probe_id, doc_id,
         |  row_number() OVER (PARTITION BY probe_id
         |                     ORDER BY score DESC, doc_id) AS r FROM s),
         |rt20 AS (SELECT * FROM rt WHERE r <= 20),
         |seeds AS (
         |  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS list_id,
         |         embedding
         |  FROM (SELECT * FROM embeddings WHERE vec_id >= 10
         |        ORDER BY vec_id LIMIT 8)),
         |assign AS (
         |  SELECT e.vec_id, e.embedding,
         |    (SELECT s2.list_id FROM seeds s2
         |     ORDER BY (${dotSql("e", "s2")}) / sqrt(${dotSql("s2", "s2")}) DESC,
         |              s2.list_id LIMIT 1) AS list_id
         |  FROM embeddings e WHERE e.vec_id >= 10),
         |pr AS (
         |  SELECT q.vec_id AS probe_id, q.embedding, s2.list_id,
         |    row_number() OVER (PARTITION BY q.vec_id
         |      ORDER BY (${dotSql("q", "s2")}) / sqrt(${dotSql("s2", "s2")}) DESC,
         |               s2.list_id) AS r
         |  FROM embeddings q, seeds s2 WHERE q.vec_id < 10),
         |dns AS (
         |  SELECT p.probe_id, a.vec_id AS doc_id, ${cosSql("p", "a")} AS cos
         |  FROM (SELECT probe_id, embedding, list_id FROM pr WHERE r <= 2) p
         |  JOIN assign a USING (list_id)
         |  WHERE a.vec_id <> p.probe_id),
         |rd AS (SELECT probe_id, doc_id,
         |  row_number() OVER (PARTITION BY probe_id
         |                     ORDER BY cos DESC, doc_id) AS r FROM dns),
         |rd20 AS (SELECT * FROM rd WHERE r <= 20),
         |fuse AS (SELECT COALESCE(rt20.probe_id, rd20.probe_id) AS probe_id,
         |  COALESCE(rt20.doc_id, rd20.doc_id) AS doc_id,
         |  CAST(COALESCE(1000000//(60 + rt20.r), 0)
         |     + COALESCE(1000000//(60 + rd20.r), 0) AS BIGINT) AS rrf
         |  FROM rt20 FULL OUTER JOIN rd20
         |    ON rt20.probe_id = rd20.probe_id AND rt20.doc_id = rd20.doc_id),
         |rk2 AS (SELECT probe_id, doc_id, rrf,
         |  row_number() OVER (PARTITION BY probe_id
         |                     ORDER BY rrf DESC, doc_id) AS rank FROM fuse)
         |SELECT probe_id, CAST(rank AS BIGINT) AS rank, doc_id, rrf
         |FROM rk2 WHERE rank <= 5 ORDER BY probe_id, rank""".stripMargin,
    "sim_topk_bruteforce" ->
      s"""WITH scored AS (
         |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
         |         ${cosSql("a", "b")} AS cos
         |  FROM embeddings a, embeddings b
         |  WHERE a.vec_id < 10 AND a.vec_id != b.vec_id),
         |ranked AS (
         |  SELECT query_id, neighbor_id, cos,
         |    ROW_NUMBER() OVER (PARTITION BY query_id
         |                       ORDER BY cos DESC, neighbor_id) AS rnk
         |  FROM scored)
         |SELECT query_id, rnk, neighbor_id, cos FROM ranked
         |WHERE rnk <= 5 ORDER BY query_id, rnk""".stripMargin,
    "sim_topk_lsh_q" -> {
      val dim = EmbDim
      def pSql(j: Int): String =
        s"""CAST(list_sum(list_transform(range($dim), i ->
           |      qv[i+1] * (CASE WHEN ('0x' || substr(md5(
           |        CAST(i AS VARCHAR) || '_$j'),1,8))::BIGINT % 2 = 0
           |        THEN 1 ELSE -1 END))) AS BIGINT)""".stripMargin
      val bandSelects = (0 until 4).map { b =>
        val v = (0 until 4).map(r =>
          s"(CASE WHEN ${pSql(b * 4 + r)} >= 0 THEN ${1L << r} ELSE 0 END)")
          .mkString("\n    + ")
        s"  SELECT vec_id, $b AS band,\n    $v AS bucket FROM t"
      }.mkString("\n  UNION ALL\n")
      s"""WITH m AS (SELECT vec_id, embedding,
         |    list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS mx
         |  FROM embeddings),
         |t AS (SELECT vec_id,
         |    list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) /
         |      (CASE WHEN mx > 0 THEN mx/127.0 ELSE 1.0 END) + 0.5) AS BIGINT)) AS qv
         |  FROM m),
         |bands AS (
         |$bandSelects),
         |cand AS (SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
         |  FROM bands q JOIN bands c ON q.band = c.band AND q.bucket = c.bucket
         |  WHERE q.vec_id < 10 AND q.vec_id != c.vec_id),
         |scored AS (SELECT query_id, neighbor_id, ${cosSql("a", "b")} AS cos
         |  FROM cand JOIN embeddings a ON a.vec_id = cand.query_id
         |            JOIN embeddings b ON b.vec_id = cand.neighbor_id),
         |ranked AS (SELECT query_id, neighbor_id, cos,
         |    ROW_NUMBER() OVER (PARTITION BY query_id
         |                       ORDER BY cos DESC, neighbor_id) AS rnk
         |  FROM scored)
         |SELECT query_id, rnk, neighbor_id, cos FROM ranked
         |WHERE rnk <= 5 ORDER BY query_id, rnk""".stripMargin
    },
    "q_knn_classify" ->
      s"""WITH scored AS (
         |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
         |         ${cosSql("a", "b")} AS cos
         |  FROM embeddings a, embeddings b
         |  WHERE a.vec_id < 10 AND a.vec_id != b.vec_id),
         |ranked AS (
         |  SELECT query_id, neighbor_id,
         |    ROW_NUMBER() OVER (PARTITION BY query_id
         |                       ORDER BY cos DESC, neighbor_id) AS rnk
         |  FROM scored),
         |votes AS (
         |  SELECT query_id, b.label, CAST(COUNT(*) AS BIGINT) AS votes
         |  FROM ranked JOIN embeddings b ON ranked.neighbor_id = b.vec_id
         |  WHERE rnk <= 10 GROUP BY 1, 2),
         |w AS (SELECT query_id, label, votes,
         |    ROW_NUMBER() OVER (PARTITION BY query_id
         |                       ORDER BY votes DESC, label) AS rn
         |  FROM votes)
         |SELECT query_id, label AS pred_label, votes FROM w
         |WHERE rn = 1 ORDER BY query_id""".stripMargin,
    "mm_features" ->
      """SELECT doc_id, len(text) AS n_bytes,
        |  CAST(list_sum(list_transform(string_split(text,''), c -> ascii(c))) AS BIGINT) AS checksum,
        |  CAST(ascii(substr(text,1,1)) % 64 + 1 AS BIGINT) AS width
        |FROM documents ORDER BY doc_id""".stripMargin,
    "dedup_incremental" -> incrementalOracleSql,
    // identical oracle by design: the index-backed probe must return
    // exactly what the self-contained recompute returns (IndexSpec
    // asserts pair-set equality; the driver's oracle pins both)
    "dedup_incremental_idx" -> incrementalOracleSql,

    "dedup_exact_idx" ->
      """WITH corpus AS (SELECT doc_id, md5(text) AS d FROM documents),
        |batch AS (
        |  SELECT doc_id + 1000000 AS doc_id, md5(text) AS d
        |  FROM documents WHERE doc_id % 7 = 3
        |  UNION ALL
        |  SELECT doc_id + 2000000, md5(text || ' xnovel')
        |  FROM documents WHERE doc_id % 7 = 5
        |  UNION ALL
        |  SELECT doc_id + 3000000, md5(text || ' xnovel')
        |  FROM documents WHERE doc_id % 14 = 5),
        |canon AS (SELECT d, min(doc_id) AS c FROM corpus GROUP BY 1),
        |bmin AS (SELECT d, min(doc_id) AS m FROM batch GROUP BY 1)
        |SELECT batch.doc_id AS doc_id, coalesce(canon.c, bmin.m) AS dup_of
        |FROM batch LEFT JOIN canon USING (d) JOIN bmin USING (d)
        |WHERE (canon.c IS NOT NULL OR bmin.m < batch.doc_id)
        |  AND coalesce(canon.c, bmin.m) != batch.doc_id
        |ORDER BY doc_id""".stripMargin,
    "q_stratified_sample" ->
      s"""WITH t AS (SELECT doc_id,
         |  list_filter(string_split_regex(text,'\\s+'), x -> len(x)>0) AS toks
         |  FROM documents),
         |s AS (SELECT doc_id, toks, $langBestSql AS best FROM t),
         |l AS (SELECT doc_id, $langPickSql AS lang FROM s)
         |SELECT doc_id, lang FROM l
         |WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)),1,8))::BIGINT <
         |  CASE WHEN lang = 'en' THEN ${(0.25 * (1L << 32)).toLong}
         |       WHEN lang = 'fr' THEN ${(0.5 * (1L << 32)).toLong}
         |       ELSE ${1L << 32} END
         |ORDER BY doc_id""".stripMargin,
    "q_mixture_sample" ->
      """WITH c AS (SELECT lang AS dom, CAST(count(*) AS DOUBLE) AS n,
        |    CASE lang WHEN 'en' THEN 0.25 WHEN 'de' THEN 0.25
        |              WHEN 'es' THEN 0.25 WHEN 'fr' THEN 0.25
        |              ELSE 0.0 END AS w
        |  FROM documents GROUP BY lang),
        |cw AS (SELECT * FROM c WHERE w > 0),
        |cap AS (SELECT min(n / w) AS cap FROM cw),
        |cuts AS (SELECT dom,
        |    CASE WHEN n / w = cap THEN 4294967296
        |         ELSE CAST(floor(w * cap / n * 4294967296.0) AS BIGINT)
        |    END AS cut
        |  FROM cw, cap)
        |SELECT d.doc_id, d.lang FROM documents d JOIN cuts ON d.lang = cuts.dom
        |WHERE ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)),1,8))::BIGINT < cut
        |ORDER BY d.doc_id""".stripMargin,
    "q_mixture_temperature" ->
      """WITH c AS (SELECT lang AS dom, CAST(count(*) AS DOUBLE) AS n,
        |    sqrt(CAST(count(*) AS DOUBLE)) AS w
        |  FROM documents WHERE lang IN ('en','de','es','fr','zh')
        |  GROUP BY lang),
        |cap AS (SELECT min(n / w) AS cap FROM c),
        |cuts AS (SELECT dom,
        |    CASE WHEN n / w = cap THEN 4294967296
        |         ELSE CAST(floor(w * cap / n * 4294967296.0) AS BIGINT)
        |    END AS cut
        |  FROM c, cap)
        |SELECT d.doc_id, d.lang FROM documents d JOIN cuts ON d.lang = cuts.dom
        |WHERE ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)),1,8))::BIGINT < cut
        |ORDER BY d.doc_id""".stripMargin,
    "q_mixture_upsample" ->
      """WITH c AS (SELECT lang AS dom, CAST(count(*) AS DOUBLE) AS n,
        |    CASE lang WHEN 'en' THEN 0.4 WHEN 'de' THEN 0.3
        |              WHEN 'zh' THEN 0.3 ELSE 0.0 END AS w
        |  FROM documents GROUP BY lang),
        |cw AS (SELECT * FROM c WHERE w > 0),
        |cap AS (SELECT min(n / w) AS cap FROM cw),
        |e AS (SELECT dom,
        |    CASE WHEN n / w = cap THEN 2.0 ELSE 2.0 * (w * cap / n) END AS ep
        |  FROM cw, cap),
        |cuts AS (SELECT dom, CAST(floor(ep) AS BIGINT) AS base,
        |    CAST(floor((ep - floor(ep)) * 4294967296.0) AS BIGINT) AS fcut
        |  FROM e),
        |j AS (SELECT d.doc_id, d.lang,
        |    base + (CASE WHEN
        |      ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || 'copy'),1,8))::BIGINT
        |      < fcut THEN 1 ELSE 0 END) AS copies
        |  FROM documents d JOIN cuts ON d.lang = cuts.dom)
        |SELECT doc_id, lang, CAST(u AS BIGINT) AS copy
        |FROM j, LATERAL unnest(range(copies)) AS t(u)
        |WHERE copies > 0
        |ORDER BY doc_id, copy""".stripMargin,
    "q_shuffle_epoch" ->
      """SELECT doc_id,
        |  CAST(ROW_NUMBER() OVER (ORDER BY
        |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)),1,8))::BIGINT,
        |    doc_id) - 1 AS BIGINT) AS pos
        |FROM documents ORDER BY pos""".stripMargin,
    "q_weighted_sample" ->
      """WITH p AS (SELECT lang, doc_id, n_chars,
        |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)),1,8))::BIGINT AS h
        |  FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0),
        |v AS (SELECT *, CAST(floor(-ln((h + 1) / 4294967296.0)
        |                           * 16777216.0) AS BIGINT) AS e FROM p),
        |r AS (SELECT lang, doc_id, n_chars, row_number() OVER (
        |    PARTITION BY lang
        |    ORDER BY CAST(e AS DOUBLE) / CAST(n_chars AS DOUBLE), h, doc_id
        |  ) AS rn FROM v)
        |SELECT lang, doc_id, n_chars FROM r WHERE rn <= 5
        |ORDER BY lang, doc_id""".stripMargin,
    "q_weighted_sample_global" ->
      """WITH p AS (SELECT doc_id, lang, n_chars,
        |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)),1,8))::BIGINT AS h
        |  FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0),
        |v AS (SELECT *, CAST(floor(-ln((h + 1) / 4294967296.0)
        |                           * 16777216.0) AS BIGINT) AS e FROM p),
        |s AS (SELECT doc_id, lang, n_chars FROM v
        |  ORDER BY CAST(e AS DOUBLE) / CAST(n_chars AS DOUBLE), h, doc_id
        |  LIMIT 20)
        |SELECT doc_id, lang, n_chars FROM s ORDER BY doc_id""".stripMargin,
    "text_dup_ngram_frac" ->
      """WITH toks AS (SELECT doc_id,
        |    list_filter(string_split_regex(text,'\s+'), x -> len(x)>0) AS t
        |  FROM documents),
        |shd AS (SELECT DISTINCT doc_id, s FROM toks,
        |  LATERAL (SELECT unnest(list_transform(range(1, len(t)-3),
        |    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]
        |         || ' ' || t[i+4])) AS s)
        |  WHERE len(t) >= 5),
        |dfs AS (SELECT s, count(*) AS df FROM shd GROUP BY s)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shingles,
        |  CAST(SUM(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
        |  CAST(SUM(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE) AS dup_frac
        |FROM shd JOIN dfs USING (s) GROUP BY doc_id
        |ORDER BY doc_id""".stripMargin,
    "q_kfold" ->
      """SELECT doc_id,
        |  ('0x' || substr(md5(CAST(doc_id AS VARCHAR)),1,8))::BIGINT % 5 AS fold
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_quantile_bins" ->
      """WITH c AS (SELECT doc_id,
        |  CAST(len(list_filter(string_split_regex(text,'\s+'), x -> len(x)>0))
        |       AS BIGINT) AS n_tokens FROM documents),
        |t AS (SELECT quantile_cont(n_tokens,
        |        [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS thr FROM c)
        |SELECT doc_id, n_tokens,
        |  CAST(len(list_filter(thr, x -> CAST(n_tokens AS DOUBLE) > x)) + 1
        |       AS BIGINT) AS bin
        |FROM c, t ORDER BY doc_id""".stripMargin,
    "q_decontaminate" -> decontaminateOracle,
    // Bloom pass only over-keeps; the verify join restores exactness —
    // same oracle by construction.
    "q_decontaminate_bloom" -> decontaminateOracle,
    "q_contamination_report" -> {
      val cut = Sampling.cuts(Seq(0.2))(1)
      val sh5 = (0 until 5).map(j => s"t[i+$j]").mkString(" || ' ' || ")
      s"""WITH toks AS (
         |  SELECT doc_id,
         |    list_filter(string_split_regex(text,'\\s+'), x -> len(x)>0) AS t
         |  FROM documents),
         |sh AS (
         |  SELECT DISTINCT doc_id, s FROM toks,
         |  LATERAL (SELECT unnest(list_transform(range(1, len(t)-3),
         |                  i -> $sh5)) AS s)
         |  WHERE len(t) >= 5),
         |probe AS (SELECT doc_id FROM documents
         |  WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)),1,8))::BIGINT
         |        < $cut),
         |psh AS (SELECT DISTINCT s FROM sh
         |        WHERE doc_id IN (SELECT doc_id FROM probe)),
         |hits AS (SELECT doc_id, COUNT(*) AS n_shared
         |  FROM sh
         |  WHERE doc_id NOT IN (SELECT doc_id FROM probe)
         |    AND s IN (SELECT s FROM psh)
         |  GROUP BY doc_id)
         |SELECT d.source, CAST(COUNT(*) AS BIGINT) AS n_docs_contaminated,
         |  CAST(SUM(n_shared) AS BIGINT) AS n_shared_total
         |FROM hits JOIN documents d USING (doc_id)
         |GROUP BY d.source ORDER BY d.source""".stripMargin
    },
    "q_quarantine" ->
      s"""WITH t AS (SELECT doc_id, text,
         |  list_filter(string_split_regex(text,'\\s+'), x -> len(x)>0) AS toks
         |  FROM documents),
         |s AS (SELECT doc_id, text, toks, $langBestSql AS best FROM t),
         |l AS (SELECT doc_id, text, toks, $langPickSql AS lang FROM s),
         |v AS (SELECT doc_id, list_filter([
         |  CASE WHEN NOT (len(text) >= 100) THEN 'too_short' END,
         |  CASE WHEN NOT (CAST(len(regexp_replace(text,'[^a-zA-Z]','','g')) AS DOUBLE)
         |                 / CAST(len(text) AS DOUBLE) >= 0.5) THEN 'low_alpha' END,
         |  CASE WHEN NOT (len(toks) >= 20) THEN 'few_tokens' END,
         |  CASE WHEN NOT (lang != 'und') THEN 'unknown_lang' END],
         |  x -> x IS NOT NULL) AS viols FROM l)
         |SELECT doc_id, CAST(len(viols) AS BIGINT) AS n_violations,
         |  COALESCE(array_to_string(viols, ','), '') AS viol
         |FROM v ORDER BY doc_id""".stripMargin,
    "mm_embed_topk" -> {
      val dims = (0 until 16).map(j =>
        s"CAST(COALESCE(list_sum(list_transform(" +
          s"list_filter(range(0, L), p -> p % 16 = $j), p -> cs[p+1])), 0) " +
          s"% 997 AS DOUBLE) / 1024.0").mkString(", ")
      def dot(a: String, b: String) =
        (1 to 16).map(i => s"$a.e[$i]*$b.e[$i]").mkString(" + ")
      val cos = s"(${dot("a", "b")}) / (sqrt(${dot("a", "a")}) * sqrt(${dot("b", "b")}))"
      s"""WITH codes AS (SELECT doc_id,
         |    list_transform(string_split(text,''), c -> ascii(c)) AS cs,
         |    len(text) AS L FROM documents),
         |emb AS (SELECT doc_id, [$dims] AS e FROM codes),
         |scored AS (
         |  SELECT a.doc_id AS query_id, b.doc_id AS neighbor_id, $cos AS cos
         |  FROM emb a, emb b WHERE a.doc_id < 10 AND a.doc_id != b.doc_id),
         |ranked AS (
         |  SELECT query_id, neighbor_id, cos,
         |    ROW_NUMBER() OVER (PARTITION BY query_id
         |                       ORDER BY cos DESC, neighbor_id) AS rnk
         |  FROM scored)
         |SELECT query_id, rnk, neighbor_id, cos FROM ranked
         |WHERE rnk <= 5 ORDER BY query_id, rnk""".stripMargin
    },
    "mm_frame_sample" ->
      """WITH c AS (SELECT doc_id, len(text) AS L,
        |  greatest(len(text) // 256, 1) AS nf FROM documents)
        |SELECT doc_id, (nf - 1) // 4 + 1 AS n_frames,
        |  CASE WHEN L < 256 THEN L ELSE ((nf - 1) // 4 + 1) * 256 END AS total_bytes
        |FROM c ORDER BY doc_id""".stripMargin
  )

  // Language-ID SQL pieces (argmax of per-language stopword hits with
  // fixed tie-break order de,en,es,fr,zh; 0 hits → und) — shared by the
  // text_langid and text_top_tokens oracles.
  private lazy val langHitExprs: Seq[(String, String)] = TF.langs.map { l =>
    val set = TF.stopwords(l).map(s => s"'$s'").mkString(", ")
    l -> s"len(list_filter(toks, x -> x IN ($set)))"
  }
  private[queries] lazy val langBestSql: String =
    s"greatest(${langHitExprs.map(_._2).mkString(", ")})"
  private[queries] lazy val langPickSql: String =
    langHitExprs.reverse.foldLeft("'und'") { case (acc, (l, h)) =>
      s"CASE WHEN $h = best AND $h > 0 THEN '$l' ELSE $acc END"
    }

  /**
   * DuckDB replica of Dedup.simhash + simhashDupPairs: md5-nibble bit
   * votes → sign bits → all-pairs distance, restricted to pairs
   * sharing at least one of the 4 16-bit blocks (the pigeonhole
   * candidate rule — part of the operator's contract for maxDist > 3)
   * with total hamming distance <= maxDist. All-pairs is fine for the
   * ORACLE (DuckDB at sf0.01); the Spark operator never does all-pairs.
   */
  private def simhashOracle(maxDist: Int): String = {
    val nibExprs = (0 until 16).map(p =>
      s"(strpos('0123456789abcdef', substr(m, ${p + 1}, 1)) - 1) AS n$p")
      .mkString(", ")
    val voteExprs = (0 until 64).map { b =>
      val p = b / 4; val pow = 1 << (b % 4)
      s"SUM(CASE WHEN (n$p // $pow) % 2 = 1 THEN 1 ELSE -1 END) AS v$b"
    }.mkString(", ")
    val signExprs = (0 until 64).map(b =>
      s"CASE WHEN v$b > 0 THEN 1 ELSE 0 END AS s$b").mkString(", ")
    val blockDiffs = (0 until 4).map { i =>
      val terms = (16 * i until 16 * (i + 1)).map(b =>
        s"CASE WHEN x.s$b != y.s$b THEN 1 ELSE 0 END").mkString(" + ")
      s"($terms) AS d$i"
    }.mkString(", ")
    s"""WITH toks AS (SELECT doc_id,
       |  list_filter(string_split_regex(text,'\\s+'), t -> len(t)>0) AS t
       |  FROM documents),
       |tok AS (SELECT doc_id, unnest(t) AS tok FROM toks),
       |h AS (SELECT doc_id, md5(tok) AS m FROM tok),
       |n AS (SELECT doc_id, $nibExprs FROM h),
       |v AS (SELECT doc_id, $voteExprs FROM n GROUP BY doc_id),
       |s AS (SELECT doc_id, $signExprs FROM v),
       |p AS (SELECT x.doc_id AS a, y.doc_id AS b, $blockDiffs
       |  FROM s x JOIN s y ON x.doc_id < y.doc_id)
       |SELECT a, b, CAST(d0 + d1 + d2 + d3 AS BIGINT) AS dist FROM p
       |WHERE (d0 = 0 OR d1 = 0 OR d2 = 0 OR d3 = 0)
       |  AND d0 + d1 + d2 + d3 <= $maxDist
       |ORDER BY a, b""".stripMargin
  }

  /** Exact 3-gram-shingle Jaccard pair SQL (inverted index form),
    * mirroring Dedup.dfCapped: shingles in more than `maxDf` documents
    * are dropped before sizes and co-occurrence. `src` is the corpus
    * relation (a table or an earlier CTE with doc_id, text). */
  private def incrementalOracleSql: String = {
    val cut = Sampling.cuts(Seq(0.9))(1)
    s"""WITH pairs AS (${jaccardOracle(0.5)}),
       |nd AS (SELECT doc_id FROM documents
       |  WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)),1,8))::BIGINT
       |        >= $cut)
       |SELECT a, b, jaccard FROM pairs
       |WHERE a IN (SELECT doc_id FROM nd) OR b IN (SELECT doc_id FROM nd)
       |ORDER BY a, b""".stripMargin
  }

  private lazy val decontaminateOracle: String = {
    val cut = Sampling.cuts(Seq(0.2))(1)
    val sh5 = (0 until 5).map(j => s"t[i+$j]").mkString(" || ' ' || ")
    s"""WITH toks AS (
       |  SELECT doc_id,
       |    list_filter(string_split_regex(text,'\\s+'), x -> len(x)>0) AS t
       |  FROM documents),
       |sh AS (
       |  SELECT DISTINCT doc_id, s FROM toks,
       |  LATERAL (SELECT unnest(list_transform(range(1, len(t)-3),
       |                  i -> $sh5)) AS s)
       |  WHERE len(t) >= 5),
       |probe AS (SELECT doc_id FROM documents
       |  WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)),1,8))::BIGINT
       |        < $cut),
       |psh AS (SELECT DISTINCT s FROM sh
       |        WHERE doc_id IN (SELECT doc_id FROM probe))
       |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_shared
       |FROM sh
       |WHERE doc_id NOT IN (SELECT doc_id FROM probe)
       |  AND s IN (SELECT s FROM psh)
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  private def jaccardOracle(minJ: Double, maxDf: Int = 100,
                            src: String = "documents"): String =
    s"""WITH toks AS (
       |  SELECT doc_id,
       |    list_filter(string_split_regex(text,'\\s+'), x -> len(x)>0) AS t
       |  FROM $src),
       |shd AS (
       |  SELECT DISTINCT doc_id, s FROM toks,
       |  LATERAL (SELECT unnest(list_transform(range(1, len(t)-1),
       |                  i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s)
       |  WHERE len(t) >= 3),
       |sh AS (SELECT * FROM shd WHERE s IN (
       |  SELECT s FROM shd GROUP BY s HAVING count(*) <= $maxDf)),
       |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
       |pairs AS (
       |  SELECT a.doc_id AS a, b.doc_id AS b, count(*) AS c
       |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2)
       |SELECT a, b, CAST(c AS DOUBLE)/CAST(sa.n + sb.n - c AS DOUBLE) AS jaccard
       |FROM pairs JOIN sizes sa ON a = sa.doc_id JOIN sizes sb ON b = sb.doc_id
       |WHERE CAST(c AS DOUBLE)/CAST(sa.n + sb.n - c AS DOUBLE) >= $minJ
       |ORDER BY a, b""".stripMargin
}
