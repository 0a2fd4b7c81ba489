package graft.queries

import graft.Tables
import graft.functions.{TextFunctions => TF}
import graft.operators.{Chunking, Funnel, Retrieval, Sampling, TermIndex, Terms}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Round-4 corpus-preparation and event-analytics queries: token-window
 * chunking, cross-document segment dedup (C4-style line dedup),
 * TF-IDF-ranked distinctive terms, collocation mining, ordered funnels
 * and cohort retention. Every query carries a full DuckDB oracle —
 * the rankings are deliberately all-integer (see Terms) so no float
 * tolerance is needed anywhere.
 */
object CorpusOps {

  private val ChunkSize = 30
  private val ChunkStride = 20
  private val SegLen = 10
  private val DupSpanW = 8
  private val DsirBuckets = 256
  private val FunnelWithinUs = 12L * 3600 * 1000000 // 12 h per step
  private val DayUs = 86400000000L

  // DELIBERATE exact run: q_bm25_topk_idx's probes are full documents
  // (the adjudicated corpus-linear exact floor, BENCH_NOTES_r10 §2)
  // and the query is oracled pair-for-pair against the inline BM25 —
  // so the probe-cost gate is explicitly opted out here, eyes open
  private val bm25IdxCfg = TermIndex.Config(termsTag = "bigram",
    maxCandidateFraction = TermIndex.ExactUnbounded)

  private val tIndexes =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** One persisted TermIndex per corpus dir for the driver run —
    * built on first use, reused by later probes (the minhashIndexFor
    * stance in PipelineOps). */
  private def termIndexFor(spark: SparkSession, dir: String,
                           corpus: DataFrame): String =
    tIndexes.computeIfAbsent(dir, _ => {
      val d = java.nio.file.Files.createTempDirectory("graft_tidx_q").toString
      TermIndex.build(spark, corpus, "doc_id", "text", d, bm25IdxCfg,
        Terms.bigramTerms)
      d
    })

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Sliding token-window chunking: 30-token chunks every 20 tokens.
    "text_chunk" -> { (spark, dir) =>
      Chunking.chunk(Tables.load(spark, dir, "documents"),
        "doc_id", "text", ChunkSize, ChunkStride)
        .orderBy("doc_id", "chunk_id")
    },

    // Cross-document segment dedup: each distinct 10-token segment
    // survives only at its first (doc_id, seg_idx) occurrence.
    "text_seg_dedup" -> { (spark, dir) =>
      Chunking.segmentDedup(Tables.load(spark, dir, "documents"),
        "doc_id", "text", SegLen)
        .orderBy("doc_id")
    },

    // Top-3 distinctive terms per doc, all-integer TF-IDF ranking.
    "text_distinctive" -> { (spark, dir) =>
      Terms.distinctiveTerms(Tables.load(spark, dir, "documents"),
        "doc_id", "text", 3)
        .orderBy("doc_id", "rank")
    },

    // Corpus top-20 adjacent-token bigrams (collocations).
    "q_top_bigrams" -> { (spark, dir) =>
      Terms.topBigrams(Tables.load(spark, dir, "documents"), "text", 20)
    },

    // BM25 retrieval: a 5% hash-bucket of documents acts as the query
    // workload; top-5 corpus docs per probe, integer-quantized scoring
    // (bit-exact cross-engine — see Terms.bm25TopK). Bigram phrase
    // terms: the synthetic corpus' 31-word unigram vocabulary is
    // near-uniform (df ≈ 0.8N ⇒ quantized idf 0 everywhere), while
    // its ~900 bigrams spread df 1..46 — real rankings to verify.
    "q_bm25_topk" -> { (spark, dir) =>
      val d = Tables.load(spark, dir, "documents")
      val isProbe =
        Sampling.hashBucket(col("doc_id")) < lit(Sampling.cuts(Seq(0.05))(1))
      Terms.bm25TopK(d.filter(!isProbe), d.filter(isProbe),
        "doc_id", "text", k = 5, terms = Terms.bigramTerms)
        .orderBy("probe_id", "rank")
    },

    // Quantized Naive Bayes QUALITY classifier (the CCNet/fastText
    // recipe: discriminate in-domain text from noise): class-unigram
    // LMs with Laplace smoothing, trained on the 95% split of clean
    // docs vs their deterministically garbled twins (every token
    // reversed — the SQL-mirrorable stand-in for garbage), applied to
    // the 5% holdout of both variants. Every log is quantized to
    // integer floor(log2), so training AND prediction are cross-engine
    // exact — the classifier itself is fully oracled, not a tolerance
    // check. (The corpus' lang/source labels are independent of the
    // text by construction, so a real-label task would be vacuous —
    // at-chance everywhere; clean-vs-garbled is both separable and the
    // actual pipeline use.)
    "q_nb_quality" -> { (spark, dir) =>
      val d = Tables.load(spark, dir, "documents")
      val clean = d.select((col("doc_id") * 2).as("cid"), col("text"),
        lit("clean").as("variant"))
      val garbled = d.select((col("doc_id") * 2 + 1).as("cid"),
        concat_ws(" ", transform(TF.tokens(col("text")), t => reverse(t)))
          .as("text"),
        lit("garbled").as("variant"))
      val all = clean.unionByName(garbled)
      val isProbe =
        Sampling.hashBucket(col("cid")) < lit(Sampling.cuts(Seq(0.05))(1))
      val test = all.filter(isProbe)
      Terms.nbClassify(all.filter(!isProbe), test, "cid", "text",
        col("variant"), Seq("clean", "garbled"))
        .join(test.select(col("cid"), col("variant")), Seq("cid"))
        .select(expr("cid div 2").as("doc_id"), col("variant"), col("pred"))
        .orderBy("doc_id", "variant")
    },

    // The same retrieval against the PERSISTED incremental inverted
    // index (TermIndex) — built once per corpus dir, probed at
    // candidate cost; pair-for-pair equal to the inline q_bm25_topk,
    // so it shares that oracle verbatim.
    "q_bm25_topk_idx" -> { (spark, dir) =>
      val d = Tables.load(spark, dir, "documents")
      val isProbe =
        Sampling.hashBucket(col("doc_id")) < lit(Sampling.cuts(Seq(0.05))(1))
      val idx = termIndexFor(spark, dir, d.filter(!isProbe))
      TermIndex.topK(spark, idx, d.filter(isProbe), "doc_id", "text",
        k = 5, bm25IdxCfg, Terms.bigramTerms)
        .orderBy("probe_id", "rank")
    },

    // Unigram-LM surprisal (CCNet perplexity-filter shape, integer
    // quantized): per-doc token count + quantized-surprisal sum/max.
    "q_lm_surprisal" -> { (spark, dir) =>
      Terms.unigramSurprisal(Tables.load(spark, dir, "documents"),
        "doc_id", "text")
        .orderBy("doc_id")
    },

    // Conditional bigram-LM surprisal: quantized -log2 P(w2|w1) summed
    // per doc — the Markov/perplexity form of the filter above.
    "q_lm_bigram_surprisal" -> { (spark, dir) =>
      Terms.bigramSurprisal(Tables.load(spark, dir, "documents"),
        "doc_id", "text")
        .orderBy("doc_id")
    },

    // CCNet-style perplexity bucketing: head/middle/tail by per-LANGUAGE
    // terciles of the quantized mean bigram surprisal. Cutoffs are a
    // one-row-per-lang aggregate broadcast back — no per-lang sort.
    "q_ppl_buckets" -> { (spark, dir) =>
      Terms.surprisalBuckets(Tables.load(spark, dir, "documents"),
        "doc_id", "text", "lang")
        .orderBy("doc_id")
    },

    // Content-defined chunking (LBFS/rsync shape at token granularity)
    // + chunk-hash dedup stats: boundaries after md5-bucket≡0 tokens,
    // first corpus occurrence per distinct chunk, per-doc re-stated
    // bytes.
    "text_cdc_chunks" -> { (spark, dir) =>
      Chunking.cdcChunks(Tables.load(spark, dir, "documents"),
        "doc_id", "text", avgLen = 8)
        .orderBy("doc_id")
    },

    // Exact duplicate-span removal (ExactSubstr / Lee et al. shape):
    // 8-token sliding windows duplicated corpus-wide are cut at every
    // occurrence but the first; docs reassembled from surviving tokens.
    "text_dup_spans" -> { (spark, dir) =>
      Chunking.dupSpanRemove(Tables.load(spark, dir, "documents"),
        "doc_id", "text", DupSpanW)
        .orderBy("doc_id")
    },

    // DSIR importance weights: hashed-bigram features (the corpus'
    // unigram vocabulary is shared across langs — only bigrams
    // discriminate), target = the English slice; quantized log
    // importance ratio.
    "q_dsir_weights" -> { (spark, dir) =>
      Retrieval.dsirWeights(Tables.load(spark, dir, "documents"),
        "doc_id", "text", col("lang") === "en", DsirBuckets,
        terms = Terms.bigramTerms)
        .orderBy("doc_id")
    },

    // Ordered funnel view → click → purchase, 12 h per-step deadline.
    "q_events_funnel" -> { (spark, dir) =>
      val ev = Tables.load(spark, dir, "events")
        .filter(col("event_type").isin("view", "click", "purchase"))
        .select(col("user_id"), col("event_id"), col("event_type"),
          unix_micros(col("ts")).as("us"))
      Funnel.funnel(ev, "user_id", "us", "event_id", "event_type",
        Seq("view", "click", "purchase"), FunnelWithinUs)
        .orderBy("stage")
    },

    // Daily signup-cohort retention triangle, offsets 0..7.
    "q_events_retention" -> { (spark, dir) =>
      val ev = Tables.load(spark, dir, "events")
        .withColumn("us", unix_micros(col("ts")))
      Funnel.retention(ev, "user_id", "us", "event_type", "signup",
        DayUs, 7)
        .select(col("cohort"), col("offset").as("offset_d"), col("n_users"))
        .orderBy("cohort", "offset_d")
    }
  )

  private val toks =
    raw"list_filter(string_split_regex(text,'\s+'), x -> len(x)>0)"

  /** Shared by q_bm25_topk and q_bm25_topk_idx: the persisted index is
    * pair-for-pair equal to the inline retrieval by contract
    * (TermIndexSpec), so both compare against one oracle. */
  private lazy val bm25Oracle: String = {
    val cut = Sampling.cuts(Seq(0.05))(1)
    s"""WITH t0 AS (SELECT doc_id, $toks AS toks FROM documents),
       |t AS (SELECT doc_id, CASE WHEN len(toks) >= 2
       |        THEN list_transform(range(1, len(toks)),
       |             i -> toks[i] || ' ' || toks[i+1])
       |        ELSE [] END AS toks FROM t0),
       |pid AS (SELECT doc_id FROM documents
       |  WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)),1,8))::BIGINT
       |        < $cut),
       |corp AS (SELECT doc_id, unnest(toks) AS tok FROM t
       |         WHERE doc_id NOT IN (SELECT doc_id FROM pid)),
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
       |pt AS (SELECT t.doc_id AS probe_id, unnest(list_distinct(toks)) AS tok
       |       FROM t JOIN pid USING (doc_id)),
       |s AS (SELECT probe_id, tf.doc_id AS doc_id,
       |  CAST(sum((idf_q * tf * 220000)
       |           //(1000*tf + 300 + 9*((100*dl*n)//tt))) AS BIGINT) AS score
       |  FROM pt JOIN tf USING (tok) JOIN idf USING (tok)
       |       JOIN dl ON tf.doc_id = dl.doc_id, k
       |  GROUP BY 1, 2),
       |r AS (SELECT probe_id, doc_id, score,
       |  row_number() OVER (PARTITION BY probe_id
       |                     ORDER BY score DESC, doc_id) AS rank FROM s)
       |SELECT probe_id, CAST(rank AS BIGINT) AS rank, doc_id, score
       |FROM r WHERE rank <= 5 ORDER BY probe_id, rank""".stripMargin
  }

  val oracleSql: Map[String, String] = Map(

    "text_chunk" ->
      s"""WITH t AS (SELECT doc_id, $toks AS toks FROM documents),
         |i AS (SELECT doc_id, toks,
         |  unnest(range(0, CAST(floor((len(toks)-1)/$ChunkStride) AS BIGINT) + 1)) AS chunk_id
         |  FROM t WHERE len(toks) > 0),
         |c AS (SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
         |  list_slice(toks, chunk_id*$ChunkStride+1,
         |             least(chunk_id*$ChunkStride+$ChunkSize, len(toks))) AS ctoks
         |  FROM i)
         |SELECT doc_id, chunk_id, CAST(len(ctoks) AS BIGINT) AS n_tok,
         |  array_to_string(ctoks, ' ') AS chunk
         |FROM c ORDER BY doc_id, chunk_id""".stripMargin,

    "text_seg_dedup" ->
      s"""WITH t AS (SELECT doc_id, $toks AS toks FROM documents),
         |i AS (SELECT doc_id, toks,
         |  unnest(range(0, CAST(floor((len(toks)-1)/$SegLen) AS BIGINT) + 1)) AS seg_idx
         |  FROM t WHERE len(toks) > 0),
         |segs AS (SELECT doc_id, CAST(seg_idx AS BIGINT) AS seg_idx,
         |  array_to_string(list_slice(toks, seg_idx*$SegLen+1,
         |    least(seg_idx*$SegLen+$SegLen, len(toks))), ' ') AS seg
         |  FROM i),
         |tot AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_seg_total
         |        FROM segs GROUP BY 1),
         |k AS (SELECT doc_id, seg_idx, seg,
         |  row_number() OVER (PARTITION BY seg ORDER BY doc_id, seg_idx) AS rn
         |  FROM segs)
         |SELECT k.doc_id, string_agg(seg, ' ' ORDER BY seg_idx) AS clean_text,
         |  CAST(count(*) AS BIGINT) AS n_seg_kept, tot.n_seg_total AS n_seg_total
         |FROM k JOIN tot USING (doc_id) WHERE rn = 1
         |GROUP BY k.doc_id, tot.n_seg_total ORDER BY doc_id""".stripMargin,

    "text_distinctive" ->
      s"""WITH t AS (SELECT doc_id, $toks AS toks FROM documents),
         |tok AS (SELECT doc_id, unnest(toks) AS token FROM t),
         |tf AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
         |       FROM tok GROUP BY 1, 2),
         |df AS (SELECT token, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
         |ranked AS (SELECT doc_id, token, tf.tf, df.df,
         |  row_number() OVER (PARTITION BY doc_id
         |                     ORDER BY tf.tf DESC, df.df ASC, token ASC) AS rank
         |  FROM tf JOIN df USING (token))
         |SELECT doc_id, CAST(rank AS BIGINT) AS rank, token, tf, df
         |FROM ranked WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin,

    "q_top_bigrams" ->
      s"""WITH t AS (SELECT doc_id, $toks AS toks FROM documents),
         |bg AS (SELECT unnest(list_transform(range(1, len(toks)),
         |         i -> toks[i] || ' ' || toks[i+1])) AS bigram
         |       FROM t WHERE len(toks) >= 2)
         |SELECT bigram, CAST(count(*) AS BIGINT) AS n
         |FROM bg GROUP BY 1 ORDER BY n DESC, bigram ASC LIMIT 20""".stripMargin,

    "q_bm25_topk" -> bm25Oracle,
    // the persisted-index form is pair-for-pair equal to the inline
    // query by contract (TermIndexSpec), so it shares the oracle
    // verbatim — the same stance as dedup_incremental_idx
    "q_bm25_topk_idx" -> bm25Oracle,

    "q_nb_quality" ->
      s"""WITH cl0 AS (SELECT doc_id * 2 AS cid, text, 'clean' AS variant
         |             FROM documents),
         |gb0 AS (SELECT doc_id * 2 + 1 AS cid,
         |    array_to_string(list_transform($toks, x -> reverse(x)), ' ')
         |      AS text,
         |    'garbled' AS variant FROM documents),
         |all0 AS (SELECT * FROM cl0 UNION ALL SELECT * FROM gb0),
         |probe AS (SELECT * FROM all0
         |  WHERE ('0x' || substr(md5(CAST(cid AS VARCHAR)),1,8))::BIGINT
         |        < ${(0.05 * (1L << 32)).toLong}),
         |train AS (SELECT * FROM all0
         |  WHERE ('0x' || substr(md5(CAST(cid AS VARCHAR)),1,8))::BIGINT
         |        >= ${(0.05 * (1L << 32)).toLong}),
         |ttok AS (SELECT variant AS cl, unnest($toks) AS tok FROM train),
         |cnt AS (SELECT cl, tok, CAST(count(*) AS BIGINT) AS n
         |        FROM ttok GROUP BY 1, 2),
         |tot AS (SELECT cl, CAST(sum(n) AS BIGINT) AS t FROM cnt GROUP BY 1),
         |voc AS (SELECT CAST(count(DISTINCT tok) AS BIGINT) AS v FROM cnt),
         |nc AS (SELECT variant AS cl, CAST(count(*) AS BIGINT) AS ndocs
         |       FROM train GROUP BY 1),
         |pri AS (SELECT cl, CAST(len(bin(
         |          (SELECT CAST(sum(ndocs) AS BIGINT) FROM nc) // ndocs))
         |          - 1 AS BIGINT) AS pu FROM nc),
         |ptf AS (SELECT cid, tok, CAST(count(*) AS BIGINT) AS tf
         |  FROM (SELECT cid, unnest($toks) AS tok FROM probe)
         |  GROUP BY 1, 2),
         |cls AS (SELECT unnest(['clean','garbled']) AS cl),
         |sc AS (SELECT p.cid, c.cl,
         |    CAST(sum(p.tf * (len(bin((tot.t + voc.v)
         |      // (COALESCE(cnt.n, 0) + 1))) - 1)) AS BIGINT) AS ll
         |  FROM ptf p CROSS JOIN cls c
         |  LEFT JOIN cnt ON cnt.cl = c.cl AND cnt.tok = p.tok
         |  JOIN tot ON tot.cl = c.cl CROSS JOIN voc
         |  GROUP BY 1, 2),
         |fin AS (SELECT sc.cid, sc.cl,
         |    ROW_NUMBER() OVER (PARTITION BY sc.cid
         |      ORDER BY sc.ll + pri.pu, sc.cl) AS rn
         |  FROM sc JOIN pri ON pri.cl = sc.cl)
         |SELECT f.cid // 2 AS doc_id, p.variant, f.cl AS pred
         |FROM fin f JOIN probe p USING (cid)
         |WHERE f.rn = 1 ORDER BY doc_id, variant""".stripMargin,

    "q_lm_surprisal" ->
      s"""WITH t AS (SELECT doc_id, $toks AS toks FROM documents),
         |tok AS (SELECT doc_id, unnest(toks) AS tok FROM t),
         |tf AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
         |       FROM tok GROUP BY 1, 2),
         |c AS (SELECT tok, CAST(sum(tf) AS BIGINT) AS c FROM tf GROUP BY 1),
         |k AS (SELECT CAST(sum(c) AS BIGINT) AS tt FROM c),
         |u AS (SELECT doc_id, tf,
         |      CAST(len(bin(tt // c.c)) - 1 AS BIGINT) AS u
         |      FROM tf JOIN c USING (tok), k)
         |SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_tokens,
         |  CAST(sum(tf * u) AS BIGINT) AS surprisal_sum,
         |  CAST(max(u) AS BIGINT) AS surprisal_max
         |FROM u GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q_lm_bigram_surprisal" ->
      s"""WITH t0 AS (SELECT doc_id, $toks AS toks FROM documents),
         |bg0 AS (SELECT doc_id, unnest(list_transform(range(1, len(toks)),
         |          i -> toks[i] || ' ' || toks[i+1])) AS bg
         |        FROM t0 WHERE len(toks) >= 2),
         |tf AS (SELECT doc_id, bg, CAST(count(*) AS BIGINT) AS tf
         |       FROM bg0 GROUP BY 1, 2),
         |bgc AS (SELECT bg, CAST(sum(tf) AS BIGINT) AS c FROM tf GROUP BY 1),
         |ctx AS (SELECT split_part(bg, ' ', 1) AS w1,
         |        CAST(sum(c) AS BIGINT) AS cc FROM bgc GROUP BY 1),
         |u AS (SELECT doc_id, tf,
         |      CAST(len(bin(cc // c)) - 1 AS BIGINT) AS u
         |      FROM tf JOIN bgc USING (bg)
         |      JOIN ctx ON split_part(bg, ' ', 1) = ctx.w1)
         |SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_bigrams,
         |  CAST(sum(tf * u) AS BIGINT) AS surprisal_sum,
         |  CAST(max(u) AS BIGINT) AS surprisal_max
         |FROM u GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "text_cdc_chunks" ->
      s"""WITH t0 AS (SELECT doc_id, $toks AS t FROM documents),
         |t AS (SELECT doc_id, t FROM t0 WHERE len(t) > 0),
         |b AS (SELECT doc_id, t,
         |  list_filter(range(1, len(t)+1),
         |    i -> ('0x' || substr(md5(t[i]),1,8))::BIGINT % 8 = 0) AS bp
         |  FROM t),
         |c0 AS (SELECT doc_id,
         |  list_filter(list_transform(range(len(bp)+1), j ->
         |    CASE WHEN (CASE WHEN j = len(bp) THEN len(t) ELSE bp[j+1] END)
         |           >= (CASE WHEN j = 0 THEN 1 ELSE bp[j]+1 END)
         |      THEN array_to_string(list_slice(t,
         |        CASE WHEN j = 0 THEN 1 ELSE bp[j]+1 END,
         |        CASE WHEN j = len(bp) THEN len(t) ELSE bp[j+1] END), ' ')
         |      ELSE NULL END), x -> x IS NOT NULL) AS chunks
         |  FROM b),
         |ch AS (SELECT doc_id,
         |  CAST(unnest(range(1, len(chunks)+1)) AS BIGINT) AS cid,
         |  unnest(chunks) AS chunk FROM c0),
         |ch2 AS (SELECT doc_id, cid, md5(chunk) AS digest,
         |  CAST(len(chunk) AS BIGINT) AS clen FROM ch),
         |f1 AS (SELECT digest, min(doc_id) AS fd FROM ch2 GROUP BY 1),
         |f2 AS (SELECT ch2.digest AS digest, fd, min(cid) AS fc
         |  FROM ch2 JOIN f1 ON ch2.digest = f1.digest AND ch2.doc_id = f1.fd
         |  GROUP BY 1, 2)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chunks,
         |  CAST(sum(CASE WHEN doc_id = fd AND cid = fc THEN 1 ELSE 0 END)
         |       AS BIGINT) AS n_first,
         |  CAST(sum(CASE WHEN doc_id = fd AND cid = fc THEN 0 ELSE clen END)
         |       AS BIGINT) AS dup_chars
         |FROM ch2 JOIN f2 USING (digest)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // Replays the full bigram-surprisal pipeline, then per-language
    // tercile cutoffs via quantile_cont — the same continuous-quantile
    // definition Spark's `percentile` uses (q_quantile_bins precedent:
    // bucket membership compares an INTEGER score against the cutoff,
    // oracle-exact at both SFs).
    "q_ppl_buckets" ->
      s"""WITH t0 AS (SELECT doc_id, $toks AS toks FROM documents),
         |bg0 AS (SELECT doc_id, unnest(list_transform(range(1, len(toks)),
         |          i -> toks[i] || ' ' || toks[i+1])) AS bg
         |        FROM t0 WHERE len(toks) >= 2),
         |tf AS (SELECT doc_id, bg, CAST(count(*) AS BIGINT) AS tf
         |       FROM bg0 GROUP BY 1, 2),
         |bgc AS (SELECT bg, CAST(sum(tf) AS BIGINT) AS c FROM tf GROUP BY 1),
         |ctx AS (SELECT split_part(bg, ' ', 1) AS w1,
         |        CAST(sum(c) AS BIGINT) AS cc FROM bgc GROUP BY 1),
         |u AS (SELECT doc_id, tf,
         |      CAST(len(bin(cc // c)) - 1 AS BIGINT) AS u
         |      FROM tf JOIN bgc USING (bg)
         |      JOIN ctx ON split_part(bg, ' ', 1) = ctx.w1),
         |s AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_bigrams,
         |      CAST(sum(tf * u) AS BIGINT) AS surprisal_sum
         |      FROM u GROUP BY doc_id),
         |scored AS (SELECT s.doc_id, d.lang,
         |      CAST((surprisal_sum * 1000) // n_bigrams AS BIGINT) AS ppl_q
         |      FROM s JOIN documents d USING (doc_id)),
         |cuts AS (SELECT lang, quantile_cont(ppl_q, [1.0/3, 2.0/3]) AS thr
         |         FROM scored GROUP BY lang)
         |SELECT doc_id, lang, ppl_q,
         |  (['head','middle','tail'])[
         |    len(list_filter(thr, x -> CAST(ppl_q AS DOUBLE) > x)) + 1] AS bucket
         |FROM scored JOIN cuts USING (lang) ORDER BY doc_id""".stripMargin,

    "text_dup_spans" ->
      s"""WITH t AS (SELECT doc_id, $toks AS toks FROM documents),
         |base AS (SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS n_tokens
         |         FROM t),
         |wins AS (SELECT doc_id, CAST(i AS BIGINT) AS i,
         |  array_to_string(list_slice(toks, i, i+$DupSpanW-1), ' ') AS gram
         |  FROM (SELECT doc_id, toks,
         |          unnest(range(1, len(toks)-$DupSpanW+2)) AS i
         |        FROM base WHERE n_tokens >= $DupSpanW)),
         |f AS (SELECT doc_id, i,
         |  count(*) OVER (PARTITION BY gram) AS c,
         |  row_number() OVER (PARTITION BY gram ORDER BY doc_id, i) AS rn
         |  FROM wins),
         |rem AS (SELECT doc_id, i FROM f WHERE c > 1 AND rn > 1),
         |cut AS (SELECT DISTINCT doc_id, p FROM
         |  (SELECT doc_id, unnest(range(i, i+$DupSpanW)) AS p FROM rem)),
         |dw AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dup_windows
         |       FROM rem GROUP BY 1),
         |ct AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS cut_tokens
         |       FROM cut GROUP BY 1),
         |tokpos AS (SELECT doc_id, p, toks[p] AS tok
         |  FROM (SELECT doc_id, toks, unnest(range(1, len(toks)+1)) AS p
         |        FROM base)),
         |keep AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY p) AS clean_text
         |  FROM tokpos k
         |  WHERE NOT EXISTS (SELECT 1 FROM cut
         |                    WHERE cut.doc_id = k.doc_id AND cut.p = k.p)
         |  GROUP BY doc_id)
         |SELECT b.doc_id, b.n_tokens,
         |  CAST(greatest(b.n_tokens - $DupSpanW + 1, 0) AS BIGINT) AS n_windows,
         |  CAST(COALESCE(dw.dup_windows, 0) AS BIGINT) AS dup_windows,
         |  CAST(COALESCE(ct.cut_tokens, 0) AS BIGINT) AS cut_tokens,
         |  COALESCE(keep.clean_text, '') AS clean_text
         |FROM base b LEFT JOIN dw USING (doc_id) LEFT JOIN ct USING (doc_id)
         |  LEFT JOIN keep USING (doc_id)
         |ORDER BY doc_id""".stripMargin,

    "q_dsir_weights" ->
      s"""WITH t0 AS (SELECT doc_id, lang = 'en' AS tgt, $toks AS toks
         |            FROM documents),
         |t AS (SELECT doc_id, tgt, CASE WHEN len(toks) >= 2
         |        THEN list_transform(range(1, len(toks)),
         |             i -> toks[i] || ' ' || toks[i+1])
         |        ELSE [] END AS toks FROM t0),
         |tok AS (SELECT doc_id, tgt, unnest(toks) AS tok FROM t),
         |db AS (SELECT doc_id, tgt,
         |  ('0x' || substr(md5(tok),1,8))::BIGINT % $DsirBuckets AS b,
         |  CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY 1, 2, 3),
         |raw AS (SELECT b, CAST(sum(c) AS BIGINT) AS cr FROM db GROUP BY 1),
         |tg AS (SELECT b, CAST(sum(c) AS BIGINT) AS ct FROM db
         |       WHERE tgt GROUP BY 1),
         |tot AS (SELECT (SELECT CAST(sum(cr) AS BIGINT) FROM raw) AS tr,
         |               (SELECT CAST(sum(ct) AS BIGINT) FROM tg) AS tt),
         |tab AS (SELECT raw.b,
         |  CAST(len(bin((tr + $DsirBuckets)//(cr + 1))) - 1 AS BIGINT) AS ur,
         |  CAST(len(bin((tt + $DsirBuckets)//(COALESCE(ct, 0) + 1))) - 1
         |       AS BIGINT) AS ut
         |  FROM raw LEFT JOIN tg USING (b), tot)
         |SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
         |  CAST(sum(c * (ur - ut)) AS BIGINT) AS weight
         |FROM db JOIN tab USING (b) GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q_events_funnel" ->
      s"""WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS us
         |  FROM events WHERE event_type IN ('view','click','purchase')),
         |w0 AS (SELECT *, min(CASE WHEN event_type='view' THEN us END)
         |  OVER (PARTITION BY user_id ORDER BY us, event_id
         |        ROWS UNBOUNDED PRECEDING) AS q0 FROM e),
         |w1 AS (SELECT *, min(CASE WHEN event_type='click' AND q0 IS NOT NULL
         |                          AND us - q0 <= $FunnelWithinUs THEN us END)
         |  OVER (PARTITION BY user_id ORDER BY us, event_id
         |        ROWS UNBOUNDED PRECEDING) AS q1 FROM w0),
         |w2 AS (SELECT *, min(CASE WHEN event_type='purchase' AND q1 IS NOT NULL
         |                          AND us - q1 <= $FunnelWithinUs THEN us END)
         |  OVER (PARTITION BY user_id ORDER BY us, event_id
         |        ROWS UNBOUNDED PRECEDING) AS q2 FROM w1),
         |pu AS (SELECT user_id,
         |  max(CASE WHEN q0 IS NOT NULL THEN 1 ELSE 0 END) AS f0,
         |  max(CASE WHEN q1 IS NOT NULL THEN 1 ELSE 0 END) AS f1,
         |  max(CASE WHEN q2 IS NOT NULL THEN 1 ELSE 0 END) AS f2
         |  FROM w2 GROUP BY user_id)
         |SELECT stage, n_users FROM (
         |  SELECT '01_view' AS stage, CAST(sum(f0) AS BIGINT) AS n_users FROM pu
         |  UNION ALL
         |  SELECT '02_click', CAST(sum(f1) AS BIGINT) FROM pu
         |  UNION ALL
         |  SELECT '03_purchase', CAST(sum(f2) AS BIGINT) FROM pu)
         |ORDER BY stage""".stripMargin,

    "q_events_retention" ->
      s"""WITH su AS (SELECT user_id,
         |    CAST(floor(min(epoch_us(ts)) / $DayUs) AS BIGINT) AS cohort
         |  FROM events WHERE event_type = 'signup' GROUP BY user_id),
         |act AS (SELECT DISTINCT user_id,
         |    CAST(floor(epoch_us(ts) / $DayUs) AS BIGINT) AS bucket
         |  FROM events)
         |SELECT cohort, CAST(bucket - cohort AS BIGINT) AS offset_d,
         |  CAST(count(*) AS BIGINT) AS n_users
         |FROM su JOIN act USING (user_id)
         |WHERE bucket - cohort BETWEEN 0 AND 7
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  )
}
