package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Deduplication operators for training-data pipelines, each designed
 * for 100 TB: no driver-side materialization, candidate generation via
 * bucket joins (never all-pairs), partial aggregation everywhere.
 *
 *  - exact:        hash-groupBy on content digest
 *  - n-gram Jaccard: inverted shingle index + pair counting (exact)
 *  - MinHash+LSH:  codegen'd signature aggregation → banded bucket join →
 *                  exact-Jaccard verification of candidates only
 *  - SimHash:      64-bit sketch; block-pigeonhole bucket join +
 *                  hamming verification
 *  - embedding:    cosine near-dup pairs (see Similarity for ANN)
 */
object Dedup {

  import graft.functions.TextFunctions.tokens
  import graft.functions.MinhashFunctions.minhashSigF

  /** Distinct word k-shingles per document as ONE array row:
    * (id, sharr ARRAY<STRING>). Computed scan-side by the native
    * single-pass kernel ([[graft.functions.ShingleKernel]] — equality
    * with the tokenize→window→concat_ws→array_distinct Column
    * formulation asserted in PipelineSpec); the narrow form that lets
    * signatures and verification both run without exploding the corpus.
    * Documents with fewer than k tokens are dropped (a cheap byte-scan
    * token count — no regex — guards the projection). */
  def shingleArrays(df: DataFrame, id: String, text: String, k: Int = 3): DataFrame = {
    import graft.functions.ShingleFunctions.{shingleArrF, tokenCountF}
    df.filter(tokenCountF(col(text)) >= k)
      .select(col(id), shingleArrF(col(text), k).as("sharr"))
  }

  /** The Column-algebra formulation of [[shingleArrays]], kept as the
    * reference semantics for the kernel-equality spec. */
  private[graft] def shingleArraysColumns(df: DataFrame, id: String,
                                          text: String, k: Int): DataFrame = {
    val t = tokens(col(text))
    val sh = transform(sequence(lit(0), size(t) - k),
      i => concat_ws(" ", slice(t, i + 1, lit(k))))
    df.filter(size(t) >= k)
      .select(col(id), array_distinct(sh).as("sharr"))
  }

  /** Distinct word k-shingles per document: (id, shingle). The unit of
    * Jaccard similarity. Scales: one explode, no shuffle until the
    * consumer aggregates. */
  def shingles(df: DataFrame, id: String, text: String, k: Int = 3): DataFrame =
    shingleArrays(df, id, text, k)
      .select(col(id), explode(col("sharr")).as("shingle"))

  /** Exact dedup: keep the smallest id per identical content.
    * groupBy(md5) — partial agg, no skew (digests are uniform). */
  def exact(df: DataFrame, id: String, text: String): DataFrame =
    df.groupBy(md5(col(text).cast("binary")).as("digest"))
      .agg(min(col(id)).as(id), count(lit(1)).as("n_copies"))

  /**
   * Document-frequency cap: drop "stop-shingles" appearing in more than
   * maxDf documents. THE quadratic-bound for inverted-index joins: a
   * shingle with document frequency d contributes d(d-1)/2 co-occurrence
   * rows, so one hot shingle ("in the of") makes the self-join quadratic
   * in its df; capping bounds every shingle's contribution to
   * maxDf²/2. The hot set is tiny by construction (few shingles exceed
   * any sane cap) → broadcast anti-join, no extra shuffle of the big
   * side. Jaccard is then DEFINED over the capped shingle sets (sizes
   * and intersections both exclude dropped shingles — the standard
   * stop-word-removal semantics), and the DuckDB oracles mirror the cap.
   */
  def dfCapped(sh: DataFrame, maxDf: Int): DataFrame = {
    val hot = sh.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
      .filter(col("df") > maxDf).select("shingle")
    sh.join(broadcast(hot), Seq("shingle"), "left_anti")
  }

  /**
   * Exact n-gram Jaccard similarity join via inverted index:
   * explode shingles → df cap → self-join on shingle (co-occurrence
   * count c) → j = c / (|A|+|B|-c). Never materializes the n² pair
   * space — only pairs sharing ≥1 surviving shingle, grouped with
   * partial aggregation; [[dfCapped]] bounds the hot-shingle quadratic.
   * Output: (a, b, jaccard) with a < b, jaccard >= minJ.
   *
   * Cache lifetime: the raw shingle frame is persisted (it feeds the
   * df-cap, sizes, and the join); Spark's cache manager dedupes by
   * canonicalized plan, so repeated invocations over the same input
   * reuse one entry. Callers cycling many DIFFERENT corpora own
   * eviction (`spark.catalog.clearCache()`).
   */
  def ngramJaccardPairs(df: DataFrame, id: String, text: String,
                        k: Int = 3, minJ: Double = 0.5,
                        maxShingleDf: Int = 100): DataFrame = {
    val raw = shingles(df, id, text, k).persist()
    val sh = dfCapped(raw, maxShingleDf)
    val sizes = sh.groupBy(col(id)).agg(count(lit(1)).as("sz"))
    val a = sh.select(col(id).as("a"), col("shingle"))
    val b = sh.select(col(id).as("b"), col("shingle"))
    val co = a.join(b, Seq("shingle")).filter(col("a") < col("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("c"))
    co.join(sizes.withColumnRenamed(id, "a").withColumnRenamed("sz", "sa"), "a")
      .join(sizes.withColumnRenamed(id, "b").withColumnRenamed("sz", "sb"), "b")
      .withColumn("jaccard",
        col("c").cast("double") / (col("sa") + col("sb") - col("c")).cast("double"))
      .filter(col("jaccard") >= minJ)
      .select(col("a"), col("b"), col("jaccard"))
  }

  /**
   * Exact shingle CONTAINMENT join — the asymmetric sibling of
   * [[ngramJaccardPairs]]: C(A→B) = |A∩B| / |A|. Jaccard misses the
   * quote/excerpt/doc-in-doc shape (a 50-shingle doc embedded verbatim
   * in a 5000-shingle doc has j ≈ 0.01 but containment 1.0); corpus
   * curation wants exactly these pairs — boilerplate wrappers around a
   * shared core, chunks re-posted inside aggregator pages.
   *
   * Same inverted-index plan as Jaccard (explode → df cap → shingle
   * self-join → co-occurrence count), so the same scale discipline
   * holds: never the n² pair space, [[dfCapped]] bounds the
   * hot-shingle quadratic, partial aggregation on the pair counts. The
   * only deltas: pairs keep BOTH orientations (a≠b instead of a<b —
   * containment of a in b and of b in a are different facts), and the
   * denominator is |A| alone. The threshold compares c/|A| — both
   * engines divide the same exact integers, one correctly-rounded
   * double op (the [[ngramJaccardPairs]] precedent).
   *
   * Output: (a, b, containment) where containment = |A∩B|/|A| >= minC,
   * a ≠ b — "a is (at least minC) contained in b".
   */
  def containmentPairs(df: DataFrame, id: String, text: String,
                       k: Int = 3, minC: Double = 0.6,
                       maxShingleDf: Int = 100): DataFrame = {
    val raw = shingles(df, id, text, k).persist()
    val sh = dfCapped(raw, maxShingleDf)
    val sizes = sh.groupBy(col(id)).agg(count(lit(1)).as("sz"))
    val a = sh.select(col(id).as("a"), col("shingle"))
    val b = sh.select(col(id).as("b"), col("shingle"))
    val co = a.join(b, Seq("shingle")).filter(col("a") =!= col("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("c"))
    co.join(sizes.withColumnRenamed(id, "a").withColumnRenamed("sz", "sa"), "a")
      .withColumn("containment",
        col("c").cast("double") / col("sa").cast("double"))
      .filter(col("containment") >= minC)
      .select(col("a"), col("b"), col("containment"))
  }

  /**
   * MinHash signatures: (id, sig ARRAY<LONG>[numPerms]).
   * "Permutation" i = xxhash64 seeded with i (a well-mixed 64-bit hash
   * per permutation — unlike a restricted-domain affine family, which
   * is nearly monotonic and destroys min-wise independence).
   *
   * All numPerms minima are computed by ONE codegen'd kernel over the
   * per-document shingle array ([[graft.functions.MinHashSignature]]) —
   * scan-side, zero shuffle, bit-identical to the round-3/4 aggregate
   * formulation `min(xxhash64(i, shingle))` × numPerms (equality
   * asserted in PipelineSpec).
   */
  def minhashSignatures(df: DataFrame, id: String, text: String,
                        k: Int = 3, numPerms: Int = 64): DataFrame =
    shingleArrays(df, id, text, k)
      .select(col(id), minhashSigF(col("sharr"), numPerms).as("sig"))

  /** The round-3/4 aggregate formulation of [[minhashSignatures]],
    * kept as the reference semantics for the kernel-equality spec. */
  private[graft] def minhashSignaturesAgg(sh: DataFrame, id: String,
                                          numPerms: Int): DataFrame = {
    val aggs = (0 until numPerms).map(i =>
      min(xxhash64(lit(i), col("shingle"))).as(s"m$i"))
    sh.groupBy(col(id)).agg(aggs.head, aggs.tail: _*)
      .select(col(id),
        array((0 until numPerms).map(i => col(s"m$i")): _*).as("sig"))
  }

  /**
   * LSH banding: signature → (band, bucket) keys; docs sharing a bucket
   * in ANY band become candidate pairs; candidates are verified with
   * EXACT Jaccard (via [[ngramJaccardPairs]] machinery) so the output
   * contains no false positives. bandRows=2 with 32 bands catches
   * j≥0.5 pairs with P(miss) ≈ (1-j²)^32 ≤ 1e-4.
   * Output: (a, b, jaccard) — verified pairs, j >= minJ.
   */
  def minhashDupPairs(df: DataFrame, id: String, text: String,
                      k: Int = 3, numPerms: Int = 64, bandRows: Int = 2,
                      minJ: Double = 0.5, maxShingleDf: Int = 100): DataFrame = {
    // One tokenize+shingle scan (persisted as per-doc ARRAYS — far
    // smaller than the exploded frame) feeds the df count, the
    // streaming capped→signature pass, and the candidate-doc lookup.
    // The corpus-wide CAPPED frame is never materialized: signatures
    // consume it in one streaming pass, and verification re-derives
    // capped arrays for CANDIDATE docs only (candidate ids pushed into
    // the scan — the same shape as the MinhashIndex probe; the old
    // eager corpus-wide checkpoint of 10⁶+ string arrays was the
    // single most expensive step of the pipeline at 10× bench scale).
    // The df cap applies to BOTH signatures and verification.
    val docs = shingleArrays(df, id, text, k).persist()
    // the hot set is tiny by construction; the LAZY checkpoint
    // materializes inside the candidates job below and is reused by
    // the verification chain without re-running the df aggregate.
    // Lazy is race-free here: the two consumers (the candidates
    // collect, then candCapped's eager checkpoint) are sequential
    // driver-side actions, so the first one materializes the blocks.
    val hot1 = docs.select(explode(col("sharr")).as("shingle"))
      .groupBy(col("shingle")).agg(count(lit(1)).as("df"))
      .filter(col("df") > maxShingleDf)
      .agg(collect_list(col("shingle")).as("hotarr"))
      .localCheckpoint(eager = false)
    def cappedOf(d: DataFrame): DataFrame = d.crossJoin(broadcast(hot1))
      .select(col(id), array_except(col("sharr"), col("hotarr")).as("sharr"))
      .filter(size(col("sharr")) > 0)
    val sigs = cappedOf(docs)
      .select(col(id), minhashSigF(col("sharr"), numPerms).as("sig"))
    val banded = lshBands(sigs, id, numPerms / bandRows, bandRows)
    val l = banded.select(col(id).as("a"), col("band"), col("bucket"))
    val r = banded.select(col(id).as("b"), col("band"), col("bucket"))
    val candidates = l.join(r, Seq("band", "bucket"))
      .filter(col("a") < col("b"))
      .select("a", "b").distinct()
      .localCheckpoint(eager = false)
    // materialize the (batch-scale) pair set; its ids push into the
    // candidate-doc scan as an `In` filter, with a broadcast semi-join
    // fallback for abnormally large candidate sets
    val firstN = candidates.limit(MaxPushdownCandidates + 1).collect()
    val candDocs =
      if (firstN.length <= MaxPushdownCandidates) {
        val ids = firstN.iterator
          .flatMap(r2 => Iterator(r2.get(0), r2.get(1))).toSet.toSeq
        docs.filter(col(id).isInCollection(ids))
      } else {
        val candIds = candidates.select(col("a").as(id))
          .unionByName(candidates.select(col("b").as(id))).distinct()
        docs.join(broadcast(candIds), Seq(id), "left_semi")
      }
    // EAGER candidate-sized checkpoint, taken while the docs cache is
    // still warm: verification reads it once per pair side (two
    // concurrent stages — a lazy checkpoint would race and rebuild),
    // and blocks are GC-cleaned when the result is dropped
    val candCapped = cappedOf(candDocs).localCheckpoint()
    // candidates and candCapped are materialized — release the
    // corpus-scale array cache instead of pinning it all session
    docs.unpersist()
    verifyJaccardArrays(candCapped, id, candidates, minJ)
  }

  /** Largest candidate-pair set whose doc ids are collected and pushed
    * into the shingle scan as an `In` filter (see the identical
    * constant in [[MinhashIndex]]). */
  private val MaxPushdownCandidates = 10000

  /**
   * [[dfCapped]] for the array pipeline: the hot-shingle set (tiny by
   * construction, see [[dfCapped]]) is aggregated into ONE array row
   * and broadcast onto every document with a single-row cross join —
   * `array_except` then removes hot shingles scan-side, so the corpus
   * arrays are never exploded again after the df count. Documents whose
   * every shingle is hot drop out (matching the exploded formulation,
   * where they simply have no surviving rows).
   */
  private[graft] def dfCappedArrays(docs: DataFrame, id: String,
                                        maxDf: Int): DataFrame = {
    val hot1 = docs.select(explode(col("sharr")).as("shingle"))
      .groupBy(col("shingle")).agg(count(lit(1)).as("df"))
      .filter(col("df") > maxDf)
      .agg(collect_list(col("shingle")).as("hotarr"))
    docs.crossJoin(broadcast(hot1))
      .select(col(id), array_except(col("sharr"), col("hotarr")).as("sharr"))
      .filter(size(col("sharr")) > 0)
  }

  /** Exact-Jaccard verification of a candidate (a, b) pair frame over
    * per-document CAPPED shingle arrays (no re-aggregation — the sets
    * are already rows; per-document sized, no n² blowup). Output:
    * (a, b, jaccard) with jaccard >= minJ. */
  private[graft] def verifyJaccardArrays(docs: DataFrame, id: String,
                                             candidates: DataFrame,
                                             minJ: Double): DataFrame = {
    val setsA = docs.select(col(id).as("a"), col("sharr").as("sha"),
      size(col("sharr")).as("sa"))
    val setsB = docs.select(col(id).as("b"), col("sharr").as("shb"),
      size(col("sharr")).as("sb"))
    candidates.join(setsA, "a").join(setsB, "b")
      .withColumn("c", size(array_intersect(col("sha"), col("shb"))))
      .withColumn("jaccard",
        col("c").cast("double") / (col("sa") + col("sb") - col("c")).cast("double"))
      .filter(col("jaccard") >= minJ)
      .select(col("a"), col("b"), col("jaccard"))
  }

  /** Signature → (id, band, bucket) LSH keys. */
  private[graft] def lshBands(sigs: DataFrame, id: String,
                                  nBands: Int, bandRows: Int): DataFrame =
    sigs.select(col(id), posexplode(
      transform(sequence(lit(0), lit(nBands - 1)),
        b => hash(slice(col("sig"), b * bandRows + lit(1), lit(bandRows)), b))))
      .toDF(id, "band", "bucket")

  /**
   * INCREMENTAL minhash dedup — the continuous-ingest shape: dedup a
   * new batch against the existing corpus (and within itself) without
   * re-pairing the corpus against itself. The LSH index is probed
   * one-sided: candidate pairs must touch at least one batch document,
   * so per-ingest work scales with |batch| × bucket occupancy, not
   * |corpus|². Old-old pairs are by construction already handled by
   * previous ingests.
   *
   * At 100 TB the corpus-side shingles/signatures are read from a
   * persisted index rather than recomputed — that form is
   * [[minhashIncrementalFromIndex]] / [[MinhashIndex]], which probes a
   * maintained (band,bucket)-bucketed LSH table and returns the
   * identical pair set (equality asserted in IndexSpec). This
   * self-contained form recomputes them so the operator needs no
   * prior state and is directly oracle-checkable. The df cap is
   * computed over existing ∪ batch (matching what the maintained
   * index converges to after [[MinhashIndex.appendToIndex]]).
   *
   * Output: (a, b, jaccard), a < b, j >= minJ, where a or b is a batch
   * document — exactly the full pair set minus old-old pairs.
   */
  def minhashIncremental(existing: DataFrame, batch: DataFrame,
                         id: String, text: String,
                         k: Int = 3, numPerms: Int = 64, bandRows: Int = 2,
                         minJ: Double = 0.5, maxShingleDf: Int = 100): DataFrame = {
    val corpus = existing.select(col(id), col(text))
      .unionByName(batch.select(col(id), col(text)))
    val docs = shingleArrays(corpus, id, text, k).persist()
    val capped = dfCappedArrays(docs, id, maxShingleDf).localCheckpoint()
    docs.unpersist() // checkpoint materialized — last reader of the raw arrays
    val sigs = capped.select(col(id), minhashSigF(col("sharr"), numPerms).as("sig"))
    val banded = lshBands(sigs, id, numPerms / bandRows, bandRows)
    // probe side: ONLY batch documents — the incremental restriction
    val bandedNew = banded.join(batch.select(col(id)), Seq(id), "left_semi")
    val l = banded.select(col(id).as("a"), col("band"), col("bucket"))
    val r = bandedNew.select(col(id).as("b"), col("band"), col("bucket"))
    val candidates = l.join(r, Seq("band", "bucket"))
      .filter(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("a"),
        greatest(col("a"), col("b")).as("b"))
      .distinct()
    verifyJaccardArrays(capped, id, candidates, minJ)
  }

  /**
   * [[minhashIncremental]] against a PERSISTED index — the steady-state
   * continuous-ingest form: per-ingest compute is proportional to the
   * batch (plus the usually-empty set of corpus docs whose df cap
   * changed), and the corpus TEXT is never read — only the index's
   * shingle/df/band tables and the batch. Returns exactly the pair set
   * [[minhashIncremental]](indexedCorpus, batch) would. See
   * [[MinhashIndex]] for the index layout and maintenance.
   */
  def minhashIncrementalFromIndex(spark: org.apache.spark.sql.SparkSession,
                                  indexDir: String, batch: DataFrame,
                                  id: String, text: String,
                                  cfg: MinhashIndex.Config = MinhashIndex.Config()): DataFrame =
    MinhashIndex.incrementalDupPairs(spark, indexDir, batch, id, text, cfg)

  /**
   * Contamination REPORT: [[contaminated]] rolled up per corpus
   * segment (source / domain / shard) — the view a dataset owner
   * actually acts on ("which source leaked the benchmark"). The
   * contaminated-doc set is tiny relative to the corpus (that is the
   * premise of decontamination), so it broadcasts back onto the corpus
   * for the group label; the corpus is scanned once more, never
   * shuffled. Output: (group, n_docs_contaminated, n_shared_total).
   */
  def contaminationReport(corpus: DataFrame, probes: DataFrame,
                          id: String, text: String, groupCol: String,
                          k: Int = 8): DataFrame = {
    val hits = contaminated(corpus, probes, id, text, k)
    corpus.select(col(id), col(groupCol))
      .join(broadcast(hits), Seq(id))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs_contaminated"),
        sum(col("n_shared")).as("n_shared_total"))
  }

  /**
   * Per-document DUPLICATED-SHINGLE statistics — the n-gram-level
   * duplication signal (the RefinedWeb/Gopher "fraction of duplicated
   * n-grams" quality feature): for each doc, how many of its distinct
   * k-shingles occur in at least one OTHER document. Unlike the pair
   * operators this never forms a pair space at all — one
   * (shingle → df) wordcount aggregate re-joined onto the shingle
   * stream, both with partial aggregation; shuffle volume is
   * corpus-shingle-sized (like a wordcount), not pair-sized, at any
   * corpus size. Output: (id, n_shingles, n_dup, dup_frac); docs with
   * fewer than k tokens are absent (they have no shingles).
   */
  def dupShingleStats(df: DataFrame, id: String, text: String,
                      k: Int = 5): DataFrame = {
    // Lazy localCheckpoint, not persist: the frame is read twice (df
    // aggregate + join probe side) but a persist here would pin a
    // cache generation per call with no release point (the result is
    // returned lazily); checkpoint blocks are GC-cleaned when the
    // result is dropped, and laziness keeps construction free of
    // blocking jobs. If the two consumers race the first
    // materialization the explode scan runs at most twice — cheaper
    // than a leaked cache generation per call.
    val sh = shingles(df, id, text, k).localCheckpoint(eager = false)
    val dfTab = sh.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
    sh.join(dfTab, Seq("shingle"))
      .groupBy(col(id))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("df") >= 2, 1L).otherwise(0L)).as("n_dup"))
      .withColumn("dup_frac",
        col("n_dup").cast("double") / col("n_shingles").cast("double"))
  }

  /**
   * Benchmark DECONTAMINATION — the asymmetric sibling of near-dup
   * detection: find corpus documents sharing at least one k-token
   * shingle with a probe (benchmark / eval) set, so evaluation data
   * can be scrubbed from training corpora. Probe sets are tiny
   * relative to the corpus → their distinct shingle set BROADCASTS;
   * the corpus side is one narrow explode + broadcast join + one
   * partial/final count — no corpus-side shuffle of text, no pair
   * space at all. Output: (id, n_shared) per contaminated corpus doc.
   */
  def contaminated(corpus: DataFrame, probes: DataFrame,
                   id: String, text: String, k: Int = 8): DataFrame = {
    val c = shingles(corpus, id, text, k)
    val p = shingles(probes, id, text, k).select(col("shingle")).distinct()
    c.join(broadcast(p), Seq("shingle"))
      .groupBy(col(id)).agg(count(lit(1)).as("n_shared"))
  }

  /**
   * [[contaminated]] with a Bloom pre-filter in front of the verify
   * join — the form that holds up when the probe/eval suite is too big
   * to broadcast as raw shingle STRINGS (a modern eval stack is
   * hundreds of benchmarks; k-token shingle text can run to GBs where
   * the Bloom over the same set is a few MB at fpp=0.01). The sketch
   * is built over `xxhash64(shingle)` (a treeAggregate — never a
   * driver-side collect of the shingle set), planted as a codegen'd
   * `might_contain` ON THE SCAN SIDE of the corpus explode, so
   * non-matching shingles — the overwhelming majority — die before
   * any join machinery. Exactness contract (the [[BloomJoin]]
   * discipline): Bloom + hash collisions only OVER-keep; the exact
   * string-equality verify join removes every over-kept row, so output
   * == [[contaminated]] row for row (same oracle).
   */
  def contaminatedBloom(corpus: DataFrame, probes: DataFrame,
                        id: String, text: String, k: Int = 8,
                        fpp: Double = 0.01): DataFrame = {
    val c = shingles(corpus, id, text, k)
    val p = shingles(probes, id, text, k).select(col("shingle")).distinct()
      .persist()
    val expected = math.max(p.count(), 1L)
    val filt = BloomJoin.buildFilter(
      p.select(xxhash64(col("shingle")).as("h")), "h", expected, fpp)
    val pre = c.filter(BloomJoin.mightContain(filt, xxhash64(col("shingle"))))
    val out = pre.join(broadcast(p), Seq("shingle"))
      .groupBy(col(id)).agg(count(lit(1)).as("n_shared"))
    out
  }

  /**
   * Connected components over an undirected duplicate-pair edge list —
   * the step that turns pairwise dups into dedup CLUSTERS (keep
   * min-id doc per component, drop the rest). Min-label propagation:
   * each iteration every vertex takes the min label among itself and
   * its neighbors; converges to the component-minimum id in
   * O(component diameter) iterations (dup clusters are shallow).
   *
   * Scale notes: each iteration is one join + one partial/final min
   * aggregate — all distributed; the driver loop touches only a
   * convergence flag. localCheckpoint truncates lineage so plans don't
   * grow with iterations. For adversarial graphs (long chains) swap in
   * alternating large-star/small-star; dup clusters don't need it.
   *
   * Output: (doc_id, component) for every vertex in the edge list,
   * component = min doc id of its component.
   */
  def connectedComponents(pairs: DataFrame, a: String = "a", b: String = "b",
                          maxIter: Int = 30): DataFrame = {
    val edges = pairs.select(col(a).as("src"), col(b).as("dst"))
      .union(pairs.select(col(b).as("src"), col(a).as("dst")))
      .distinct().persist()
    var labels = edges.select(col("src").as("v")).distinct()
      .withColumn("label", col("v"))
      .localCheckpoint()
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val neighborLabels = edges.join(labels, edges("dst") === labels("v"))
        .select(col("src").as("v"), col("label"))
      val next = labels.union(neighborLabels)
        .groupBy("v").agg(min("label").as("label"))
        .localCheckpoint()
      val changed = next.join(labels.withColumnRenamed("label", "prev"), "v")
        .filter(col("label") =!= col("prev")).limit(1).count()
      labels = next
      converged = changed == 0
      i += 1
    }
    edges.unpersist()
    // An unconverged cutoff would silently return WRONG labels (a
    // chain longer than maxIter keeps stale minima) — fail loudly and
    // point at the O(log n)-round variant instead.
    require(converged,
      s"connectedComponents did not converge in $maxIter iterations " +
        "(graph diameter too large) — use connectedComponentsStar")
    labels.select(col("v").as("doc_id"), col("label").as("component"))
  }

  /**
   * Alternating large-star / small-star connected components — the
   * deep-graph variant: O(log n) ROUNDS on any shape (a million-node
   * chain converges in ~20 rounds where min-label propagation needs a
   * million), per Kiveris et al., "Connected Components in MapReduce
   * and Beyond" (SoCC'14). Each round is two window-min passes over
   * the edge list; fixpoint when the edge multiset stops changing
   * (count + order-independent hash). Per-round skew: a high-degree
   * vertex's neighborhood is one window partition — the algorithm's
   * own contraction shrinks those stars within a few rounds, which is
   * exactly its advantage over propagation. Same output contract as
   * [[connectedComponents]].
   */
  def connectedComponentsStar(pairs: DataFrame, a: String = "a",
                              b: String = "b", maxIter: Int = 50): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // one star operation: per symmetrized neighborhood N(u),
    // m = min(N(u) ∪ {u}); large emits (v, m) for v ∈ N(u), v > u;
    // small emits (v, m) for v ∈ N≤(u) ∪ {u}
    def star(edges: DataFrame, large: Boolean): DataFrame = {
      val sym = edges
        .union(edges.select(col("v").as("u"), col("u").as("v")))
      val w = Window.partitionBy("u")
      val withM = sym.withColumn("m", least(min(col("v")).over(w), col("u")))
      val out =
        if (large)
          withM.filter(col("v") > col("u"))
            .select(col("v").as("u"), col("m").as("v"))
        else
          withM.filter(col("v") <= col("u"))
            .select(col("v").as("u"), col("m").as("v"))
            .union(withM.select(col("u"), col("m").as("v")))
      out.filter(col("u") =!= col("v")).distinct()
    }
    // order-independent modular hash sum (mod keeps ANSI long addition
    // overflow-free up to ~9e9 edges); checksum equality is confirmed
    // with an exact set compare, so a collision can never end the loop
    // early — it only costs one extra except()
    def checksum(d: DataFrame): (Long, Long) = {
      val r = d.agg(count(lit(1)),
        sum(pmod(xxhash64(col("u"), col("v")), lit(1000000007L)))).collect()(0)
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }
    var e = pairs.select(col(a).as("u"), col(b).as("v"))
      .filter(col("u") =!= col("v")).distinct().localCheckpoint()
    var cs = checksum(e)
    var done = e.isEmpty
    var i = 0
    while (!done && i < maxIter) {
      val next = star(star(e, large = true), large = false).localCheckpoint()
      val ncs = checksum(next)
      // sets of equal size with one empty difference are equal
      done = ncs == cs && next.exceptAll(e).isEmpty
      e = next; cs = ncs
      i += 1
    }
    require(done, s"connectedComponentsStar did not converge in $maxIter rounds")
    val verts = pairs.select(col(a).as("doc_id"))
      .union(pairs.select(col(b).as("doc_id"))).distinct()
    val parents = e.groupBy(col("u").as("doc_id"))
      .agg(min(col("v")).as("component"))
    verts.join(parents, Seq("doc_id"), "left")
      .withColumn("component", coalesce(col("component"), col("doc_id")))
  }

  /**
   * The keep-set after clustering: drop every document that belongs to
   * a duplicate cluster but is not its canonical (min-id) member — the
   * step that turns pair detection into an actual deduplicated corpus.
   * One anti-join against the (small) non-canonical member set; the
   * corpus side streams through unshuffled when the drop side
   * broadcasts.
   */
  def keepCanonical(df: DataFrame, id: String, pairs: DataFrame): DataFrame = {
    val drop = connectedComponents(pairs)
      .filter(col("doc_id") =!= col("component"))
      .select(col("doc_id").as(id))
    df.join(drop, Seq(id), "left_anti")
  }

  /**
   * 64-bit SimHash over whitespace tokens: per-token 64 hash bits; each
   * bit votes ±1; sign of the vote sum is the sketch bit. Pure column
   * algebra (explode + groupBy + bit ops) — scales like a wordcount.
   *
   * Hash bits come from the token's md5 (bit b = bit (b mod 4) of hex
   * nibble b/4) rather than xxhash64: equally uniform, but replicable
   * in any engine — which is what lets dedup_simhash carry a real
   * DuckDB oracle instead of a rows-only check. The md5 is computed
   * once per token; nibbles are projected columns so the 64 bit
   * extractions are cheap integer ops inside one codegen stage.
   */
  def simhash(df: DataFrame, id: String, text: String): DataFrame = {
    val tok = df.select(col(id), explode(tokens(col(text))).as("tok"))
      .withColumn("m", md5(col("tok").cast("binary")))
    val nibs = (0 until 16).map(p =>
      conv(substring(col("m"), p + 1, 1), 16, 10).cast("int").as(s"nib$p"))
    val withNibs = tok.select(col(id) +: nibs: _*)
    val votes = (0 until 64).map { b =>
      val bit = shiftright(col(s"nib${b / 4}"), b % 4).bitwiseAND(lit(1))
      sum(when(bit === 1, 1).otherwise(-1)).as(s"v$b")
    }
    val voted = withNibs.groupBy(col(id)).agg(votes.head, votes.tail: _*)
    val sig = (0 until 64).map { b =>
      when(col(s"v$b") > 0, shiftleft(lit(1L), b)).otherwise(lit(0L))
    }.reduce(_.bitwiseOR(_))
    voted.select(col(id), sig.as("simhash"))
  }

  /** Hamming distance between two 64-bit sketches. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /**
   * SimHash near-dup pairs with hamming <= maxDist (< 16): pigeonhole
   * on 4 16-bit blocks — pairs within distance 3 share at least one
   * exact block → bucket join per block, then verify. No n² scan.
   */
  def simhashDupPairs(df: DataFrame, id: String, text: String,
                      maxDist: Int = 3): DataFrame = {
    val s = simhash(df, id, text).persist()
    val blocks = s.select(col(id), col("simhash"), posexplode(array(
      (0 until 4).map(i =>
        shiftright(col("simhash"), i * 16).bitwiseAND(lit(0xFFFFL))): _*)))
      .toDF(id, "simhash", "block", "bval")
    val l = blocks.select(col(id).as("a"), col("simhash").as("sa"), col("block"), col("bval"))
    val r = blocks.select(col(id).as("b"), col("simhash").as("sb"), col("block"), col("bval"))
    l.join(r, Seq("block", "bval")).filter(col("a") < col("b"))
      .select(col("a"), col("b"), hamming(col("sa"), col("sb")).as("dist"))
      .distinct()
      .filter(col("dist") <= maxDist)
  }
}
