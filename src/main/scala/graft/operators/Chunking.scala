package graft.operators

import graft.functions.{TextFunctions => TF}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Corpus chunking and segment-level dedup — the text-preparation steps
 * between document-level dedup and batch assembly in a training-data
 * pipeline.
 *
 * Both are built from codegen'd column functions (split / sequence /
 * slice / explode) with no UDFs: chunking is a pure narrow explode
 * (scan-speed at any corpus size); segment dedup adds exactly one
 * aggregation Exchange on a uniform content digest plus one digest
 * equi-join — never a pair space.
 */
object Chunking {

  /**
   * Sliding token-window chunking (context-window preparation /
   * retrieval chunking): document text → overlapping chunks of
   * `chunkSize` whitespace tokens starting every `stride` tokens.
   * Chunk i covers tokens [i*stride, i*stride+chunkSize); the last
   * chunk may be short; empty documents yield no chunks.
   *
   * Output: (id, chunk_id, n_tok, chunk) — one row per chunk.
   *
   * Scale: narrow (explode only, no shuffle); each input row expands
   * to ceil(nTokens/stride) rows, so output size is predictable and
   * the stage stays inside whole-stage codegen.
   */
  def chunk(df: DataFrame, id: String, text: String,
            chunkSize: Int, stride: Int): DataFrame = {
    require(chunkSize > 0 && stride > 0, "chunkSize and stride must be > 0")
    df.select(col(id), TF.tokens(col(text)).as("__toks"))
      .filter(size(col("__toks")) > 0)
      .select(col(id),
        explode(sequence(lit(0L),
          floor((size(col("__toks")) - 1) / stride).cast("long"))).as("chunk_id"),
        col("__toks"))
      .select(col(id), col("chunk_id"),
        slice(col("__toks"),
          (col("chunk_id") * stride + 1).cast("int"),
          lit(chunkSize)).as("__ctoks"))
      .select(col(id), col("chunk_id"),
        size(col("__ctoks")).cast("long").as("n_tok"),
        array_join(col("__ctoks"), " ").as("chunk"))
  }

  /**
   * Content-defined chunking + chunk-level dedup stats — the
   * LBFS/rsync storage-dedup shape at token granularity: a chunk
   * boundary falls AFTER every token whose md5 bucket ≡ 0 (mod
   * avgLen), so boundaries depend only on local content — insert a
   * paragraph and every following chunk of a fixed-size scheme shifts,
   * but CDC chunks realign immediately (only the edited chunk
   * changes). That is what makes chunk-hash dedup catch shared
   * content ACROSS revisions/mirrors where fixed chunking misses it.
   *
   * Per doc: chunks = token spans between boundary tokens (average
   * length avgLen); each distinct chunk's FIRST corpus occurrence (by
   * (id, chunk_idx) lexicographic min) is the one kept by a
   * storage-dedup layer. Output: (id, n_chunks, n_first, dup_chars) —
   * dup_chars = bytes this doc re-states (its non-first chunks).
   *
   * Scale shape: chunking is pure array algebra (filter/zip_with/
   * slice — no window, no per-doc sort, narrow explode); the dedup
   * pass groups by md5(chunk) digest — uniform keys, one
   * partial/final Exchange, wordcount-shaped (never the chunk TEXT as
   * the shuffle key).
   */
  def cdcChunks(df: DataFrame, id: String, text: String,
                avgLen: Int = 8): DataFrame = {
    val toks = df.select(col(id), TF.tokens(col(text)).as("t"))
      .filter(size(col("t")) > 0)
    val bp = filter(sequence(lit(1), size(col("t"))),
      i => Sampling.hashBucket(element_at(col("t"), i)) % avgLen === 0)
    val withBp = toks.withColumn("bp", bp)
    val starts = concat(array(lit(1)), transform(col("bp"), x => x + 1))
    val ends = concat(col("bp"), array(size(col("t"))))
    val chunks = filter(
      zip_with(starts, ends, (s, e) =>
        when(e >= s,
          array_join(slice(col("t"), s, e - s + 1), " "))),
      c => c.isNotNull)
    val ch = withBp.withColumn("chunks", chunks)
      .select(col(id), posexplode(col("chunks")).as(Seq("p", "chunk")))
      .select(col(id), (col("p") + 1).cast("long").as("cid"),
        md5(col("chunk").cast("binary")).as("digest"),
        length(col("chunk")).cast("long").as("clen"))
    val firsts = ch.groupBy(col("digest"))
      .agg(min(struct(col(id), col("cid"))).as("f"))
    ch.join(firsts, Seq("digest"))
      .withColumn("is_first",
        col("f").getField(id) === col(id) && col("f").getField("cid") === col("cid"))
      .groupBy(col(id))
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("is_first"), 1L).otherwise(0L)).as("n_first"),
        sum(when(!col("is_first"), col("clen")).otherwise(0L)).as("dup_chars"))
  }

  /**
   * Cross-document segment-level dedup (the C4-style "line dedup"
   * pass, with fixed `segLen`-token segments standing in for lines in
   * a corpus without line structure): every distinct segment is kept
   * exactly once corpus-wide — at its FIRST occurrence in (id,
   * seg_idx) order — and removed everywhere else; documents are then
   * reassembled from their surviving segments in order. Documents
   * left with no segments disappear.
   *
   * Output: (id, clean_text, n_seg_kept, n_seg_total).
   *
   * Scale: segments explode narrowly; the first-occurrence winner per
   * segment is ONE aggregation Exchange keyed by (md5 digest, text) —
   * the digest makes the key uniform (content hashing admits no hot
   * key) and the text makes dedup EXACT: two distinct segments
   * colliding in md5 each keep their own winner instead of one
   * silently absorbing the other (which would diverge from the
   * text-partitioned oracle). Partial aggregation collapses
   * per-partition repeats before the shuffle. The keeper check is one
   * (digest, text) equi-join, and reassembly is one per-document
   * aggregation whose state is bounded by the document's own segment
   * count. No step is quadratic in corpus size.
   */
  /**
   * Exact duplicate-span removal (the ExactSubstr dedup shape of Lee
   * et al., "Deduplicating Training Data Makes Language Models
   * Better", at token-window granularity): every `w`-token sliding
   * window whose text occurs more than once corpus-wide — across
   * documents OR repeated inside one — is a duplicated span. The
   * gram's FIRST occurrence in (id, position) order is kept; every
   * token position covered by any OTHER occurrence of a duplicated
   * gram is cut, and documents are reassembled from their surviving
   * tokens in order. Unlike [[segmentDedup]] (stride-partitioned
   * segments) the windows here overlap, so a duplicated span of any
   * length ≥ w is cut in full, not just at segment boundaries.
   *
   * Output: (id, n_tokens, n_windows, dup_windows, cut_tokens,
   * clean_text) — one row per input document (zero counts and
   * token-rejoined text when nothing is cut; empty text when
   * everything is).
   *
   * Scale: windows explode narrowly (one row per token position); the
   * per-gram occurrence count + first-occurrence winner is ONE
   * aggregation Exchange keyed by (md5 digest, gram) — digest for key
   * uniformity, gram text so md5 collisions stay exact (the
   * segmentDedup discipline). Boilerplate grams with huge occurrence
   * counts are handled in the aggregate (count + min — no per-gram
   * sort or window function anywhere), so hot grams cost partial-agg
   * merges, never a skewed sort. Everything position-level then folds
   * to ONE doc-keyed aggregation of removed-window starts (per-doc
   * state bounded by the doc's own window count); the cut-position
   * interval union, the cut itself, and reassembly are pure array
   * algebra on the token array the final doc-keyed join already
   * holds — the corpus token stream is never re-shuffled and never
   * regrouped.
   */
  def dupSpanRemove(df: DataFrame, id: String, text: String,
                    w: Int): DataFrame = {
    require(w > 0, "w must be > 0")
    val toks = df.select(col(id), TF.tokens(col(text)).as("__toks"))
      .withColumn("n_tokens", size(col("__toks")).cast("long"))
    // one row per window start i (1-based), gram = tokens [i, i+w)
    val wins = toks.filter(col("n_tokens") >= w)
      .select(col(id),
        explode(sequence(lit(1L), col("n_tokens") - (w - 1))).as("i"),
        col("__toks"))
      .select(col(id), col("i"),
        array_join(slice(col("__toks"), col("i").cast("int"), lit(w)), " ")
          .as("gram"))
      .withColumn("__digest", md5(col("gram").cast("binary")))
    val winners = wins.groupBy(col("__digest"), col("gram"))
      .agg(count(lit(1)).as("__c"),
        min(struct(col(id), col("i"))).as("__first"))
    val removed = wins.join(winners, Seq("__digest", "gram"))
      .filter(col("__c") > 1 &&
        !(col(id) === col("__first")(id) && col("i") === col("__first")("i")))
    // one doc-keyed fold: removed-window starts + their position-
    // interval union, both bounded by the document's own size
    val cutPerDoc = removed.groupBy(col(id))
      .agg(count(lit(1)).as("dup_windows"),
        array_distinct(flatten(collect_list(
          sequence(col("i"), col("i") + (w - 1))))).as("__cut"))
    toks.join(cutPerDoc, Seq(id), "left")
      .select(col(id), col("n_tokens"),
        greatest(col("n_tokens") - (w - 1), lit(0L)).as("n_windows"),
        coalesce(col("dup_windows"), lit(0L)).as("dup_windows"),
        coalesce(size(col("__cut")), lit(0)).cast("long").as("cut_tokens"),
        array_join(
          when(col("__cut").isNull, col("__toks")).otherwise(
            zip_with(col("__toks"),
              sequence(lit(1L), greatest(col("n_tokens"), lit(1L))),
              (t, p) => when(array_contains(col("__cut"), p), lit(null))
                .otherwise(t))), " ").as("clean_text"))
  }

  def segmentDedup(df: DataFrame, id: String, text: String,
                   segLen: Int): DataFrame = {
    require(segLen > 0, "segLen must be > 0")
    val segs = chunk(df, id, text, segLen, segLen)
      .withColumnRenamed("chunk_id", "seg_idx")
      .withColumnRenamed("chunk", "seg")
      .withColumn("__digest", md5(col("seg").cast("binary")))
    // first occurrence of each distinct segment: lexicographic min of
    // (id, seg_idx) — matches ORDER BY id, seg_idx in the oracle.
    val keeper = segs.groupBy(col("__digest"), col("seg"))
      .agg(min(struct(col(id), col("seg_idx"))).as("__keep"))
    val kept = segs.join(keeper, Seq("__digest", "seg"))
      .filter(col(id) === col("__keep")(id) &&
        col("seg_idx") === col("__keep")("seg_idx"))
    val totals = segs.groupBy(col(id))
      .agg(count(lit(1)).as("n_seg_total"))
    kept.groupBy(col(id))
      .agg(
        array_join(transform(
          array_sort(collect_list(struct(col("seg_idx"), col("seg")))),
          s => s("seg")), " ").as("clean_text"),
        count(lit(1)).as("n_seg_kept"))
      .join(totals, id)
      .select(col(id), col("clean_text"), col("n_seg_kept"), col("n_seg_total"))
  }
}
