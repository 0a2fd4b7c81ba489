package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * String-similarity (edit-distance) joins — fuzzy entity matching:
 * all pairs with levenshtein(s_a, s_b) <= k, exactly, as a self-join
 * ([[editDistancePairs]]) or probe-against-corpus bipartite join
 * ([[editDistanceJoin]] — the near-exact-match decontamination /
 * entity-linking shape).
 *
 * The naive shape is the n² cross join; the scalable-exact design is
 * q-gram PREFIX FILTERING (the AllPairs/Ed-Join family): k edits can
 * destroy at most k·q of a string's distinct q-grams, so two strings
 * within edit distance k share at least max(|G_a|,|G_b|) − k·q distinct
 * grams. Order every string's gram set by one GLOBAL rarity order
 * (ascending document frequency over all participating strings, gram
 * as tie-break) and keep only each string's first k·q + 1 grams — its
 * "prefix". The classic prefix lemma (sets ordered consistently with
 * overlap ≥ t intersect within their first |G|−t+1 elements) then
 * guarantees every qualifying pair shares a PREFIX gram, so the
 * inverted-index join over prefixes alone is a complete candidate
 * generator. Rarity order is what makes it scale: ubiquitous grams
 * (shared boilerplate, common prefixes) sort last and never enter a
 * prefix, so candidate volume is driven by rare grams — df²/2 blowup
 * on hot grams never happens by construction, no df cap needed, and
 * exactness is preserved (the cap-free analogue of [[Dedup.dfCapped]]'s
 * bound).
 *
 * Completeness holds whenever max(|G_a|,|G_b|) > k·q. Pairs of SHORT
 * strings (both with ≤ k·q distinct grams, i.e. length ≤ k·q + q − 1;
 * includes length < q with zero grams) can lose their entire gram set
 * to edits, so shorts pair among themselves through a length-band
 * equi-join instead (|len_a − len_b| ≤ k is necessary for distance k;
 * the band is realized as an explode of 2k+1 length keys — no BNLJ).
 * Short×long pairs need no special path: the short side's "prefix" is
 * its whole gram set, which the lemma covers.
 *
 * Verification is exact and runs INLINE on the candidate stream:
 * strings ride through the prefix join (short by assumption — names /
 * titles / keys, not documents) and `levenshtein(s_a, s_b, k)` ≥ 0
 * filters each candidate inside the join stage — the thresholded form
 * is the banded O(k·n) DP, not the full O(n²) matrix. The candidate
 * expansion (Σ over prefix grams of df², super-linear on adversarially
 * low-entropy keys like sequential IDs) is therefore pure compute and
 * is never shuffled; only surviving pairs reach the final distinct.
 *
 * Scale profile: one gram-df wordcount, one gram join for rarity, one
 * per-string window (k·q+1 rows kept per string), one prefix join with
 * inline verify, and a survivor-sized distinct — all shuffles linear
 * in input + output; the pair space is never materialized or moved.
 */
object StringJoin {

  /** Distinct q-grams of `s` (empty array when length(s) < q — NOT
    * sequence(1,0), which Spark renders as the DESCENDING [1,0]). */
  private[graft] def gramSet(s: Column, q: Int): Column =
    when(length(s) >= q,
      array_distinct(transform(sequence(lit(1), length(s) - q + 1),
        i => s.substr(i, lit(q)))))
      .otherwise(array().cast("array<string>"))

  /**
   * Shared core over a side-tagged union of strings: emit (side1, id1,
   * side2, id2, dist) for every pair admitted by `pairPred` (a
   * predicate over columns side1/id1/side2/id2) within distance k.
   * One rarity order over ALL participating strings keeps the prefix
   * lemma valid for whichever side-pairs the predicate admits.
   */
  private def pairsCore(tagged: DataFrame, k: Int, q: Int,
                        pairPred: Column): DataFrame = {
    val base = tagged.select(col("side"), col("id"), col("s"))
      .filter(col("s").isNotNull)
    val grams = base.select(col("side"), col("id"), col("s"),
      explode(gramSet(col("s"), q)).as("gram"))
    // global rarity order: ascending df, gram as total-order tie-break
    val gramDf = grams.groupBy("gram").agg(count(lit(1)).as("df"))
    val prefixLen = k * q + 1
    val w = Window.partitionBy("side", "id").orderBy(col("df"), col("gram"))
    // the string rides along (entity strings are short by assumption —
    // this join is for names/titles/keys, not documents): verification
    // can then run INLINE on the candidate stream, which is the scale
    // decision that matters below
    // persisted: both sides of the self-join (and the short fallback's
    // base) reuse one computation of the df-join + window; Spark's
    // cache manager dedupes by canonicalized plan (the
    // ngramJaccardPairs stance — callers cycling corpora own eviction)
    val prefix = grams.join(gramDf, "gram")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= prefixLen)
      .select("side", "id", "s", "gram")
      .persist()
    def sided(n: Int) = prefix.select(col("side").as(s"side$n"),
      col("id").as(s"id$n"), col("s").as(s"s$n"), col("gram"))
    // Verify BEFORE deduplicating: the thresholded levenshtein (banded
    // O(k·n) DP) is pure compute inside the join stage, so the
    // candidate expansion — Σ over prefix grams of df² pairs, the one
    // super-linear term of the algorithm, adversarially large when keys
    // are low-entropy (sequential IDs, shared templates) — is never
    // shuffled anywhere. Only SURVIVING pairs (≤ prefixLen duplicates
    // each) reach the distinct. The alternative (distinct the raw pair
    // ids, then fetch strings by two joins) moves the full candidate
    // volume through three exchanges; this shape moves it through zero.
    val cand = sided(1).join(sided(2), Seq("gram"))
      .filter(pairPred &&
        abs(length(col("s1")) - length(col("s2"))) <= k)
      .withColumn("dist", levenshtein(col("s1"), col("s2"), k))
      .filter(col("dist") >= 0)
      .select("side1", "id1", "side2", "id2", "dist")
    // short×short fallback: both gram sets can be wholly destroyed by
    // k edits, so the prefix lemma is vacuous — length-band pair them
    // (|len_a − len_b| ≤ k as an explode of 2k+1 length keys — no BNLJ).
    val short = base.filter(length(col("s")) <= k * q + q - 1)
      .select(col("side"), col("id"), col("s"), length(col("s")).as("len"))
    val shortCand = short.select(col("side").as("side1"), col("id").as("id1"),
        col("s").as("s1"),
        explode(sequence(col("len") - k, col("len") + k)).as("lk"))
      .join(short.select(col("side").as("side2"), col("id").as("id2"),
        col("s").as("s2"), col("len").as("lk")), Seq("lk"))
      .filter(pairPred)
      .withColumn("dist", levenshtein(col("s1"), col("s2"), k))
      .filter(col("dist") >= 0)
      .select("side1", "id1", "side2", "id2", "dist")
    // dist is a pure function of the pair, so distinct() on
    // (ids, dist) is exactly per-pair dedup — survivor-sized, not
    // candidate-sized
    cand.union(shortCand).distinct()
  }

  /**
   * Self-join: all pairs within edit distance `k`, exactly.
   *
   * @param df  input; `id` numeric unique non-null, null strings dropped
   * @param k   max levenshtein distance (>= 0)
   * @param q   gram width (default 3)
   * @return (id1, id2, dist) with id1 < id2, dist = exact levenshtein
   */
  def editDistancePairs(df: DataFrame, id: String, str: String,
                        k: Int, q: Int = 3): DataFrame = {
    require(k >= 0, "k must be >= 0")
    require(q >= 1, "q must be >= 1")
    val tagged = df.select(lit(0).as("side"),
      col(id).cast("long").as("id"), col(str).as("s"))
    pairsCore(tagged, k, q, col("id1") < col("id2"))
      .select(col("id1"), col("id2"), col("dist"))
  }

  /**
   * Sorted-neighborhood blocking — the other classic entity-resolution
   * candidate generator: rank the corpus by a blocking key and emit
   * every pair within `w` positions of each other. Complements the
   * gram-based joins (a typo in the key's FIRST characters defeats
   * sort-order locality, a typo anywhere defeats nothing for q-grams;
   * conversely SNM catches transpositions/concatenations q-grams
   * dilute). Runs over (key, id) so the order — and therefore the
   * result — is total and engine-independent.
   *
   * Scale: one range-partitioned sort + zipWithIndex's small count job
   * for contiguous global positions (the [[Sampling.shuffleEpoch]]
   * construction — never a single-partition window), then a
   * block-band equi-join: each row probes its own ⌊pos/w⌋ block and
   * the next, so every qualifying pair (gap < w) shares a block key
   * and the join is linear with constant fan-out 2.
   *
   * @return (id1, id2, gap) with gap = position distance in (0, w)
   */
  def sortedNeighborhoodPairs(df: DataFrame, id: String, key: String,
                              w: Int): DataFrame = {
    require(w >= 1, "w must be >= 1")
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StructField}
    val spark = df.sparkSession
    val sorted = df.select(col(id), col(key)).orderBy(col(key), col(id))
    val sch = sorted.schema.add(StructField("pos", LongType, nullable = false))
    val rdd = sorted.rdd.zipWithIndex()
      .map { case (r, i) => Row.fromSeq(r.toSeq :+ i) }
    val pos = spark.createDataFrame(rdd, sch)
    val a = pos.select(col(id).as("id1"), col("pos").as("p1"),
      explode(array(expr(s"pos div $w"), expr(s"pos div $w + 1"))).as("blk"))
    val b = pos.select(col(id).as("id2"), col("pos").as("p2"),
      expr(s"pos div $w").as("blk"))
    a.join(b, "blk")
      .filter(col("p2") > col("p1") && col("p2") - col("p1") < w)
      .select(col("id1"), col("id2"), (col("p2") - col("p1")).as("gap"))
  }

  /**
   * Bipartite join: every (probe, corpus) pair within edit distance
   * `k` — near-exact-match decontamination ("which corpus strings are
   * a benchmark string up to k typos?") and entity linking. The rarity
   * order is computed over the UNION of both sides, so one consistent
   * global order backs the prefix lemma for cross-side pairs.
   *
   * @return (id1 = probes.id, id2 = corpus.id, dist)
   */
  def editDistanceJoin(probes: DataFrame, idP: String, strP: String,
                       corpus: DataFrame, idC: String, strC: String,
                       k: Int, q: Int = 3): DataFrame = {
    require(k >= 0, "k must be >= 0")
    require(q >= 1, "q must be >= 1")
    val tagged = probes.select(lit(0).as("side"),
        col(idP).cast("long").as("id"), col(strP).as("s"))
      .unionByName(corpus.select(lit(1).as("side"),
        col(idC).cast("long").as("id"), col(strC).as("s")))
    pairsCore(tagged, k, q, col("side1") === 0 && col("side2") === 1)
      .select(col("id1"), col("id2"), col("dist"))
  }
}
