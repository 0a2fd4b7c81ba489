package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.shims
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Byte-pair-encoding tokenizer — real merges-table-driven BPE
 * (Sennrich et al. 2016, the algorithm behind the GPT-2 tokenizer),
 * replacing the regex token-count approximation for the operators that
 * key off token budgets (packing, length bucketing, mixture capacity).
 *
 * The merges table is DATA, not code: this engine ships the algorithm
 * and LEARNS the table from the corpus it serves (no third-party vocab
 * bundled — the environment is offline). Training splits exactly the
 * way the tables do at 100 TB:
 *  - the distributed part is ONE word-count aggregate (pair statistics
 *    are a pure function of word frequencies, so nothing else ever
 *    touches the corpus);
 *  - merge learning runs driver-side over the compact top-`maxWords`
 *    frequency table (bounded metadata, same class as k-means
 *    centroids in [[graft.operators.Similarity.trainCentroids]]).
 *
 * Encoding is the standard greedy loop: start from code-point symbols
 * plus an end-of-word marker, repeatedly merge the adjacent pair with
 * the lowest merge rank. Per-word results are memoized (word
 * distributions are Zipfian — the cache hit rate is the point), and
 * the count kernel enters plans as a Catalyst expression whose codegen
 * calls a static helper, keeping whole-stage codegen intact.
 */
object Bpe {

  val EndOfWord = "</w>"

  /** Collision-free single-string key for a symbol pair: the length
    * prefix pins the split point, so ("a\\u0000", "b") and
    * ("a", "\\u0000b") key differently whatever bytes the symbols
    * contain. One string concat per lookup — no tuple allocation in
    * the encode inner loop. */
  private def pairKey(a: String, b: String): String =
    new java.lang.StringBuilder(a.length + b.length + 8)
      .append(a.length).append(':').append(a).append(b).toString

  /** A learned merges table. Equality is by merge list (the identity
    * of a tokenizer). */
  final case class Vocab(merges: Seq[(String, String)]) {
    @transient lazy val ranks: java.util.HashMap[String, Integer] = {
      val m = new java.util.HashMap[String, Integer]()
      merges.zipWithIndex.foreach { case ((a, b), i) => m.put(pairKey(a, b), i) }
      m
    }
    // Zipfian word distributions make a per-word count memo the
    // difference between O(text) and O(text × merges); bounded so a
    // pathological vocabulary can't grow without limit.
    @transient private lazy val wordCounts =
      new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    private[Bpe] def countWordCached(w: String): Int = {
      val hit = wordCounts.get(w)
      if (hit != null) hit.intValue()
      else {
        val n = encodeWord(w, this).length
        if (wordCounts.size < 200000) wordCounts.put(w, n)
        n
      }
    }
  }

  private def rankOf(v: Vocab, a: String, b: String): Int = {
    val r = v.ranks.get(pairKey(a, b))
    if (r == null) Int.MaxValue else r.intValue()
  }

  /** Split a word into initial symbols: code points (surrogate-safe)
    * plus the end-of-word marker. */
  private def initialSymbols(word: String): Array[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String](word.length + 1)
    var i = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      out += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    out += EndOfWord
    out.toArray
  }

  /** Encode one whitespace-free word into BPE symbols: repeatedly
    * merge the adjacent pair with the LOWEST merge rank (all its
    * occurrences, left to right) until no adjacent pair is in the
    * table — the GPT-2-style encode loop, provably equivalent to
    * replaying the merges in learned order (asserted against that
    * independent formulation in BpeSpec). */
  def encodeWord(word: String, v: Vocab): Array[String] = {
    var syms = initialSymbols(word)
    var done = syms.length < 2
    while (!done) {
      var bestRank = Int.MaxValue
      var i = 0
      while (i < syms.length - 1) {
        val r = rankOf(v, syms(i), syms(i + 1))
        if (r < bestRank) bestRank = r
        i += 1
      }
      if (bestRank == Int.MaxValue) done = true
      else {
        val (a, b) = v.merges(bestRank)
        val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
        var j = 0
        while (j < syms.length) {
          if (j < syms.length - 1 && syms(j) == a && syms(j + 1) == b) {
            out += a + b; j += 2
          } else { out += syms(j); j += 1 }
        }
        syms = out.toArray
        done = syms.length < 2
      }
    }
    syms
  }

  /** BPE token count of a text: whitespace pre-tokenization (the same
    * `\s+` contract as [[TextFunctions.tokens]]), per-word encode.
    * Static entry point so generated code can call it directly. */
  def countTokens(text: UTF8String, v: Vocab): Int = {
    val words = text.toString.split("\\s+")
    var total = 0
    var i = 0
    while (i < words.length) {
      if (words(i).nonEmpty) total += v.countWordCached(words(i))
      i += 1
    }
    total
  }

  /**
   * Learn `numMerges` merges from a word-frequency table (driver-side;
   * the table is the compact output of the one distributed aggregate).
   * Deterministic: the highest-count pair wins each round, ties broken
   * lexicographically; learning stops early when no pair repeats.
   */
  def trainFromWordCounts(wc: Seq[(String, Long)], numMerges: Int): Vocab = {
    var words: Array[(Array[String], Long)] =
      wc.map { case (w, c) => (initialSymbols(w), c) }.toArray
    val merges = scala.collection.mutable.ArrayBuffer[(String, String)]()
    var stop = false
    while (merges.length < numMerges && !stop) {
      val counts = scala.collection.mutable.HashMap[(String, String), Long]()
      for ((syms, c) <- words) {
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          counts(p) = counts.getOrElse(p, 0L) + c
          i += 1
        }
      }
      if (counts.isEmpty) stop = true
      else {
        val ((a, b), c) = counts.minBy { case ((x, y), n) => (-n, x, y) }
        if (c < 2) stop = true
        else {
          merges += ((a, b))
          words = words.map { case (syms, cnt) =>
            if (!syms.indices.init.exists(i => syms(i) == a && syms(i + 1) == b))
              (syms, cnt)
            else {
              val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
              var j = 0
              while (j < syms.length) {
                if (j < syms.length - 1 && syms(j) == a && syms(j + 1) == b) {
                  out += a + b; j += 2
                } else { out += syms(j); j += 1 }
              }
              (out.toArray, cnt)
            }
          }
        }
      }
    }
    Vocab(merges.toSeq)
  }

  /** Distributed wordcount → driver-side merge learning. One corpus
    * aggregate; the driver sees only the top-`maxWords` (count, word)
    * rows. */
  def train(df: DataFrame, text: String, numMerges: Int = 256,
            maxWords: Int = 10000): Vocab = {
    val wc = df
      .select(explode(TextFunctions.tokens(col(text))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w")).limit(maxWords)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    trainFromWordCounts(wc, numMerges)
  }

  /** [[countTokens]] through a broadcast handle — the static entry
    * point generated code calls, so codegen never needs a cast. */
  def countTokensBc(text: UTF8String,
                    bc: org.apache.spark.broadcast.Broadcast[Vocab]): Int =
    countTokens(text, bc.value)

  /** One broadcast per DISTINCT vocab (Vocab equality = merge list),
    * not per call — repeated count columns over the same tokenizer
    * reuse the executor-resident copy, and equal vocabs yield the
    * SAME handle so two BpeTokenCount expressions over them are
    * case-class-equal (plan/exchange reuse). Keyed by application id
    * so a stopped context's broadcasts are never served to a
    * successor; bounded by wholesale clear. */
  private val vocabBcs = new java.util.concurrent.ConcurrentHashMap[
    (String, Vocab), org.apache.spark.broadcast.Broadcast[Vocab]]()

  /** Codegen'd token-count column over a learned vocab. The vocab is
    * shipped ONCE per executor as a broadcast variable — a merges
    * table is O(100 KB) and would otherwise ride inside every task
    * binary (the "Broadcasting large task binary" warning at any real
    * task count). A shared executor-side Vocab also means one word
    * memo cache per executor instead of one per task. */
  def bpeTokenCountF(text: Column, v: Vocab): Column = {
    val sc = org.apache.spark.sql.SparkSession.active.sparkContext
    if (vocabBcs.size > 64) vocabBcs.clear()
    val bc = vocabBcs.computeIfAbsent((sc.applicationId, v),
      _ => sc.broadcast(v))
    shims.column(BpeTokenCount(shims.expression(text), bc))
  }
}

/** Catalyst expression for [[Bpe.countTokens]]: only the broadcast
  * HANDLE rides in the plan (the table itself ships torrent-style once
  * per executor), and the generated code is a single static call — the
  * expression stays inside whole-stage codegen. */
case class BpeTokenCount(child: Expression,
                         vocabBc: org.apache.spark.broadcast.Broadcast[Bpe.Vocab])
    extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bpe_token_count"

  override def nullSafeEval(input: Any): Any =
    Bpe.countTokensBc(input.asInstanceOf[UTF8String], vocabBc)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeVocabBc", vocabBc,
      classOf[org.apache.spark.broadcast.Broadcast[_]].getName)
    defineCodeGen(ctx, ev, c => s"graft.functions.Bpe.countTokensBc($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeTokenCount =
    copy(child = newChild)
}
