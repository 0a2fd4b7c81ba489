package graft.operators

import graft.functions.{TextFunctions => TF}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Corpus term statistics: per-document distinctive terms (TF-IDF
 * ranking) and corpus-level collocations (top adjacent-token bigrams).
 *
 * The TF-IDF ranking is kept ALL-INTEGER: terms are ordered by
 * (tf DESC, df ASC, token ASC), which is the tf·idf order whenever two
 * terms differ on one factor and don't invert on the other, and —
 * unlike the float score tf·ln(N/df) — is bit-identical across
 * engines, so the result carries a full cross-engine oracle instead
 * of a tolerance check. tf and df are reported so callers can apply
 * any idf curve downstream.
 */
object Terms {

  /**
   * Top-k distinctive terms per document: rank tokens by
   * (tf DESC, df ASC, token ASC) and keep ranks 1..k.
   *
   * Output: (id, rank, token, tf, df).
   *
   * Scale: tf is one partial-agg Exchange on (id, token); df is one
   * more on token over the already-distinct tf rows (ONE row per
   * (doc, token) — never the raw token stream); the idf join is
   * token-keyed with exactly one build row per key (AQE splits the
   * stop-token skew); the rank window partitions by document, whose
   * group size is bounded by the document's own vocabulary.
   */
  def distinctiveTerms(df: DataFrame, id: String, text: String,
                       k: Int): DataFrame = {
    require(k > 0, "k must be > 0")
    val tf = df.select(col(id), explode(TF.tokens(col(text))).as("token"))
      .groupBy(col(id), col("token"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("token"))
      .agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(col(id))
      .orderBy(col("tf").desc, col("df").asc, col("token").asc)
    tf.join(dfreq, "token")
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col(id), col("rank"), col("token"), col("tf"), col("df"))
  }

  /**
   * Corpus top-n adjacent-token bigrams (collocation mining), ties
   * broken by bigram text. zip_with over two shifted slices keeps the
   * pairing inside whole-stage codegen; the global top-n plans as
   * TakeOrderedAndProject (per-partition heaps + driver merge of n —
   * never a global sort).
   */
  def topBigrams(df: DataFrame, text: String, n: Int): DataFrame = {
    require(n > 0, "n must be > 0")
    val toks = TF.tokens(col(text))
    df.select(toks.as("__toks"))
      .filter(size(col("__toks")) >= 2)
      .select(explode(zip_with(
        slice(col("__toks"), lit(1), size(col("__toks")) - 1),
        slice(col("__toks"), lit(2), size(col("__toks")) - 1),
        (a, b) => concat(a, lit(" "), b))).as("bigram"))
      .groupBy(col("bigram"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("bigram").asc)
      .limit(n)
  }
}
