package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Snapshot diff for continuously-refreshed corpora: given two versions
 * of a keyed dataset, classify every key as added / removed / changed /
 * unchanged and emit the per-key status (plus both digests, so a
 * downstream incremental pipeline can re-process exactly the
 * added+changed set and retire the removed set — the delta-feed shape
 * every recurring training-data refresh needs).
 *
 * The reference has no diff operator; in bigslice one would write it as
 * a Cogroup over the two snapshots (slice.go:1106-1192). Here it is one
 * full-outer sort-merge/hash join on the key — a single Exchange per
 * side, no data movement beyond the key+digest projection (content
 * columns are digested BEFORE the shuffle, so a wide document row
 * shuffles as ~48 bytes regardless of text size).
 *
 * At 100 TB: both sides shuffle only (key, 32-hex digest); AQE handles
 * size mismatch between a big base and a small delta by electing a
 * broadcast join when the delta fits. The digest is md5 over the
 * length-prefixed compare columns (prefixing prevents concatenation
 * collisions like ("ab","c") vs ("a","bc")); NULL columns fold to a
 * distinct marker so NULL != ''.
 */
object Diff {

  /** Collision-free row digest over `cols` (length-prefixed concat). */
  def rowDigest(cols: Seq[Column]): Column = {
    val parts = cols.flatMap { c =>
      val s = c.cast("string")
      Seq(coalesce(concat(length(s).cast("string"), lit(":"), s), lit("~")),
        lit("|"))
    }
    md5(concat(parts: _*).cast("binary"))
  }

  /**
   * Per-key diff of snapshots `a` (old) and `b` (new).
   * Output: keyCols..., status STRING (added|removed|changed|unchanged),
   * digest_a, digest_b (NULL where the side is absent).
   */
  def snapshot(a: DataFrame, b: DataFrame, keyCols: Seq[String],
               compareCols: Seq[String]): DataFrame = {
    val da = a.select(keyCols.map(col) :+
      rowDigest(compareCols.map(col)).as("digest_a"): _*).alias("__dfa")
    val db = b.select(keyCols.map(col) :+
      rowDigest(compareCols.map(col)).as("digest_b"): _*).alias("__dfb")
    // null-safe key equality: a key NULL on both sides is the SAME row
    // (compared, not double-reported as removed+added); explicit side
    // aliases keep a self-diff (a and b from one Dataset) unambiguous
    val cond = keyCols
      .map(k => col(s"__dfa.$k") <=> col(s"__dfb.$k")).reduce(_ && _)
    da.join(db, cond, "full_outer")
      .select(keyCols.map(k =>
        coalesce(col(s"__dfa.$k"), col(s"__dfb.$k")).as(k)) ++
        Seq(col("digest_a"), col("digest_b")): _*)
      .withColumn("status",
        when(col("digest_a").isNull, lit("added"))
          .when(col("digest_b").isNull, lit("removed"))
          .when(col("digest_a") === col("digest_b"), lit("unchanged"))
          .otherwise(lit("changed")))
  }

  /** Summary counts per status (the monitoring face of [[snapshot]]). */
  def snapshotSummary(a: DataFrame, b: DataFrame, keyCols: Seq[String],
                      compareCols: Seq[String]): DataFrame =
    snapshot(a, b, keyCols, compareCols)
      .groupBy("status").agg(count(lit(1)).as("n"))
}
