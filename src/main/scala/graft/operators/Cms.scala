package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Deterministic, cross-engine-replayable COUNT-MIN sketch point
 * estimates (Cormode & Muthukrishnan 2005).
 *
 * Third member of the sketch family: [[FrequentItems]] answers "which
 * keys are hot" EXACTLY, [[Hll]] answers "how many distinct", and this
 * answers "how often does key x occur" for arbitrary probe keys from
 * d*w integers of state — without ever storing the keys themselves.
 * At 100 TB the sketch is what you keep per shard/day when the key
 * domain (urls, doc ids, ngrams) is too large to count exactly:
 * point-lookup frequency features, join-skew hints, repetition priors.
 *
 * Same determinism discipline as [[Hll]]: row hashes are md5 of the
 * key's decimal string salted with the row index, buckets are a hex
 * prefix mod w, all state is integer counts — so the ENTIRE sketch and
 * every estimate replays bit-for-bit in the DuckDB oracle. Guarantees:
 * est >= true always (only overestimates), and
 * P[est > true + 2n/w] <= (1/2)^d per the standard CMS bound.
 *
 * Scale shape: the build is one narrow posexplode (d rows per input
 * row) feeding a partial+final count aggregate — the shuffle carries
 * at most d*w pre-combined cells per map partition, NOT the input
 * rows. The finished sketch is d*w <= 32k cells: broadcastable, so
 * probing any number of keys is a broadcast hash join + a d-row min.
 */
object Cms {

  /** Per-row bucket of `key` under row-salt `r`: the shared
    * engine-portable md5 hash ([[Sampling.hashBucket]], salted with
    * "#r") mod w. */
  private def bucketOf(key: Column, r: Int, w: Int): Column =
    Sampling.hashBucket(key, s"#$r") % w

  /** A built sketch: the cell frame PLUS the (d, w) it was built with —
    * probing with mismatched parameters would silently break the
    * est >= true guarantee, so the parameters travel with the cells. */
  final case class Sketch(cells: DataFrame, d: Int, w: Int)

  /** The sketch: one row per non-empty (r, b) cell with its count.
    * d*w cells max — driver/broadcast sized by construction. */
  def build(df: DataFrame, key: Column, d: Int = 4, w: Int = 8192)
      : Sketch = {
    require(d >= 1 && d <= 8 && w >= 16,
      s"need 1<=d<=8 rows and w>=16 buckets, got d=$d w=$w")
    Sketch(df.select(posexplode(array((0 until d).map(r =>
        bucketOf(key, r, w)): _*)).as(Seq("r", "b")))
      .groupBy("r", "b").agg(count(lit(1)).as("c")), d, w)
  }

  /** Point estimates for `probes` (a one-column frame of keys, column
    * `probeCol`): min over the d cells each key hashes to, with the
    * sketch's OWN (d, w). The sketch broadcasts; zero cells (key row
    * hashing to an empty bucket) read as 0 via the outer join — an
    * absent key estimates 0 unless every one of its cells collides. */
  def pointEstimates(sketch: Sketch, probes: DataFrame,
                     probeCol: String,
                     out: String = "cms_est"): DataFrame =
    probes
      .select(col(probeCol),
        posexplode(array((0 until sketch.d).map(r =>
          bucketOf(col(probeCol), r, sketch.w)): _*)).as(Seq("r", "b")))
      .join(broadcast(sketch.cells), Seq("r", "b"), "left_outer")
      .groupBy(probeCol)
      .agg(min(coalesce(col("c"), lit(0L))).as(out))

  /** DuckDB replay of build+probe over one table — kept beside the
    * kernels so query and oracle evolve together. `probesSql` must
    * select a single column named `pk`. */
  def oracleSql(table: String, keyExpr: String, probesSql: String,
                d: Int = 4, w: Int = 8192, out: String = "cms_est")
      : String =
    s"""WITH cms_cells AS (
       |  SELECT r, ('0x' || substr(md5(CAST($keyExpr AS VARCHAR) || '#' || CAST(r AS VARCHAR)), 1, 8))::BIGINT % $w AS b,
       |         count(*) AS c
       |  FROM $table, (SELECT unnest(range($d)) AS r) rows
       |  GROUP BY ALL),
       |cms_probes AS ($probesSql),
       |cms_pb AS (
       |  SELECT pk, r, ('0x' || substr(md5(CAST(pk AS VARCHAR) || '#' || CAST(r AS VARCHAR)), 1, 8))::BIGINT % $w AS b
       |  FROM cms_probes, (SELECT unnest(range($d)) AS r) rows)
       |SELECT pk, min(coalesce(c, 0))::BIGINT AS $out
       |FROM cms_pb LEFT JOIN cms_cells USING (r, b)
       |GROUP BY pk
       |""".stripMargin
}
