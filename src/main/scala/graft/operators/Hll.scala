package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Deterministic, CROSS-ENGINE-REPLAYABLE HyperLogLog distinct count.
 *
 * `approx_count_distinct` (and every stock HLL) hashes with an
 * engine-private function, so two engines never agree on the sketch —
 * which is why the stock variant (`q_approx_distinct`) carries only a
 * rows-only error-bound check. This implementation pins every bit of
 * the sketch to public, engine-portable primitives so the WHOLE
 * estimate — registers, harmonic sum, bias correction, linear-counting
 * branch — replays exactly in ANSI-ish SQL (DuckDB oracle included):
 *
 *   - hash: md5 of the key's decimal string (identical in every
 *     engine); bucket = first b/4 hex chars, rho over the next 60 bits.
 *   - rho via INTEGER bit-length: `61 - length(ltrim(bin(w),'0'))` —
 *     `bin` is unpadded in both Spark and DuckDB, no float log2.
 *   - harmonic sum kept EXACT in integers: registers capped at
 *     [[RegCap]] so each term `2^(RegCap-reg)` is a long and the
 *     m-bucket sum fits in 2^52 — summation order cannot matter.
 *   - the only float ops are multiplications by powers of two (exact,
 *     exponent-only), one correctly-rounded division, and a fixed
 *     Horner atanh series for the linear-counting ln — every IEEE-754
 *     op is correctly rounded, so identical expression trees give
 *     bit-identical doubles on the JVM and in C++.
 *
 * Scale shape: one narrow select (all codegen'd column algebra), then
 * a two-level aggregate — (group, bucket) partial-aggregates map-side,
 * and the per-group state that shuffles is ≤ m rows of (bucket, reg).
 * The reference has no sketch surface at all (SURVEY §2.2); this is
 * the distinct-count member of the beyond-reference sketch family,
 * sibling to [[FrequentItems]]' exact heavy hitters.
 *
 * Estimator: Flajolet et al. 2007 — alpha_m * m^2 / sum(2^-M_j), with
 * the small-range linear-counting correction `m * ln(m/zeros)` when
 * the raw estimate <= 2.5m and empty buckets remain. The large-range
 * (2^32) correction is irrelevant at 60-bit rho and omitted on BOTH
 * sides. Relative error ~1.04/sqrt(m) (1.6% at b=12).
 */
object Hll {

  /** ln 2 to full double precision — the literal both engines use. */
  val Ln2 = 0.6931471805599453

  /** Register cap: keeps `2^(RegCap-reg)` integral (no dyadic
    * fractions) and the m-bucket harmonic sum under 2^52. A real rho
    * above 40 has probability 2^-40 per item, and the SAME capped
    * value replays on both engines, so exactness of the replay is
    * unaffected. */
  val RegCap = 40

  /** Deterministic natural log of a POSITIVE integer column.
    *
    * Exact base-2 range reduction (integer bit-length, power-of-two
    * division — both exact), then ln f for f in [1,2) via the atanh
    * series 2z(1 + z^2/3 + z^4/5 + ...) truncated at z^11 in Horner
    * form: |z| <= 1/3 so the tail is < 1e-7 relative — and every op
    * is correctly rounded, so the value is identical across engines
    * evaluating the same tree. */
  private[graft] def lnOfPosInt(n: Column): Column = {
    val e = (length(ltrim(bin(n), "0")) - lit(1)).cast("int")
    val f = n.cast("double") /
      call_function("shiftleft", lit(1L), e).cast("double")
    val z = (f - lit(1.0)) / (f + lit(1.0))
    val z2 = z * z
    val lnf = lit(2.0) * z * (lit(1.0) + z2 *
      (lit(1.0) / lit(3.0) + z2 * (lit(1.0) / lit(5.0) + z2 *
        (lit(1.0) / lit(7.0) + z2 *
          (lit(1.0) / lit(9.0) + z2 / lit(11.0))))))
    e.cast("double") * lit(Ln2) + lnf
  }

  /**
   * Per-group HLL distinct estimate of `key`.
   *
   * Output: groupCols ++ (hll_zeros, hll_ssum, approx_distinct) —
   * the integer register state (zeros + scaled harmonic sum) rides
   * along so the estimate is auditable and the oracle can pin the
   * sketch itself, not just the final double.
   *
   * @param b bucket bits, multiple of 4 so the bucket is a whole
   *          number of hex chars (default 12 → m=4096, ~1.6% error).
   */
  def approxDistinct(df: DataFrame, groupCols: Seq[String], key: Column,
                     b: Int = 12, out: String = "approx_distinct")
      : DataFrame = {
    require(b >= 4 && b <= 16 && b % 4 == 0,
      s"b must be a multiple of 4 in [4,16], got $b")
    val m = 1 << b
    val h = md5(key.cast("string").cast("binary"))
    val bkt = conv(substring(h, 1, b / 4), 16, 10).cast("int")
    // 15 hex chars = 60 bits — fits a signed long, w >= 0
    val w = conv(substring(h, b / 4 + 1, 15), 16, 10).cast("long")
    val rho = least(lit(61) - length(ltrim(bin(w), "0")), lit(RegCap))

    val gc = groupCols.map(col)
    // NULL keys are ignored like count(DISTINCT) ignores them (a group
    // whose keys are all null yields no row) — same WHERE in the
    // oracle and the same skip in HllAggregator, so all three faces
    // stay bit-identical on null-bearing input
    val regs = df
      .filter(key.isNotNull)
      .select(gc ++ Seq(bkt.as("hll_bkt"), rho.as("hll_rho")): _*)
      .groupBy(gc :+ col("hll_bkt"): _*)
      .agg(max("hll_rho").as("reg"))
    val agg = regs
      .groupBy(gc: _*)
      .agg((lit(m.toLong) - count(lit(1))).as("hll_zeros"),
        sum(call_function("shiftleft", lit(1L), lit(RegCap) - col("reg")))
          .as("hll_psum"))
      .withColumn("hll_ssum",
        call_function("shiftleft", col("hll_zeros"), lit(RegCap)) +
          col("hll_psum"))

    // alpha * m^2 * 2^RegCap: alpha scaled by a power of two — exact,
    // so the lone rounding step is the division by the harmonic sum
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    val num = alpha * m.toDouble * m.toDouble * (1L << RegCap).toDouble
    val raw = lit(num) / col("hll_ssum").cast("double")
    val est = when(col("hll_zeros") > 0 && raw <= lit(2.5 * m),
      lit(m.toDouble) *
        (lit(b.toDouble) * lit(Ln2) - lnOfPosInt(col("hll_zeros"))))
      .otherwise(raw)
    agg.select(gc ++ Seq(col("hll_zeros"), col("hll_ssum"),
      est.as(out)): _*)
  }

  /** Scalar twin of [[lnOfPosInt]] — the SAME operation sequence in
    * JVM doubles, so [[HllAggregator]] and the column path agree
    * bit-for-bit. */
  private[graft] def lnOfPosIntScalar(n: Long): Double = {
    val e = 63 - java.lang.Long.numberOfLeadingZeros(n)
    val f = n.toDouble / (1L << e).toDouble
    val z = (f - 1.0) / (f + 1.0)
    val z2 = z * z
    val lnf = 2.0 * z * (1.0 + z2 *
      (1.0 / 3.0 + z2 * (1.0 / 5.0 + z2 *
        (1.0 / 7.0 + z2 * (1.0 / 9.0 + z2 / 11.0)))))
    e.toDouble * Ln2 + lnf
  }

  /** Estimate from a register array — the same estimator expression
    * sequence as [[approxDistinct]]'s column form. */
  private[graft] def estimateOf(regs: Array[Byte], b: Int): Double = {
    val m = 1 << b
    var zeros = 0
    var s = 0L
    var i = 0
    while (i < m) {
      val r = regs(i)
      if (r == 0) zeros += 1
      s += 1L << (RegCap - r)
      i += 1
    }
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    val num = alpha * m.toDouble * m.toDouble * (1L << RegCap).toDouble
    val raw = num / s.toDouble
    if (zeros > 0 && raw <= 2.5 * m)
      m.toDouble * (b.toDouble * Ln2 - lnOfPosIntScalar(zeros.toLong))
    else raw
  }

  /**
   * The MERGEABLE form: register state as a typed `Aggregator` — ONE
   * aggregation (so it is legal inside a Structured Streaming windowed
   * agg, where the two-level groupBy form is not), same md5 bucketing
   * / rho / cap / estimator as [[approxDistinct]], pinned bit-identical
   * by spec. Buffer is the m-byte register array; merge is elementwise
   * max, so partial aggregation and state-store merges commute — the
   * mergeable-summaries property that makes HLL the per-shard/day
   * sketch you keep at 100 TB.
   *
   * Input is the key's STRING form (match `key.cast("string")` of the
   * column path).
   */
  final case class HllAggregator(b: Int = 12)
      extends org.apache.spark.sql.expressions.Aggregator[
        String, Array[Byte], Double] {
    require(b >= 4 && b <= 16 && b % 4 == 0)
    def zero: Array[Byte] = new Array[Byte](1 << b)
    // per-task digest instance — getInstance is a JCA provider lookup,
    // too expensive per row on the streaming hot path
    @transient private lazy val md =
      java.security.MessageDigest.getInstance("MD5")
    def reduce(buf: Array[Byte], key: String): Array[Byte] = {
      if (key == null) return buf // NULLs ignored, like the column path
      md.reset()
      val dig = md.digest(
        key.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      // nibble arithmetic over the digest bytes — identical to the
      // column path's hex-string substrings by construction (hex char
      // i IS nibble i of the digest, big-endian within each byte)
      def nib(i: Int): Int = {
        val x = dig(i >> 1) & 0xff
        if ((i & 1) == 0) x >>> 4 else x & 0xf
      }
      val nb = b / 4
      var bkt = 0
      var i = 0
      while (i < nb) { bkt = (bkt << 4) | nib(i); i += 1 }
      var w = 0L
      i = 0
      while (i < 15) { w = (w << 4) | nib(nb + i); i += 1 }
      val bitlen = 64 - java.lang.Long.numberOfLeadingZeros(w)
      val rho = math.min(61 - bitlen, RegCap)
      if (rho > buf(bkt)) buf(bkt) = rho.toByte
      buf
    }
    def merge(x: Array[Byte], y: Array[Byte]): Array[Byte] = {
      var i = 0
      while (i < x.length) {
        if (y(i) > x(i)) x(i) = y(i)
        i += 1
      }
      x
    }
    def finish(regs: Array[Byte]): Double = estimateOf(regs, b)
    def bufferEncoder: org.apache.spark.sql.Encoder[Array[Byte]] =
      org.apache.spark.sql.Encoders.BINARY
    def outputEncoder: org.apache.spark.sql.Encoder[Double] =
      org.apache.spark.sql.Encoders.scalaDouble
  }

  /** The DuckDB replay of [[approxDistinct]] — same tree, same
    * literals, op for op. `table`/`groupCols`/`keyExpr` are spliced
    * into a CTE chain; kept here so query and oracle evolve together. */
  def oracleSql(table: String, groupCols: Seq[String], keyExpr: String,
                b: Int = 12, out: String = "approx_distinct"): String = {
    require(b >= 4 && b <= 16 && b % 4 == 0)
    val m = 1 << b
    val g = groupCols.mkString(", ")
    s"""WITH hll_pre AS (
       |  SELECT $g,
       |    ('0x' || substr(md5(CAST($keyExpr AS VARCHAR)), 1, ${b / 4}))::BIGINT AS hll_bkt,
       |    least(61 - length(ltrim(bin(('0x' || substr(md5(CAST($keyExpr AS VARCHAR)), ${b / 4 + 1}, 15))::BIGINT), '0')), $RegCap) AS hll_rho
       |  FROM $table WHERE $keyExpr IS NOT NULL),
       |hll_regs AS (
       |  SELECT $g, hll_bkt, max(hll_rho) AS reg
       |  FROM hll_pre GROUP BY ALL),
       |hll_agg AS (
       |  SELECT $g,
       |    ${m}::BIGINT - count(*) AS hll_zeros,
       |    (sum(1::BIGINT << ($RegCap - reg)))::BIGINT AS hll_psum
       |  FROM hll_regs GROUP BY ALL),
       |hll_s AS (
       |  SELECT $g, hll_zeros,
       |    (hll_zeros << $RegCap) + hll_psum AS hll_ssum
       |  FROM hll_agg),
       |hll_ln AS (
       |  SELECT *,
       |    length(ltrim(bin(greatest(hll_zeros, 1)), '0')) - 1 AS ln_e,
       |    (0.7213 / (1.0 + 1.079 / $m.0)) * $m.0 * $m.0 * ((1::BIGINT << $RegCap)::DOUBLE) / hll_ssum::DOUBLE AS raw
       |  FROM hll_s),
       |hll_z AS (
       |  SELECT *,
       |    (greatest(hll_zeros, 1)::DOUBLE / (1::BIGINT << ln_e)::DOUBLE - 1.0) /
       |    (greatest(hll_zeros, 1)::DOUBLE / (1::BIGINT << ln_e)::DOUBLE + 1.0) AS ln_z
       |  FROM hll_ln),
       |hll_est AS (
       |  SELECT *,
       |    CASE WHEN hll_zeros > 0 AND raw <= ${2.5 * m}
       |    THEN $m.0 * ($b.0 * $Ln2 -
       |      (ln_e::DOUBLE * $Ln2 + 2.0 * ln_z * (1.0 + (ln_z*ln_z) *
       |        (1.0/3.0 + (ln_z*ln_z) * (1.0/5.0 + (ln_z*ln_z) *
       |          (1.0/7.0 + (ln_z*ln_z) * (1.0/9.0 + (ln_z*ln_z)/11.0)))))))
       |    ELSE raw END AS $out
       |  FROM hll_z)
       |SELECT $g, hll_zeros, hll_ssum, $out FROM hll_est
       |""".stripMargin
  }
}
