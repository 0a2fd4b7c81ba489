package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType}

/**
 * Product-quantization kernels for the embedding scale path.
 *
 * At 100 TB an ARRAY<FLOAT> embedding column (dim 64 → 256 B/row) is
 * the dominant scan+shuffle cost of every similarity pass. PQ splits
 * the vector into `m` subspaces and stores, per subspace, the id of
 * the nearest codebook entry — `m` BYTES per row (32× smaller at
 * dim 64, m 8). Queries score candidates with an asymmetric-distance
 * lookup table (ADC): per candidate, `m` table lookups + adds instead
 * of `dim` multiplies, against a corpus stream that is 32× lighter.
 * Exact re-ranking of the ADC top candidates restores exact cosine on
 * the emitted rows (the standard PQ recall/throughput trade — Jégou
 * et al., "Product Quantization for Nearest Neighbor Search").
 *
 * Both kernels follow the [[FloatVecBestLists]] stance: the codebook /
 * LUT matrix rides as ONE executor-resident broadcast, the generated
 * code is a single static call, so plans stay O(1)-sized and inside
 * whole-stage codegen regardless of m × ksub × dim.
 */
final class PqBooks(val books: Array[Array[Array[Double]]]) extends Serializable {
  val m: Int = books.length
  val ksub: Int = books(0).length
  val dsub: Int = books(0)(0).length
  require(ksub <= 256, s"ksub $ksub exceeds one byte per code")
}

/** Per-query-batch ADC lookup tables: `luts(qidx)` is a flattened
  * m × ksub row of dot(query_sub(s), book(s)(j)) doubles. */
final class PqLuts(val luts: Array[Array[Double]], val ksub: Int)
    extends Serializable

object PqEncode {
  /** Nearest codebook entry per subspace by squared-L2 distance over
    * the subspace slice; ties break to the LOWEST entry id, vectors
    * shorter than s*dsub+i contribute 0.0 for the missing elements —
    * deterministic for any input. Referenced statically from
    * generated code. */
  def evalStatic(v: ArrayData, bc: Broadcast[PqBooks]): Array[Byte] = {
    val b = bc.value
    val n = v.numElements()
    val out = new Array[Byte](b.m)
    var s = 0
    while (s < b.m) {
      val book = b.books(s)
      val base = s * b.dsub
      var best = 0
      var bestD = Double.MaxValue
      var j = 0
      while (j < b.ksub) {
        val e = book(j)
        var d = 0.0
        var i = 0
        while (i < b.dsub) {
          val x = if (base + i < n) v.getFloat(base + i).toDouble else 0.0
          val diff = x - e(i)
          d += diff * diff
          i += 1
        }
        if (d < bestD) { bestD = d; best = j }
        j += 1
      }
      out(s) = best.toByte
      s += 1
    }
    out
  }
}

/** PQ code (BINARY, m bytes) of an ARRAY<FLOAT> vector column. */
case class PqEncode(child: Expression, booksBc: Broadcast[PqBooks])
    extends UnaryExpression {

  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pq_encode"

  override def nullSafeEval(v: Any): Any =
    PqEncode.evalStatic(v.asInstanceOf[ArrayData], booksBc)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqBooksBc", booksBc,
      classOf[Broadcast[_]].getName)
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.PqEncode.evalStatic($v, $ref);")
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

/** Training-sweep variant of [[PqEncode]]: the same codes as an
  * ARRAY<INT> so the Lloyd update can `posexplode` them into
  * (subspace, code) rows. The storage format stays BINARY — this
  * shape exists only inside the training aggregation. */
case class PqEncodeArr(child: Expression, booksBc: Broadcast[PqBooks])
    extends UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.ArrayType(
    org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pq_encode_arr"

  override def nullSafeEval(v: Any): Any =
    PqEncodeArr.wrap(PqEncode.evalStatic(v.asInstanceOf[ArrayData], booksBc))

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqBooksBc", booksBc,
      classOf[Broadcast[_]].getName)
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) " +
        s"graft.functions.PqEncodeArr.wrap(" +
        s"graft.functions.PqEncode.evalStatic($v, $ref));")
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncodeArr =
    copy(child = newChild)
}

object PqEncodeArr {
  /** Referenced statically from generated code. */
  def wrap(bytes: Array[Byte]): ArrayData = {
    val ints = new Array[Int](bytes.length)
    var i = 0
    while (i < bytes.length) { ints(i) = bytes(i) & 0xFF; i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(ints)
  }
}

object PqAdcDot {
  /** ADC approximate dot: Σ_s luts(qidx)(s*ksub + code(s)). Codes from
    * a foreign/short binary read 0 for missing subspaces. Referenced
    * statically from generated code. */
  def evalStatic(codes: Array[Byte], qidx: Int, bc: Broadcast[PqLuts]): Double = {
    val l = bc.value
    val lut = l.luts(qidx)
    val m = math.min(codes.length, lut.length / l.ksub)
    var sum = 0.0
    var s = 0
    while (s < m) {
      sum += lut(s * l.ksub + (codes(s) & 0xFF))
      s += 1
    }
    sum
  }
}

/** ADC approximate dot product of a BINARY code column against the
  * `qidx`-th query's lookup table. O(m) per pair; only the broadcast
  * handle rides in the plan. */
case class PqAdcDot(left: Expression, right: Expression,
                    lutsBc: Broadcast[PqLuts])
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pq_adc_dot"

  override def nullSafeEval(codes: Any, qidx: Any): Any =
    PqAdcDot.evalStatic(codes.asInstanceOf[Array[Byte]],
      qidx.asInstanceOf[Int], lutsBc)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqLutsBc", lutsBc,
      classOf[Broadcast[_]].getName)
    nullSafeCodeGen(ctx, ev, (c, q) =>
      s"${ev.value} = graft.functions.PqAdcDot.evalStatic($c, $q, $ref);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdcDot =
    copy(left = newLeft, right = newRight)
}
