package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.sqrt
import org.apache.spark.sql.graft.shims
import org.apache.spark.sql.types.{DataType, DoubleType}

/**
 * Native Catalyst expression for the embedding hot path: dot product of
 * two ARRAY<FLOAT> columns as a codegen'd loop.
 *
 * Why not functions-only? The unrolled `element_at` sum (64 terms per
 * pair, ×3 for cosine with per-pair norms) blows past janino's method
 * limits inside a BroadcastNestedLoopJoin stage — whole-stage codegen
 * fails and Spark falls back to interpreted eval for the entire stage.
 * A single loop expression keeps the stage compiled and does O(dim)
 * work with no per-element Catalyst node overhead.
 *
 * Arithmetic contract: left-associated double accumulation of
 * (double)a[i] * (double)b[i], identical to the unrolled
 * `Similarity.dotUnrolled` and to the DuckDB oracle's explicit sum —
 * results are bit-identical, so oracle hash-compare is unaffected.
 */
case class FloatVecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  // Inputs must be ARRAY<FLOAT>; call sites are internal (VectorExpressions)
  // and typed, so no ExpectsInputTypes (private[sql] in Spark 4).
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "float_vec_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var sum = 0.0
    var i = 0
    while (i < n) {
      sum += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    sum
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val sum = ctx.freshName("sum")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $sum = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $sum += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatVecDot =
    copy(left = newLeft, right = newRight)
}

/**
 * Deterministic pseudo-random hyperplane signs shared by the Column
 * and native-codegen hyperplane-signature implementations: sign(p, i)
 * ∈ {-1.0, +1.0} from a splitmix64-style mix of (plane, 1-based
 * element index). Referenced statically from generated code.
 */
object HyperplaneSigns {
  def sign(p: Int, i: Int): Double = {
    var z = (p.toLong << 32) ^ (i.toLong + 0x9E3779B97F4A7C15L)
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z = z ^ (z >>> 31)
    if ((z & 1L) == 0L) -1.0 else 1.0
  }
}

/**
 * Random-hyperplane LSH signature of an ARRAY<FLOAT> vector: nPlanes
 * sign-of-projection bits packed into a long. Same values as the
 * unrolled Column formulation (left-associated double accumulation,
 * identical sign schedule) — but one codegen'd loop instead of
 * nPlanes × dim Catalyst nodes, which overflowed janino's method
 * limits and knocked the whole stage back to interpreted eval.
 */
case class FloatVecHyperplaneSig(child: Expression, nPlanes: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  require(nPlanes >= 1 && nPlanes <= 64, s"nPlanes $nPlanes out of [1,64]")
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "float_vec_hyperplane_sig"

  override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val n = x.numElements()
    var sig = 0L
    var p = 0
    while (p < nPlanes) {
      var proj = 0.0
      var i = 0
      while (i < n) {
        proj += x.getFloat(i).toDouble * HyperplaneSigns.sign(p, i + 1)
        i += 1
      }
      if (proj > 0) sig |= (1L << p)
      p += 1
    }
    sig
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n")
      val p = ctx.freshName("p")
      val i = ctx.freshName("i")
      val proj = ctx.freshName("proj")
      val sig = ctx.freshName("sig")
      s"""
         |final int $n = $v.numElements();
         |long $sig = 0L;
         |for (int $p = 0; $p < $nPlanes; $p++) {
         |  double $proj = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $proj += (double) $v.getFloat($i)
         |        * graft.functions.HyperplaneSigns.sign($p, $i + 1);
         |  }
         |  if ($proj > 0) $sig |= (1L << $p);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): FloatVecHyperplaneSig =
    copy(child = newChild)
}

/** Centroid matrix + precomputed norms, shipped ONCE per executor as
  * a broadcast (an nList × dim unrolled literal tree serialized into
  * every task binary at >1 MiB for dim 64 — and its analysis/codegen
  * time grew with nList × dim, which is exactly the cost the
  * driver-side probe work removed elsewhere). */
final class CentroidMatrix(val cents: Array[Array[Double]]) extends Serializable {
  val norms: Array[Double] = cents.map(c => math.sqrt(c.map(x => x * x).sum))
}

object FloatVecBestLists {
  /** Top-`nProbe` centroid ids by cosine for one ARRAY<FLOAT> vector.
    * Arithmetic contract shared with [[FloatVecDot]] and the
    * driver-side probe (IvfIndex.topKAt): left-associated double sums
    * of (double)v[i] * c[i], score = dot / norm, ties by centroid
    * index. Zero-norm and NaN-scored centroids pin to -inf so they
    * deterministically rank last on every engine. Referenced
    * statically from generated code. */
  def evalStatic(v: ArrayData,
                 bc: org.apache.spark.broadcast.Broadcast[CentroidMatrix],
                 nProbe: Int): ArrayData = {
    val m = bc.value
    val cents = m.cents
    val nList = cents.length
    val n = v.numElements()
    val scores = new Array[Double](nList)
    var ci = 0
    while (ci < nList) {
      if (m.norms(ci) == 0.0) scores(ci) = Double.NegativeInfinity
      else {
        val c = cents(ci)
        val d = math.min(n, c.length)
        var dot = 0.0
        var i = 0
        while (i < d) { dot += v.getFloat(i).toDouble * c(i); i += 1 }
        val s = dot / m.norms(ci)
        scores(ci) = if (java.lang.Double.isNaN(s)) Double.NegativeInfinity else s
      }
      ci += 1
    }
    val k = math.min(nProbe, nList)
    val out = new Array[Int](k)
    val used = new Array[Boolean](nList)
    var p = 0
    while (p < k) {
      var best = -1
      var bs = 0.0
      var j = 0
      while (j < nList) {
        if (!used(j) && (best < 0 || scores(j) > bs)) { best = j; bs = scores(j) }
        j += 1
      }
      used(best) = true
      out(p) = best
      p += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** Top-`nProbe` centroid ids (ARRAY<INT>) for an ARRAY<FLOAT> vector
  * column. Only the broadcast HANDLE rides in the plan and the task
  * binary; the generated code is one static call, so the stage stays
  * inside whole-stage codegen with O(1) expression-tree size. */
case class FloatVecBestLists(
    child: Expression,
    centsBc: org.apache.spark.broadcast.Broadcast[CentroidMatrix],
    nProbe: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.ArrayType(
    org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "float_vec_best_lists"

  override def nullSafeEval(v: Any): Any =
    FloatVecBestLists.evalStatic(v.asInstanceOf[ArrayData], centsBc, nProbe)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centsBc", centsBc,
      classOf[org.apache.spark.broadcast.Broadcast[_]].getName)
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.FloatVecBestLists.evalStatic($v, $ref, $nProbe);")
  }

  override protected def withNewChildInternal(newChild: Expression): FloatVecBestLists =
    copy(child = newChild)
}

/** Column-level entry points for the native vector kernels. */
object VectorExpressions {
  /** Codegen'd dot product of two ARRAY<FLOAT> columns. */
  def dotF(a: Column, b: Column): Column =
    shims.column(FloatVecDot(shims.expression(a), shims.expression(b)))

  /** L2 norm via the native dot. */
  def normF(a: Column): Column = sqrt(dotF(a, a))

  /** Codegen'd hyperplane LSH signature (nPlanes sign bits in a long). */
  def hyperplaneSigF(a: Column, nPlanes: Int): Column =
    shims.column(FloatVecHyperplaneSig(shims.expression(a), nPlanes))
}
