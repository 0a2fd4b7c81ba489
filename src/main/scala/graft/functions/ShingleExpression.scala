package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.shims
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Single-pass shingling kernel shared by the interpreted and generated
 * paths of [[ShingleArray]] / [[WsTokenCount]].
 *
 * Tokenization contract: identical to
 * `filter(split(text, "\\s+"), t => length(t) > 0)` — Java's `\s`
 * (without UNICODE_CHARACTER_CLASS) is exactly the six ASCII bytes
 * {space, \t, \n, \x0B, \f, \r}, and UTF-8 continuation/lead bytes are
 * all >= 0x80, so a byte-level scan splits at precisely the same
 * boundaries as the regex on any UTF-8 input (asserted against the
 * Column formulation in PipelineSpec, including multi-byte text).
 * Known engine-parity caveat shared by EVERY shingle oracle in this
 * repo: DuckDB's RE2 `\s` omits \x0B (vertical tab), so a corpus
 * containing \x0B would tokenize differently there — the oracle
 * corpora contain none, and the Spark side is self-consistent either
 * way.
 *
 * Why a kernel: the Column formulation of k-shingling costs a regex
 * engine pass + a higher-order filter + per-window `slice`/`concat_ws`
 * allocations + `array_distinct` — measured ~0.6 ms/doc and the
 * dominant stage of every shingle-based dedup operator. This kernel is
 * one byte scan, one byte-copy per shingle, and one hash-set insert.
 */
object ShingleKernel {

  @inline private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'

  /** Whitespace-token count — `size(tokens(text))` semantics. */
  def tokenCount(t: UTF8String): Int = {
    val b = t.getBytes
    var n = 0
    var i = 0
    val len = b.length
    while (i < len) {
      if (!isWs(b(i))) {
        n += 1
        while (i < len && !isWs(b(i))) i += 1
      } else i += 1
    }
    n
  }

  /**
   * Distinct word k-shingles in first-occurrence order — exactly
   * `array_distinct(transform(sequence(0, n-k), i => concat_ws(" ",
   * slice(tokens, i+1, k))))`. Fewer than k tokens yields an EMPTY
   * array (the Column formulation guards with a size filter; callers
   * here filter on token count or array size).
   */
  def shingleArray(t: UTF8String, k: Int): ArrayData = {
    val b = t.getBytes
    val len = b.length
    // token spans: starts/ends (exclusive), two growable int arrays
    var cap = 16
    var starts = new Array[Int](cap)
    var ends = new Array[Int](cap)
    var n = 0
    var i = 0
    while (i < len) {
      if (!isWs(b(i))) {
        val s = i
        while (i < len && !isWs(b(i))) i += 1
        if (n == cap) {
          cap *= 2
          starts = java.util.Arrays.copyOf(starts, cap)
          ends = java.util.Arrays.copyOf(ends, cap)
        }
        starts(n) = s; ends(n) = i; n += 1
      } else i += 1
    }
    if (n < k) return new GenericArrayData(new Array[Any](0))
    val seen = new java.util.LinkedHashSet[UTF8String](n * 2)
    var w = 0
    while (w <= n - k) {
      // shingle = tokens w..w+k-1 joined by single spaces
      var outLen = k - 1
      var j = 0
      while (j < k) { outLen += ends(w + j) - starts(w + j); j += 1 }
      val out = new Array[Byte](outLen)
      var pos = 0
      j = 0
      while (j < k) {
        if (j > 0) { out(pos) = ' '; pos += 1 }
        val tl = ends(w + j) - starts(w + j)
        System.arraycopy(b, starts(w + j), out, pos, tl)
        pos += tl
        j += 1
      }
      seen.add(UTF8String.fromBytes(out))
      w += 1
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[AnyRef]])
  }
}

/** Distinct word k-shingles of a STRING column as ARRAY<STRING>. */
case class ShingleArray(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, s"shingle size k must be >= 1: $k")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "shingle_array"

  override def nullSafeEval(v: Any): Any =
    ShingleKernel.shingleArray(v.asInstanceOf[UTF8String], k)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.ShingleKernel.shingleArray($v, $k);")

  override protected def withNewChildInternal(newChild: Expression): ShingleArray =
    copy(child = newChild)
}

/** Whitespace token count of a STRING column (size(tokens) semantics). */
case class WsTokenCount(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "ws_token_count"

  override def nullSafeEval(v: Any): Any =
    ShingleKernel.tokenCount(v.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.ShingleKernel.tokenCount($v);")

  override protected def withNewChildInternal(newChild: Expression): WsTokenCount =
    copy(child = newChild)
}

/** Column entry points for the shingling kernels. */
object ShingleFunctions {
  /** Codegen'd distinct k-shingle array (== the tokenize→window→
    * concat_ws→array_distinct Column formulation). */
  def shingleArrF(text: Column, k: Int): Column =
    shims.column(ShingleArray(shims.expression(text), k))

  /** Codegen'd whitespace token count (== size(TextFunctions.tokens)). */
  def tokenCountF(text: Column): Column =
    shims.column(WsTokenCount(shims.expression(text)))
}
