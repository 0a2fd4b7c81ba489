package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.graft.shims
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/**
 * Native MinHash signature kernel: all `numPerms` element-wise minima
 * of seeded xxhash64 over a document's shingle array, in ONE codegen'd
 * loop per row.
 *
 * Why not the aggregate formulation? `min(xxhash64(lit(p), shingle))`
 * × 64 over exploded shingles is correct (and was the round-3/4 shape)
 * but pays per exploded row: 64 separate expression trees, each
 * re-hashing the permutation index (`hashInt(p, 42)` is NOT constant-
 * folded inside XxHash64) before hashing the string, plus 64 agg-buffer
 * updates — and it forces the explode → groupBy(id) aggregation
 * just to get signatures. This kernel hoists the 64 per-permutation
 * seeds into a constant table and runs one tight JIT loop over the
 * per-document shingle ARRAY — no explode, no aggregation, scan-side.
 *
 * Bit-compatibility contract: output[p] == min over shingles s of
 * `xxhash64(lit(p), s)` exactly (seed chain: 42 → hashInt(p) →
 * hashUTF8String(s)), asserted element-for-element in PipelineSpec —
 * so LSH bucketing, candidate sets, and every oracle downstream are
 * unchanged. A null array element contributes the bare seed, exactly
 * as `xxhash64(lit(p), NULL)` leaves the running hash untouched.
 *
 * Empty arrays yield all-Long.MaxValue signatures (the neutral min);
 * callers drop empty shingle sets first — matching the aggregate
 * formulation, where a document with no rows simply never appears.
 */
case class MinHashSignature(child: Expression, numPerms: Int)
    extends UnaryExpression {

  require(numPerms >= 1 && numPerms <= 512, s"numPerms $numPerms out of [1,512]")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash_signature"

  // xxhash64(lit(p), s) chains seed 42 through hashInt(p) first; that
  // prefix is per-permutation constant, so it is the effective seed.
  private lazy val seeds: Array[Long] =
    Array.tabulate(numPerms)(p => XXH64.hashInt(p, 42L))

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val mins = Array.fill(numPerms)(Long.MaxValue)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) {
        var p = 0
        while (p < numPerms) {
          if (seeds(p) < mins(p)) mins(p) = seeds(p)
          p += 1
        }
      } else {
        val s = arr.getUTF8String(i)
        var p = 0
        while (p < numPerms) {
          val h = XXH64.hashUTF8String(s, seeds(p))
          if (h < mins(p)) mins(p) = h
          p += 1
        }
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(mins)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val seedsRef = ctx.addReferenceObj("mhSeeds", seeds, "long[]")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val p = ctx.freshName("p")
      val h = ctx.freshName("h")
      val s = ctx.freshName("s")
      val mins = ctx.freshName("mins")
      s"""
         |final int $n = $v.numElements();
         |final long[] $mins = new long[$numPerms];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($v.isNullAt($i)) {
         |    for (int $p = 0; $p < $numPerms; $p++) {
         |      if ($seedsRef[$p] < $mins[$p]) $mins[$p] = $seedsRef[$p];
         |    }
         |  } else {
         |    final org.apache.spark.unsafe.types.UTF8String $s =
         |        $v.getUTF8String($i);
         |    for (int $p = 0; $p < $numPerms; $p++) {
         |      final long $h = org.apache.spark.sql.catalyst.expressions
         |          .XXH64.hashUTF8String($s, $seedsRef[$p]);
         |      if ($h < $mins[$p]) $mins[$p] = $h;
         |    }
         |  }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions
         |    .UnsafeArrayData.fromPrimitiveArray($mins);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

/** Column entry point for the MinHash kernel. */
object MinhashFunctions {
  /** Codegen'd MinHash signature (ARRAY<LONG>[numPerms]) of an
    * ARRAY<STRING> shingle column; element p == min(xxhash64(lit(p), s)). */
  def minhashSigF(shingles: Column, numPerms: Int): Column =
    shims.column(MinHashSignature(shims.expression(shingles), numPerms))
}
