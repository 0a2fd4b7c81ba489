package graft

import graft.functions.{FloatVecDot, FloatVecHyperplaneSig}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/**
 * SparkSessionExtensions entry point: registers graft's native
 * Catalyst expressions as SQL functions, so the codegen'd kernels are
 * reachable from `spark.sql(...)` and `expr(...)` strings, not just
 * the Scala Column API:
 *
 *   SparkSession.builder().withExtensions(new GraftExtensions).getOrCreate()
 *   // or: --conf spark.sql.extensions=graft.GraftExtensions
 *
 *   SELECT graft_dot(a.embedding, b.embedding) FROM ...
 *   SELECT graft_hyperplane_sig(embedding, 24) FROM ...
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[FloatVecDot].getName, "graft_dot"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_dot(arrayFloat, arrayFloat)")
        FloatVecDot(args(0), args(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_hyperplane_sig"),
      new ExpressionInfo(classOf[FloatVecHyperplaneSig].getName, "graft_hyperplane_sig"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_hyperplane_sig(arrayFloat, nPlanes)")
        val n = args(1) match {
          case Literal(v: Int, _) => v
          case other => other.eval() match {
            case i: Int => i
            case l: Long => l.toInt
            case x => throw new IllegalArgumentException(
              s"nPlanes must be a constant integer, got $x")
          }
        }
        FloatVecHyperplaneSig(args(0), n)
      }))
  }
}
