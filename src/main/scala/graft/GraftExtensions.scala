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
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.builders.foreach { case (name, b) =>
      ext.injectFunction((
        new FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name),
        b))
    }
}

object GraftExtensions {

  private[graft] val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_dot" -> { args =>
      require(args.length == 2, "graft_dot(arrayFloat, arrayFloat)")
      FloatVecDot(args(0), args(1))
    },
    "graft_hyperplane_sig" -> { args =>
      require(args.length == 2, "graft_hyperplane_sig(arrayFloat, nPlanes)")
      val n = args(1) match {
        case Literal(v: Int, _) => v
        case other => other.eval() match {
          case i: Int => i
          case l: java.lang.Long => l.toInt
          case x => throw new IllegalArgumentException(
            s"nPlanes must be a constant integer, got $x")
        }
      }
      FloatVecHyperplaneSig(args(0), n)
    })

  /** Register the functions on an already-running session — for when
    * the session builder isn't yours to extend. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    builders.foreach { case (name, b) =>
      org.apache.spark.sql.graft.shims.registerTempFunction(spark, name, b)
    }
}
