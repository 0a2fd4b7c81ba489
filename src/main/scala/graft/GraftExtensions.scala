package graft

import graft.functions.{FloatVecDot, FloatVecHyperplaneSig, MinHashSignature, ShingleArray, WsTokenCount}
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
 *   SELECT graft_minhash(graft_shingles(text, 3), 64) FROM ...
 *   SELECT graft_token_count(text) FROM ...
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

  /** Constant-integer argument (e.g. a shingle size or permutation
    * count baked into the generated code). */
  private def constInt(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => other.eval() match {
      case i: Int => i
      case l: java.lang.Long => l.toInt
      case x => throw new IllegalArgumentException(
        s"$what must be a constant integer, got $x")
    }
  }

  private[graft] val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_dot" -> { args =>
      require(args.length == 2, "graft_dot(arrayFloat, arrayFloat)")
      FloatVecDot(args(0), args(1))
    },
    "graft_hyperplane_sig" -> { args =>
      require(args.length == 2, "graft_hyperplane_sig(arrayFloat, nPlanes)")
      FloatVecHyperplaneSig(args(0), constInt(args(1), "nPlanes"))
    },
    "graft_shingles" -> { args =>
      require(args.length == 2, "graft_shingles(text, k)")
      ShingleArray(args(0), constInt(args(1), "k"))
    },
    "graft_minhash" -> { args =>
      require(args.length == 2, "graft_minhash(arrayString, numPerms)")
      MinHashSignature(args(0), constInt(args(1), "numPerms"))
    },
    "graft_token_count" -> { args =>
      require(args.length == 1, "graft_token_count(text)")
      WsTokenCount(args(0))
    })

  /** Register the functions on an already-running session — for when
    * the session builder isn't yours to extend. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    builders.foreach { case (name, b) =>
      org.apache.spark.sql.graft.shims.registerTempFunction(spark, name, b)
    }
}
