package graft.extensions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal, Subtract, Multiply, Cast => CCast}
import org.apache.spark.sql.types.DoubleType
import graft.functions.{ArrayDot, ArrayNormSq, KmvSketch, LinRecur, PolyHash}

/** Catalyst injection point: enables the graft function surface on ANY
  * session via configuration —
  *
  *   spark.sql.extensions=graft.extensions.GraftExtensions
  *
  * — the standard deployment shape for a shared cluster (no code call to
  * Graft.init needed; SQL users get `graft_linrec`, `graft_ewm`,
  * `graft_dot`, `graft_normsq` directly). `Graft.init` remains the
  * programmatic path for sessions created without the config.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def dbl(e: Expression): Expression =
    if (e.dataType == DoubleType) e else CCast(e, DoubleType)

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(
      (
        FunctionIdentifier("graft_linrec"),
        new ExpressionInfo(classOf[LinRecur].getName, "graft_linrec"),
        (exprs: Seq[Expression]) => LinRecur(dbl(exprs(0)), dbl(exprs(1)), dbl(exprs(2)))
      )
    )
    ext.injectFunction(
      (
        FunctionIdentifier("graft_ewm"),
        new ExpressionInfo(classOf[LinRecur].getName, "graft_ewm"),
        (exprs: Seq[Expression]) => {
          val x = dbl(exprs(0)); val alpha = dbl(exprs(1))
          LinRecur(Subtract(Literal(1.0), alpha), Multiply(alpha, x), x)
        }
      )
    )
    ext.injectFunction(
      (
        FunctionIdentifier("graft_dot"),
        new ExpressionInfo(classOf[ArrayDot].getName, "graft_dot"),
        (exprs: Seq[Expression]) => ArrayDot(exprs(0), exprs(1))
      )
    )
    ext.injectFunction(
      (
        FunctionIdentifier("graft_normsq"),
        new ExpressionInfo(classOf[ArrayNormSq].getName, "graft_normsq"),
        (exprs: Seq[Expression]) => ArrayNormSq(exprs(0))
      )
    )
    ext.injectFunction(
      (
        FunctionIdentifier("graft_polyhash"),
        new ExpressionInfo(classOf[PolyHash].getName, "graft_polyhash"),
        (exprs: Seq[Expression]) => PolyHash(exprs(0))
      )
    )
    ext.injectFunction(
      (
        FunctionIdentifier("graft_kmv"),
        new ExpressionInfo(classOf[KmvSketch].getName, "graft_kmv"),
        (exprs: Seq[Expression]) => KmvSketch.fromExprs(exprs)
      )
    )
    // indicator-family SQL wrappers (graft_sma/graft_ewma/graft_hl2-class;
    // shared builder list with the programmatic Registry.register path)
    graft.functions.TaSqlSurface.builders.foreach { case (name, builder) =>
      ext.injectFunction(
        (
          FunctionIdentifier(name),
          new ExpressionInfo(classOf[graft.functions.TaSqlSurface.type].getName, name),
          builder
        )
      )
    }
    // opt-in count(DISTINCT) → KMV estimate (spark.graft.approxDistinct)
    ext.injectOptimizerRule(_ => graft.plans.ApproxDistinctRewrite)
  }
}
