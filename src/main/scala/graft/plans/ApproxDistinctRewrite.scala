package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, LongType}
import graft.functions.KmvSketch

/** Opt-in Catalyst rewrite: `count(DISTINCT x)` → KMV sketch estimate.
  *
  * Exact distinct counting shuffles the whole distinct key universe
  * (SCALING.md measures the curve); when an estimate is acceptable the
  * KMV aggregate ships ≤k longs per group instead. This rule makes the
  * swap session-wide and transparent — any query, SQL or DataFrame,
  * including ones the library didn't write — once the user explicitly
  * turns it on:
  *
  *   spark.conf.set("spark.graft.approxDistinct", "true")   // default off
  *   spark.conf.set("spark.graft.approxDistinct.k", "256")  // error ~1/√k
  *
  * Semantics notes (why this is safe where it applies):
  *  - below capacity (true cardinality < k) the sketch IS the distinct
  *    hash set, so the rewrite returns the exact count (modulo 64-bit→
  *    [0,P) hash collisions, ~n²/2P);
  *  - null rows are excluded exactly like Count: the hash input becomes
  *    NULL when any counted child is NULL, and the sketch skips nulls;
  *  - multi-arg count(DISTINCT a, b) hashes the tuple.
  *
  * Registered via GraftExtensions.injectOptimizerRule (config route) and
  * spark.experimental.extraOptimizations in Graft.init (programmatic
  * route). The rule is a no-op unless the conf flag is "true", so its
  * presence never changes default semantics.
  *
  * Route coverage caveat: extraOptimizations run in the TERMINAL
  * optimizer batch, after Spark's RewriteDistinctAggregates has already
  * expanded MULTI-distinct aggregates (count(DISTINCT a), count(DISTINCT
  * b) in one Aggregate) into Expand + non-distinct Counts — those fall
  * back to the exact path on the programmatic route (correct, just not
  * estimated). Single-distinct aggregates — the overwhelmingly common
  * shape — rewrite on both routes; the config route rewrites everything.
  */
object ApproxDistinctRewrite extends Rule[LogicalPlan] {

  private val P: Long = graft.extensions.TextOps.P // 1e9+7, the shared sketch modulus

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val enabled =
      try conf.getConfString("spark.graft.approxDistinct", "false").toBoolean
      catch { case _: Throwable => false }
    if (!enabled) plan
    else {
      val k =
        try conf.getConfString("spark.graft.approxDistinct.k", "256").toInt
        catch { case _: Throwable => 256 }
      plan.transform { case agg: Aggregate =>
        agg.transformExpressions {
          case AggregateExpression(Count(children), mode, true, filter, _)
              if children.nonEmpty && children.forall(_.resolved) =>
            // null → NULL hash (sketch skips it), mirroring Count's
            // exclusion of null rows
            val anyNull = children.map(IsNull).reduce[Expression](Or)
            val hash = If(
              anyNull,
              Literal.create(null, LongType),
              Pmod(new XxHash64(children), Literal(P))
            )
            val sketch =
              AggregateExpression(KmvSketch(hash, k), mode, isDistinct = false, filter, NamedExpression.newExprId)
            val sz = Size(sketch)
            // KnownNotNull: Count is non-nullable and no branch here can
            // yield null (the sketch array is non-null; element_at(s, k)
            // only evaluates when size ≥ k; h_(k) > 0 for k ≥ 2 distinct
            // non-negative hashes) — without it the rewrite would widen
            // the visible output schema to nullable.
            KnownNotNull(
              If(
                LessThan(sz, Literal(k)),
                Cast(sz, LongType),
                Cast(
                  Round(
                    Divide(
                      Literal((k - 1).toDouble * P.toDouble),
                      Cast(ElementAt(sketch, Literal(k)), DoubleType)
                    ),
                    Literal(0)
                  ),
                  LongType
                )
              )
            )
        }
      }
    }
  }
}
