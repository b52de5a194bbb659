package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{DotProduct, WinnowFingerprints}

/** Session extensions wiring graft's native expressions into any
  * SparkSession at construction — the production path for custom
  * Catalyst code:
  *
  * {{{
  * spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  * // or
  * SparkSession.builder().withExtensions(new GraftExtensions()(_))
  * }}}
  *
  * (`VectorExpressions.register` remains as the imperative per-session
  * alternative used by the query library itself.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (exprs: Seq[Expression]) => DotProduct(exprs(0), exprs(1))))
    ext.injectFunction((
      new FunctionIdentifier("graft_winnow"),
      new ExpressionInfo(classOf[WinnowFingerprints].getName, "graft_winnow"),
      (exprs: Seq[Expression]) => WinnowFingerprints(exprs.head)))
    ext.injectOptimizerRule(_ => graft.plans.RewriteHofDotProduct)
    ext.injectPlannerStrategy(_ => graft.plans.GraftStrategies)
  }
}
