package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SQL-surface registration for graft's native expressions, so
  * `spark.sql("SELECT ip4_aton(sa) ...")` works like any built-in —
  * either per-session ([[register]]) or cluster-wide via
  * `spark.sql.extensions=graft.functions.GraftExtensions`.
  */
object GraftFunctions {

  private def intArg(e: Expression, fn: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$fn expects a literal integer, got $other")
  }

  val all: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "ip4_aton" -> (e => Ip4Aton(e.head)),
    "ip4_ntoa" -> (e => Ip4Ntoa(e.head)),
    "ip4_in_cidr" -> (e => Ip4InCidr(e(0), e(1))),
    "ip4_is_private" -> (e => Ip4IsPrivate(e.head)),
    "topk_agg" -> (e => TopKAgg(e(0), intArg(e(1), "topk_agg"))
      .toAggregateExpression()))

  /** Session-scoped registration (temp functions). */
  def register(spark: SparkSession): Unit =
    all.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
}

/** `spark.sql.extensions` entry point: SQL functions + the CIDR
  * literal-folding optimizer rule.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    GraftFunctions.all.foreach { case (name, builder) =>
      e.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft.functions.GraftFunctions", name),
        builder))
    }
    e.injectOptimizerRule(_ => graft.plans.FoldCidrLiteral)
  }
}
