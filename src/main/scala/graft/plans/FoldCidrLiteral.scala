package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{BooleanType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.{Ip4Aton, Ip4InCidr, IpUtil}

/** Optimizer rule: `ip4_in_cidr(ip, <literal cidr>)` →
  * `(ip4_aton(ip) & mask) = base` with the mask/base folded at plan
  * time — the interpreted/codegen'd runtime otherwise re-parses the
  * CIDR string once per row. Injected via
  * [[graft.functions.GraftExtensions]] (`injectOptimizerRule`).
  *
  * Null semantics preserved exactly: NULL ip stays NULL; a malformed
  * (non-null) ip yields false (aton → null → coalesce false), matching
  * [[IpUtil.inCidr]]. A malformed CIDR literal folds to
  * `If(IsNull(ip), null, false)` — the unfolded expression is
  * null-intolerant, so a NULL ip must stay NULL even when the CIDR
  * can never match.
  */
object FoldCidrLiteral extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case Ip4InCidr(ip, Literal(cidrRaw: UTF8String, StringType)) =>
      parseCidr(cidrRaw.toString) match {
        case None =>
          If(IsNull(ip), Literal(null, BooleanType), Literal(false, BooleanType))
        case Some((base, mask)) =>
          If(IsNull(ip), Literal(null, BooleanType),
            Coalesce(Seq(
              EqualTo(BitwiseAnd(Ip4Aton(ip), Literal(mask)),
                Literal(base & mask)),
              Literal(false, BooleanType))))
      }
  }

  private def parseCidr(c: String): Option[(Long, Long)] = {
    val slash = c.indexOf('/')
    if (slash < 0) return None
    val base = IpUtil.aton(UTF8String.fromString(c.substring(0, slash)))
    if (base < 0) return None
    val bits = try c.substring(slash + 1).toInt catch {
      case _: NumberFormatException => return None
    }
    if (bits < 0 || bits > 32) return None
    val mask = if (bits == 0) 0L else (0xffffffffL << (32 - bits)) & 0xffffffffL
    Some((base, mask))
  }
}
