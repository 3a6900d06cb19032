package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, BinaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.{Bridge => ExpressionUtils}
import org.apache.spark.sql.types.{BooleanType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Runtime helpers for the IP expressions. Kept as a plain object with
  * JVM-static-reachable methods so generated code can call them
  * directly ([[Ip4Aton.doGenCode]] etc.) — the expressions stay inside
  * whole-stage codegen instead of falling back to interpreted eval.
  *
  * Capability source: the reference's flow rows carry dotted-quad
  * `sa`/`da`/`ra` strings (ClickHouse `nflows` schema); ClickHouse users
  * lean on IPv4StringToNum/IPv4NumToString-style functions for CIDR
  * filtering. Reconstructed from the project README/schema (upstream
  * moved; mirror at /root/reference holds only the stub README).
  */
object IpUtil {
  /** Dotted-quad → uint32-as-long; -1 for malformed (mapped to null). */
  def aton(s: UTF8String): Long = {
    val str = s.toString
    var acc = 0L; var octet = -1L; var octets = 0; var i = 0
    while (i < str.length) {
      val c = str.charAt(i)
      if (c == '.') {
        if (octet < 0 || octet > 255 || octets >= 3) return -1L
        acc = (acc << 8) | octet; octet = -1; octets += 1
      } else if (c >= '0' && c <= '9') {
        octet = (if (octet < 0) 0L else octet) * 10 + (c - '0')
        if (octet > 255) return -1L
      } else return -1L
      i += 1
    }
    if (octet < 0 || octets != 3) return -1L
    (acc << 8) | octet
  }

  def ntoa(v: Long): UTF8String = UTF8String.fromString(
    s"${(v >> 24) & 255}.${(v >> 16) & 255}.${(v >> 8) & 255}.${v & 255}")

  /** ip ∈ CIDR block, both as strings ("10.1.2.3", "10.0.0.0/8"). */
  def inCidr(ip: UTF8String, cidr: UTF8String): Boolean = {
    val c = cidr.toString
    val slash = c.indexOf('/')
    if (slash < 0) return false
    val base = aton(UTF8String.fromString(c.substring(0, slash)))
    val ipv = aton(ip)
    if (base < 0 || ipv < 0) return false
    val bits = try c.substring(slash + 1).toInt catch { case _: NumberFormatException => return false }
    if (bits < 0 || bits > 32) return false
    val mask = if (bits == 0) 0L else (0xffffffffL << (32 - bits)) & 0xffffffffL
    (ipv & mask) == (base & mask)
  }

  def isPrivate(v: Long): Boolean =
    (v >= 0x0a000000L && v <= 0x0affffffL) ||     // 10/8
    (v >= 0xac100000L && v <= 0xac1fffffL) ||     // 172.16/12
    (v >= 0xc0a80000L && v <= 0xc0a8ffffL)        // 192.168/16

  def isPrivateStr(s: UTF8String): Boolean = {
    val n = aton(s)
    n >= 0 && isPrivate(n)
  }
}

/** Analysis-time input validation through the public
  * `checkInputDataTypes` hook (the `ExpectsInputTypes` trait is
  * `private[sql]`-typed in Spark 4): wrong-typed SQL arguments fail at
  * plan time instead of as runtime ClassCastExceptions mid-job.
  */
trait RequiresTypes extends Expression {
  protected def required: Seq[(Expression, DataType)]
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    required.collectFirst {
      case (e, t) if e.dataType != t =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects ${t.sql}, got ${e.dataType.sql}")
    }.getOrElse(TypeCheckResult.TypeCheckSuccess)
  }
}

/** `ip4_aton(sa)` — dotted-quad string → long, null on malformed. */
case class Ip4Aton(child: Expression) extends UnaryExpression with RequiresTypes {
  override protected def required = Seq(child -> StringType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true
  override def nullSafeEval(v: Any): Any = {
    val r = IpUtil.aton(v.asInstanceOf[UTF8String])
    if (r < 0) null else java.lang.Long.valueOf(r)
  }
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val c = child.genCode(ctx)
    ev.copy(code =
      code"""
            |${c.code}
            |long ${ev.value} = -1L;
            |boolean ${ev.isNull} = ${c.isNull};
            |if (!${ev.isNull}) {
            |  ${ev.value} = graft.functions.IpUtil.aton(${c.value});
            |  if (${ev.value} < 0) ${ev.isNull} = true;
            |}
            |""".stripMargin)
  }
  override protected def withNewChildInternal(c: Expression): Ip4Aton = copy(c)
}

/** `ip4_ntoa(x)` — long → dotted-quad string. */
case class Ip4Ntoa(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (child.dataType == LongType || child.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"ip4_ntoa expects BIGINT or INT, got ${child.dataType.sql}")
  }
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  // SQL integer literals arrive as Int in interpreted eval (codegen's
  // call site widens implicitly) — accept any integral width.
  override def nullSafeEval(v: Any): Any =
    IpUtil.ntoa(v.asInstanceOf[Number].longValue())
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.IpUtil.ntoa($c)")
  override protected def withNewChildInternal(c: Expression): Ip4Ntoa = copy(c)
}

/** `ip4_in_cidr(ip, cidr)` — CIDR containment test on strings. */
case class Ip4InCidr(left: Expression, right: Expression)
    extends BinaryExpression with RequiresTypes {
  override protected def required = Seq(left -> StringType, right -> StringType)
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(ip: Any, cidr: Any): Any =
    IpUtil.inCidr(ip.asInstanceOf[UTF8String], cidr.asInstanceOf[UTF8String])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.IpUtil.inCidr($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Ip4InCidr =
    copy(l, r)
}

/** `ip4_is_private(ip)` — RFC1918 test. A dedicated expression rather
  * than a composition over ip4_aton: composing would inline the child
  * (and its whole defining expression chain) once per range
  * comparison — six re-evaluations per row.
  */
case class Ip4IsPrivate(child: Expression) extends UnaryExpression with RequiresTypes {
  override protected def required = Seq(child -> StringType)
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(v: Any): Any = {
    val n = IpUtil.aton(v.asInstanceOf[UTF8String])
    n >= 0 && IpUtil.isPrivate(n)
  }
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.IpUtil.isPrivateStr($c)")
  override protected def withNewChildInternal(c: Expression): Ip4IsPrivate = copy(c)
}

object IpFuncs {
  def ip4_aton(c: Column): Column = ExpressionUtils.column(Ip4Aton(ExpressionUtils.expression(c)))
  def ip4_ntoa(c: Column): Column = ExpressionUtils.column(Ip4Ntoa(ExpressionUtils.expression(c)))
  def ip4_in_cidr(ip: Column, cidr: Column): Column =
    ExpressionUtils.column(Ip4InCidr(ExpressionUtils.expression(ip), ExpressionUtils.expression(cidr)))
  def ip4_is_private(c: Column): Column =
    ExpressionUtils.column(Ip4IsPrivate(ExpressionUtils.expression(c)))
}
