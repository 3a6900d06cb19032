package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.{Bridge => ExpressionUtils}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** IPv6 runtime kernels. Netflow capture is dual-stack: the reference's
  * flow rows store `sa`/`da`/`ra` as strings and carry v6 addresses
  * whenever the exporter sees them, so a v4-only CIDR path silently
  * drops every v6 flow (aton → null). These mirror [[IpUtil]] with a
  * 16-byte binary representation.
  *
  * Static-reachable for codegen ([[Ip6Aton.doGenCode]] etc.).
  */
object Ip6Util {

  private def hexVal(c: Char): Int =
    if (c >= '0' && c <= '9') c - '0'
    else if (c >= 'a' && c <= 'f') c - 'a' + 10
    else if (c >= 'A' && c <= 'F') c - 'A' + 10
    else -1

  /** One hex group "0".."ffff" → 0..65535, or -1. */
  private def parseGroup(s: String): Int = {
    if (s.isEmpty || s.length > 4) return -1
    var v = 0; var i = 0
    while (i < s.length) {
      val h = hexVal(s.charAt(i))
      if (h < 0) return -1
      v = (v << 4) | h
      i += 1
    }
    v
  }

  /** Full/compressed IPv6 (incl. trailing dotted-quad v4 suffix) →
    * 16-byte array; null for malformed. Strict: no zone index, no
    * surrounding whitespace.
    */
  def aton(s: UTF8String): Array[Byte] = {
    if (s == null) return null
    val str = s.toString
    if (str.isEmpty) return null
    val dcol = str.indexOf("::")
    if (dcol >= 0 && str.indexOf("::", dcol + 1) >= 0) return null // two "::"
    val (leftStr, rightStr, compressed) =
      if (dcol >= 0) (str.substring(0, dcol), str.substring(dcol + 2), true)
      else (str, "", false)

    def parseSide(side: String, allowV4Tail: Boolean): Array[Int] = {
      if (side.isEmpty) return Array.emptyIntArray
      val toks = side.split(":", -1)
      val out = new scala.collection.mutable.ArrayBuffer[Int](toks.length + 1)
      var i = 0
      while (i < toks.length) {
        val t = toks(i)
        if (t.indexOf('.') >= 0) {
          // embedded IPv4 is only legal in the LAST 32 bits of the
          // ADDRESS — i.e. the final token of the side that ends the
          // address ("1.2.3.4::x" is malformed, "::ffff:1.2.3.4" is not)
          if (!allowV4Tail || i != toks.length - 1) return null
          val v4 = IpUtil.aton(UTF8String.fromString(t))
          if (v4 < 0) return null
          out += ((v4 >> 16) & 0xffff).toInt
          out += (v4 & 0xffff).toInt
        } else {
          val g = parseGroup(t)
          if (g < 0) return null
          out += g
        }
        i += 1
      }
      out.toArray
    }

    val left = parseSide(leftStr, allowV4Tail = !compressed)
    if (left == null) return null
    val right = parseSide(rightStr, allowV4Tail = true)
    if (right == null) return null
    val n = left.length + right.length
    if (compressed && n >= 8) return null  // "::" must cover >= 1 group
    if (!compressed && n != 8) return null
    val groups = new Array[Int](8)
    var i = 0
    while (i < left.length) { groups(i) = left(i); i += 1 }
    val off = 8 - right.length
    i = 0
    while (i < right.length) { groups(off + i) = right(i); i += 1 }
    val b = new Array[Byte](16)
    i = 0
    while (i < 8) {
      b(2 * i) = ((groups(i) >> 8) & 0xff).toByte
      b(2 * i + 1) = (groups(i) & 0xff).toByte
      i += 1
    }
    b
  }

  /** 16 bytes → RFC 5952 canonical text: lowercase, no leading zeros,
    * longest (leftmost on ties) run of >= 2 zero groups compressed.
    */
  def ntoa(b: Array[Byte]): UTF8String = {
    if (b == null || b.length != 16) return null
    val g = new Array[Int](8)
    var i = 0
    while (i < 8) {
      g(i) = ((b(2 * i) & 0xff) << 8) | (b(2 * i + 1) & 0xff)
      i += 1
    }
    // longest zero run
    var bestStart = -1; var bestLen = 0
    var runStart = -1; var runLen = 0
    i = 0
    while (i < 8) {
      if (g(i) == 0) {
        if (runStart < 0) { runStart = i; runLen = 0 }
        runLen += 1
        if (runLen > bestLen) { bestLen = runLen; bestStart = runStart }
      } else { runStart = -1; runLen = 0 }
      i += 1
    }
    if (bestLen < 2) { bestStart = -1; bestLen = 0 } // single zero not compressed
    val sb = new java.lang.StringBuilder(41)
    i = 0
    while (i < 8) {
      if (i == bestStart) {
        sb.append("::")
        i += bestLen
      } else {
        if (sb.length > 0 && sb.charAt(sb.length - 1) != ':') sb.append(':')
        sb.append(java.lang.Integer.toHexString(g(i)))
        i += 1
      }
    }
    if (bestStart == 0 && bestLen == 8) return UTF8String.fromString("::")
    UTF8String.fromString(sb.toString)
  }

  /** ip starts with the first `bits` bits of `base`. */
  def matchesPrefix(ip: Array[Byte], base: Array[Byte], bits: Int): Boolean = {
    if (ip == null || base == null) return false
    val full = bits / 8
    var i = 0
    while (i < full) {
      if (ip(i) != base(i)) return false
      i += 1
    }
    val rem = bits % 8
    if (rem == 0) return true
    val mask = (0xff << (8 - rem)) & 0xff
    (ip(full) & mask) == (base(full) & mask)
  }

  /** Parse "addr/bits" → (base bytes, bits); null for malformed. */
  def parseCidr(cidr: UTF8String): (Array[Byte], Int) = {
    if (cidr == null) return null
    val c = cidr.toString
    val slash = c.indexOf('/')
    if (slash < 0) return null
    val base = aton(UTF8String.fromString(c.substring(0, slash)))
    if (base == null) return null
    val bits =
      try c.substring(slash + 1).toInt
      catch { case _: NumberFormatException => return null }
    if (bits < 0 || bits > 128) return null
    (base, bits)
  }

  /** ip ∈ CIDR, both strings. False on malformed (non-null) input. */
  def inCidr(ip: UTF8String, cidr: UTF8String): Boolean = {
    val parsed = parseCidr(cidr)
    if (parsed == null) return false
    matchesPrefix(aton(ip), parsed._1, parsed._2)
  }

  /** The literal-CIDR fast path: base/bits parsed once at plan time. */
  def inCidrPre(ip: UTF8String, base: Array[Byte], bits: Int): Boolean =
    matchesPrefix(aton(ip), base, bits)

  /** aton + host bits zeroed: the address's /bits network, the LPM
    * join key (v6 twin of the v4 path's `aton & mask` longs). Null on
    * malformed address or out-of-range bits.
    */
  def net(ip: UTF8String, bits: Int): Array[Byte] = {
    if (bits < 0 || bits > 128) return null
    val b = aton(ip)
    if (b == null) return null
    val full = bits / 8
    val rem = bits % 8
    if (rem != 0) b(full) = (b(full) & ((0xff << (8 - rem)) & 0xff)).toByte
    var i = full + (if (rem == 0) 0 else 1)
    while (i < 16) { b(i) = 0; i += 1 }
    b
  }
}

/** `ip6_aton(s)` — IPv6 text → 16-byte binary, null on malformed. */
case class Ip6Aton(child: Expression) extends UnaryExpression with RequiresTypes {
  override protected def required = Seq(child -> StringType)
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true
  override def nullSafeEval(v: Any): Any =
    Ip6Util.aton(v.asInstanceOf[UTF8String])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val c = child.genCode(ctx)
    ev.copy(code =
      code"""
            |${c.code}
            |byte[] ${ev.value} = null;
            |boolean ${ev.isNull} = ${c.isNull};
            |if (!${ev.isNull}) {
            |  ${ev.value} = graft.functions.Ip6Util.aton(${c.value});
            |  if (${ev.value} == null) ${ev.isNull} = true;
            |}
            |""".stripMargin)
  }
  override protected def withNewChildInternal(c: Expression): Ip6Aton = copy(c)
}

/** `ip6_ntoa(b)` — 16-byte binary → RFC 5952 canonical text. */
case class Ip6Ntoa(child: Expression) extends UnaryExpression with RequiresTypes {
  override protected def required = Seq(child -> BinaryType)
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true
  override def nullSafeEval(v: Any): Any =
    Ip6Util.ntoa(v.asInstanceOf[Array[Byte]])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val c = child.genCode(ctx)
    ev.copy(code =
      code"""
            |${c.code}
            |UTF8String ${ev.value} = null;
            |boolean ${ev.isNull} = ${c.isNull};
            |if (!${ev.isNull}) {
            |  ${ev.value} = graft.functions.Ip6Util.ntoa(${c.value});
            |  if (${ev.value} == null) ${ev.isNull} = true;
            |}
            |""".stripMargin)
  }
  override protected def withNewChildInternal(c: Expression): Ip6Ntoa = copy(c)
}

/** `ip6_in_cidr(ip, cidr)` — v6 CIDR containment on strings. When the
  * CIDR is a literal it is parsed ONCE at codegen/eval setup
  * (reference object / transient lazy), not per row — the same
  * optimization [[graft.plans.FoldCidrLiteral]] gives the v4 path, done
  * here without a separate rule because the binary base has no
  * column-level bitwise form to fold to.
  */
case class Ip6InCidr(left: Expression, right: Expression)
    extends BinaryExpression with RequiresTypes {
  override protected def required = Seq(left -> StringType, right -> StringType)
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true

  @transient private lazy val preParsed: Option[(Array[Byte], Int)] =
    if (right.foldable) {
      val v = right.eval()
      if (v == null) None
      else Option(Ip6Util.parseCidr(v.asInstanceOf[UTF8String]))
    } else None

  override def nullSafeEval(ip: Any, cidr: Any): Any = preParsed match {
    case Some((base, bits)) =>
      Ip6Util.inCidrPre(ip.asInstanceOf[UTF8String], base, bits)
    case None =>
      Ip6Util.inCidr(ip.asInstanceOf[UTF8String], cidr.asInstanceOf[UTF8String])
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    preParsed match {
      case Some((base, bits)) =>
        val baseRef = ctx.addReferenceObj("cidrBase", base, "byte[]")
        defineCodeGen(ctx, ev, (a, _) =>
          s"graft.functions.Ip6Util.inCidrPre($a, $baseRef, $bits)")
      case None =>
        defineCodeGen(ctx, ev, (a, b) =>
          s"graft.functions.Ip6Util.inCidr($a, $b)")
    }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Ip6InCidr =
    copy(l, r)
}

/** `ip6_net(ip, bits)` — the address's /bits network as 16-byte binary
  * (host bits zeroed): the per-mask-length LPM join key. BinaryType
  * equality is hash-join-able, so a routing dim's mask lengths each
  * cost one broadcast join on this key — the v6 twin of the v4 LPM
  * chain's `ip4_aton(a) & mask` long keys.
  */
case class Ip6Net(left: Expression, right: Expression)
    extends BinaryExpression with RequiresTypes {
  override protected def required = Seq(left -> StringType, right -> IntegerType)
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true
  override def nullSafeEval(ip: Any, bits: Any): Any =
    Ip6Util.net(ip.asInstanceOf[UTF8String], bits.asInstanceOf[Int])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val l = left.genCode(ctx)
    val r = right.genCode(ctx)
    ev.copy(code =
      code"""
            |${l.code}
            |${r.code}
            |byte[] ${ev.value} = null;
            |boolean ${ev.isNull} = ${l.isNull} || ${r.isNull};
            |if (!${ev.isNull}) {
            |  ${ev.value} = graft.functions.Ip6Util.net(${l.value}, ${r.value});
            |  if (${ev.value} == null) ${ev.isNull} = true;
            |}
            |""".stripMargin)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Ip6Net =
    copy(l, r)
}

object Ip6Funcs {
  def ip6_aton(c: Column): Column =
    ExpressionUtils.column(Ip6Aton(ExpressionUtils.expression(c)))
  def ip6_ntoa(c: Column): Column =
    ExpressionUtils.column(Ip6Ntoa(ExpressionUtils.expression(c)))
  def ip6_in_cidr(ip: Column, cidr: Column): Column =
    ExpressionUtils.column(Ip6InCidr(ExpressionUtils.expression(ip), ExpressionUtils.expression(cidr)))
  def ip6_net(ip: Column, bits: Column): Column =
    ExpressionUtils.column(Ip6Net(ExpressionUtils.expression(ip), ExpressionUtils.expression(bits)))
}
