package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.{Ip6Util, Ip6Funcs}
import Ip6Funcs._

class Ip6FuncsSpec extends SparkSpecBase {

  private def atonHex(s: String): String = {
    val b = Ip6Util.aton(UTF8String.fromString(s))
    if (b == null) null else b.map("%02x".format(_)).mkString
  }

  test("aton parses full, compressed, and v4-embedded forms") {
    assert(atonHex("2001:db8::1") === "20010db8000000000000000000000001")
    assert(atonHex("2001:0db8:0000:0000:0000:0000:0000:0001") ===
      "20010db8000000000000000000000001")
    assert(atonHex("::") === "0" * 32)
    assert(atonHex("::1") === "0" * 31 + "1")
    assert(atonHex("1::") === "0001" + "0" * 28)
    assert(atonHex("1:2:3:4:5:6:7:8") === "00010002000300040005000600070008")
    assert(atonHex("::ffff:192.168.1.1") === "00000000000000000000ffffc0a80101")
    assert(atonHex("FE80::A") === "fe80000000000000000000000000000a") // case-insensitive
  }

  test("aton rejects malformed input") {
    for (bad <- Seq("", ":", ":::", "1::2::3", "12345::", "g::1", "1:2:3",
        "1:2:3:4:5:6:7:8:9", "1:2:3:4:5:6:7:8::", "::1.2.3.999",
        "1.2.3.4", "2001:db8::1%eth0 ", "2001:db8: :1",
        "1.2.3.4::", "1.2.3.4::5", "::1.2.3.4:5"))
      assert(atonHex(bad) === null, s"accepted malformed: '$bad'")
  }

  test("ntoa emits RFC 5952 canonical text (roundtrip)") {
    def canon(s: String): String = {
      val r = Ip6Util.ntoa(Ip6Util.aton(UTF8String.fromString(s)))
      if (r == null) null else r.toString
    }
    assert(canon("2001:0DB8:0:0:0:0:0:1") === "2001:db8::1")
    assert(canon("::") === "::")
    assert(canon("0:0:0:0:0:0:0:1") === "::1")
    assert(canon("1:0:0:0:0:0:0:0") === "1::")
    assert(canon("1:0:0:1:0:0:0:1") === "1:0:0:1::1") // leftmost-longest run
    assert(canon("1:0:1:0:1:0:1:0") === "1:0:1:0:1:0:1:0") // no run >= 2
    assert(canon("2001:db8::192.168.1.1") === "2001:db8::c0a8:101")
  }

  test("inCidr covers edge prefix lengths") {
    def in(ip: String, cidr: String): Boolean =
      Ip6Util.inCidr(UTF8String.fromString(ip), UTF8String.fromString(cidr))
    assert(in("2001:db8:2a::1", "2001:db8:2a::/48"))
    assert(!in("2001:db8:2b::1", "2001:db8:2a::/48"))
    assert(in("ffff::", "::/0"))         // /0 matches everything
    assert(in("8000::", "8000::/1"))
    assert(!in("7fff::", "8000::/1"))
    assert(in("::1", "::1/128"))
    assert(!in("::2", "::1/128"))
    assert(in("2001:db8::ff", "2001:db8::80/121")) // non-byte-aligned
    assert(!in("2001:db8::7f", "2001:db8::80/121"))
    assert(!in("not-an-ip", "2001:db8::/32"))
    assert(!in("2001:db8::1", "nonsense/99"))
  }

  test("null and malformed semantics through the Column API") {
    import spark.implicits._
    val df = Seq(Some("2001:db8:2a::1f"), Some("not-an-ip"), None).toDF("ip")
      .select(
        ip6_in_cidr($"ip", lit("2001:db8:2a::/48")).as("m"),
        ip6_ntoa(ip6_aton($"ip")).as("c"))
    val rows = df.collect()
    assert(rows(0).getBoolean(0) === true && rows(0).getString(1) === "2001:db8:2a::1f")
    assert(rows(1).getBoolean(0) === false && rows(1).isNullAt(1)) // malformed: false / null
    assert(rows(2).isNullAt(0) && rows(2).isNullAt(1))             // null ip stays null
  }

  test("expressions run inside whole-stage codegen") {
    import spark.implicits._
    // range-based input so ConvertToLocalRelation can't pre-evaluate
    val df = spark.range(300)
      .select(concat(lit("2001:db8:2a::"), lower(hex($"id"))).as("ip"))
      .where(ip6_in_cidr($"ip", lit("2001:db8:2a::/48")))
      .select(ip6_ntoa(ip6_aton($"ip")).as("c"))
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(p.contains("codegen id"), s"ip6 exprs fell out of codegen:\n$p")
    assert(df.count() === 300)
    assert(df.orderBy($"c").head().getString(0) === "2001:db8:2a::")
  }

  test("fuzz: ntoa->aton roundtrips for 10k random addresses (seeded)") {
    val rnd = new scala.util.Random(42)
    for (_ <- 0 until 10000) {
      val b = new Array[Byte](16)
      rnd.nextBytes(b)
      // bias toward zero runs so compression paths get exercised
      if (rnd.nextInt(3) == 0) {
        val start = rnd.nextInt(8); val len = rnd.nextInt(8 - start) + 1
        java.util.Arrays.fill(b, start * 2, (start + len) * 2, 0.toByte)
      }
      val text = Ip6Util.ntoa(b)
      val back = Ip6Util.aton(text)
      assert(back != null && java.util.Arrays.equals(back, b),
        s"roundtrip failed for ${text}")
    }
  }

  test("fuzz: v4 aton<->ntoa roundtrips for all /16 boundaries + random") {
    import graft.functions.IpUtil
    val rnd = new scala.util.Random(7)
    for (_ <- 0 until 10000) {
      val v = rnd.nextLong() & 0xffffffffL
      assert(IpUtil.aton(IpUtil.ntoa(v)) === v)
    }
  }

  test("SQL surface: ip6 functions registered via extensions") {
    assert(spark.sql(
      "SELECT ip6_in_cidr('2001:db8::1', '2001:db8::/32')").head().getBoolean(0))
    assert(spark.sql("SELECT ip6_ntoa(ip6_aton('2001:0DB8::0001'))")
      .head().getString(0) === "2001:db8::1")
  }

  test("ip6_net masks host bits at byte, nibble, and zero grain") {
    def netHex(s: String, bits: Int): String = {
      val b = Ip6Util.net(UTF8String.fromString(s), bits)
      if (b == null) null else b.map("%02x".format(_)).mkString
    }
    // /48: whole-group boundary
    assert(netHex("2001:db8:2a::1f3c", 48) === atonHex("2001:db8:2a::"))
    // /116: mid-byte boundary — keeps the interface group's top nibble
    assert(netHex("2001:db8:2a::1f3c", 116) === atonHex("2001:db8:2a::1000"))
    // /0 and /128 degenerate ends
    assert(netHex("2001:db8:2a::1f3c", 0) === "0" * 32)
    assert(netHex("2001:db8:2a::1f3c", 128) === atonHex("2001:db8:2a::1f3c"))
    // null on malformed address / out-of-range bits
    assert(netHex("not-an-address", 48) === null)
    assert(netHex("2001:db8::1", 129) === null)
    // a masked network is inside its own CIDR and the mask is idempotent
    assert(java.util.Arrays.equals(
      Ip6Util.net(UTF8String.fromString("2001:db8:2a::1f3c"), 116),
      Ip6Util.net(UTF8String.fromString("2001:db8:2a::1000"), 116)))
    // SQL surface
    assert(spark.sql("SELECT ip6_ntoa(ip6_net('2001:db8:2a::1f3c', 116))")
      .head().getString(0) === "2001:db8:2a::1000")
  }

  test("fuzz: ip6_net is idempotent and consistent with CIDR containment") {
    val rnd = new scala.util.Random(11)
    for (_ <- 0 until 2000) {
      val addr = Array.fill(8)(rnd.nextInt(0x10000))
        .map(g => f"$g%x").mkString(":")
      val bits = rnd.nextInt(129)
      val net = Ip6Util.net(UTF8String.fromString(addr), bits)
      assert(net != null, s"$addr/$bits")
      // the address is inside its own /bits network
      assert(Ip6Util.matchesPrefix(
        Ip6Util.aton(UTF8String.fromString(addr)), net, bits), s"$addr/$bits")
      // masking the masked form changes nothing
      assert(java.util.Arrays.equals(net, Ip6Util.net(Ip6Util.ntoa(net), bits)),
        s"not idempotent at $addr/$bits")
      // agrees with the containment expression on the same prefix
      assert(Ip6Util.inCidr(UTF8String.fromString(addr),
        UTF8String.fromString(s"${Ip6Util.ntoa(net)}/$bits")), s"$addr/$bits")
    }
  }
}
