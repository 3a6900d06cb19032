package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.{GramUtil, IpUtil, LevUtil, ZOrderUtil}

/** Randomized validation of the custom codegen'd kernels against
  * naive references — the merge scans, IP codecs, Morton interleave,
  * and banded Levenshtein each carry hand-written loop invariants a
  * fixed fixture can't exercise; a SEEDED generator drives them
  * across the input space (deterministic: same cases every run). No
  * SparkSession needed — these are the raw JVM kernels the Catalyst
  * expressions call.
  */
class KernelPropertySpec extends AnyFunSuite {

  private val Cases = 500

  private def strArr(xs: Seq[String]) =
    new GenericArrayData(xs.map(UTF8String.fromString).toArray[Any])
  private def longArr(xs: Seq[Long]) =
    new GenericArrayData(xs.toArray[Any])

  private def tokens(rnd: scala.util.Random): Seq[String] =
    Seq.fill(rnd.nextInt(30))(
      Seq.fill(3)(('a' + rnd.nextInt(6)).toChar).mkString)

  test("overlapSorted == exact set intersection on random token sets") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to Cases) {
      val sa = tokens(rnd).distinct.sorted
      val sb = tokens(rnd).distinct.sorted
      val expected = (sa.toSet intersect sb.toSet).size.toLong
      assert(GramUtil.overlapSorted(strArr(sa), strArr(sb)) == expected)
    }
  }

  test("overlapSortedLong == exact set intersection on random long sets") {
    val rnd = new scala.util.Random(43)
    for (_ <- 1 to Cases) {
      // small value range forces collisions; full range exercises sign
      val range = if (rnd.nextBoolean()) 40L else Long.MaxValue
      def draw() = Seq.fill(rnd.nextInt(30))(
        rnd.nextLong() % range).distinct.sorted
      val (sa, sb) = (draw(), draw())
      val expected = (sa.toSet intersect sb.toSet).size.toLong
      assert(GramUtil.overlapSortedLong(longArr(sa), longArr(sb)) == expected)
    }
  }

  test("jaccardSorted == |intersection|/|union| on random token sets") {
    val rnd = new scala.util.Random(44)
    for (_ <- 1 to Cases) {
      val sa = tokens(rnd).distinct.sorted
      val sb = tokens(rnd).distinct.sorted
      if (sa.nonEmpty || sb.nonEmpty) {
        val inter = (sa.toSet intersect sb.toSet).size
        val union = (sa.toSet union sb.toSet).size
        assert(GramUtil.jaccardSorted(strArr(sa), strArr(sb)) ==
          inter.toDouble / union)
      }
    }
  }

  test("ip4 aton/ntoa round-trips across the unsigned 32-bit space") {
    val rnd = new scala.util.Random(45)
    val edge = Seq(0L, 1L, 0x7fffffffL, 0x80000000L, 0xffffffffL,
      0x0a000001L, 0xc0a80101L)
    for (v <- edge ++ Seq.fill(Cases)(rnd.nextLong() & 0xffffffffL)) {
      assert(IpUtil.aton(IpUtil.ntoa(v)) == v, s"v=$v")
    }
  }

  test("ip4 inCidr == numeric prefix compare for every prefix length") {
    val rnd = new scala.util.Random(46)
    for (_ <- 1 to Cases) {
      val ip = rnd.nextLong() & 0xffffffffL
      // half the cases share the base's high bits so positives occur
      val base = if (rnd.nextBoolean()) rnd.nextLong() & 0xffffffffL
        else ip ^ (rnd.nextLong() & 0xffffL)
      val len = rnd.nextInt(33)
      val mask = if (len == 0) 0L else (0xffffffffL << (32 - len)) & 0xffffffffL
      val expected = (ip & mask) == (base & mask)
      val cidr = UTF8String.fromString(s"${IpUtil.ntoa(base)}/$len")
      assert(IpUtil.inCidr(IpUtil.ntoa(ip), cidr) == expected,
        s"ip=${IpUtil.ntoa(ip)} cidr=$cidr")
    }
  }

  test("Morton interleave2 de-interleaves back to its inputs") {
    val rnd = new scala.util.Random(47)
    val bits = 20
    for (_ <- 1 to Cases) {
      val x = rnd.nextLong() & ((1L << bits) - 1)
      val y = rnd.nextLong() & ((1L << bits) - 1)
      val z = ZOrderUtil.interleave2(x, y, bits)
      var rx = 0L; var ry = 0L
      for (i <- 0 until bits) {
        rx |= ((z >>> (2 * i)) & 1L) << i
        ry |= ((z >>> (2 * i + 1)) & 1L) << i
      }
      assert(rx == x && ry == y, s"x=$x y=$y z=$z")
    }
  }

  test("Morton key is monotone in each coordinate with the other fixed") {
    val rnd = new scala.util.Random(48)
    val bits = 16
    for (_ <- 1 to Cases) {
      val x = rnd.nextLong() & ((1L << bits) - 2)
      val y = rnd.nextLong() & ((1L << bits) - 1)
      assert(ZOrderUtil.interleave2(x, y, bits) <
        ZOrderUtil.interleave2(x + 1, y, bits))
      assert(ZOrderUtil.interleave2(y, x, bits) <
        ZOrderUtil.interleave2(y, x + 1, bits))
    }
  }

  test("banded Levenshtein == classic DP inside the band, -1 outside") {
    def classic(s: String, t: String): Int = {
      val d = Array.tabulate(s.length + 1, t.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to s.length; j <- 1 to t.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (s(i - 1) == t(j - 1)) 0 else 1))
      d(s.length)(t.length)
    }
    val rnd = new scala.util.Random(49)
    for (_ <- 1 to Cases) {
      def draw() = Seq.fill(rnd.nextInt(13))(
        ('a' + rnd.nextInt(3)).toChar).mkString
      val (s, t) = (draw(), draw())
      val k = rnd.nextInt(7)
      val exact = classic(s, t)
      val got = LevUtil.banded(
        UTF8String.fromString(s), UTF8String.fromString(t), k)
      if (exact <= k) assert(got == exact, s"'$s' vs '$t' k=$k")
      else assert(got == -1, s"'$s' vs '$t' k=$k: got $got, exact $exact")
    }
  }
}
