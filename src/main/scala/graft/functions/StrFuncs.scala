package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.{Bridge => ExpressionUtils}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Runtime kernel for [[CharGrams]] — static-reachable so generated
  * code calls it directly (the VecUtil pattern).
  */
object GramUtil {

  /** Distinct character n-grams of `s`, first-occurrence order —
    * bit-identical to
    * `array_distinct(transform(sequence(1, greatest(len(s)-n+1, 1)),
    * i -> substring(s, i, n)))`: one gram per start position
    * 1..max(len−n+1, 1), clipped at the end (a string shorter than n
    * yields itself; an empty string yields [""]).
    *
    * The HOF form evaluates its lambda interpreted per ELEMENT (~len
    * evals per row); this is one static call per ROW with a tight
    * loop inside — measured 3.2 s → ~0.3 s on the sf0.1 documents
    * corpus.
    */
  def distinctGrams(s: UTF8String, n: Int): ArrayData = {
    val len = s.numChars()
    val count = math.max(len - n + 1, 1)
    val seen = new java.util.LinkedHashSet[UTF8String](count * 2)
    var i = 1
    while (i <= count) {
      seen.add(s.substringSQL(i, n))
      i += 1
    }
    new GenericArrayData(seen.toArray())
  }

  /** Distinct n-grams SORTED in UTF8 binary order — the layout
    * [[jaccardSorted]] merge-scans. Sorting once per doc at build time
    * turns every downstream pair score into a linear merge with zero
    * hashing.
    */
  def distinctGramsSorted(s: UTF8String, n: Int): ArrayData = {
    val a = distinctGrams(s, n).asInstanceOf[GenericArrayData]
    val arr = a.array.asInstanceOf[Array[Any]]
    java.util.Arrays.sort(arr.asInstanceOf[Array[AnyRef]], utf8Order)
    a
  }

  private object utf8Order extends java.util.Comparator[AnyRef] with Serializable {
    override def compare(a: AnyRef, b: AnyRef): Int =
      a.asInstanceOf[UTF8String].compareTo(b.asInstanceOf[UTF8String])
  }

  /** Jaccard of two SORTED distinct string arrays: one merge pass
    * counts |A∩B|; |A∪B| = |A|+|B|−|A∩B|. The `array_intersect` +
    * `array_union` composition this replaces builds two hash sets of
    * every gram per PAIR (measured 6.5 s of the sf0.1 budget over 45k
    * candidate pairs); this is a straight O(|A|+|B|) byte-compare scan.
    */
  def jaccardSorted(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0; var inter = 0
    while (i < na && j < nb) {
      val c = a.getUTF8String(i).compareTo(b.getUTF8String(j))
      if (c == 0) { inter += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    inter.toDouble / (na + nb - inter).toDouble
  }

  /** |a ∩ b| of two sorted distinct string arrays — same merge scan
    * as [[jaccardSorted]], returning the raw overlap count (the
    * numerator asymmetric measures like containment need).
    */
  def overlapSorted(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0; var inter = 0L
    while (i < na && j < nb) {
      val c = a.getUTF8String(i).compareTo(b.getUTF8String(j))
      if (c == 0) { inter += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    inter
  }

  /** |a ∩ b| of two sorted distinct LONG arrays — the primitive-
    * compare twin of [[overlapSorted]] for hash-encoded gram sets: a
    * UTF8String compare costs ~25× a long compare and the per-pair
    * merge scan is the entire verification cost of the AllPairs
    * family, so pair scoring runs on 64-bit gram hashes and only the
    * set SIZES come from the string arrays.
    */
  def overlapSortedLong(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0; var inter = 0L
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    inter
  }
}

/** `char_grams(s, n)` — distinct character n-grams as
  * `array<string>` (UTF8-binary sorted when `sorted`), as a native
  * codegen'd expression.
  */
case class CharGrams(child: Expression, n: Int, sorted: Boolean) extends UnaryExpression {
  require(n > 0, "char_grams requires n > 0")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"char_grams expects STRING, got ${child.dataType.sql}")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  private def kernel: String = if (sorted) "distinctGramsSorted" else "distinctGrams"
  override def nullSafeEval(s: Any): Any =
    if (sorted) GramUtil.distinctGramsSorted(s.asInstanceOf[UTF8String], n)
    else GramUtil.distinctGrams(s.asInstanceOf[UTF8String], n)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.GramUtil.$kernel($s, $n)")
  override protected def withNewChildInternal(c: Expression): CharGrams = copy(child = c)
  override def prettyName: String = "char_grams"
}

/** `jaccard_sorted(a, b)` — Jaccard similarity of two sorted distinct
  * string arrays via a single merge scan.
  */
case class JaccardSorted(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != ArrayType(StringType, containsNull = false) &&
        left.dataType != ArrayType(StringType, containsNull = true))
      TypeCheckResult.TypeCheckFailure(
        s"jaccard_sorted expects ARRAY<STRING>, got ${left.dataType.sql}")
    else if (!right.dataType.isInstanceOf[ArrayType] ||
        right.dataType.asInstanceOf[ArrayType].elementType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"jaccard_sorted expects ARRAY<STRING>, got ${right.dataType.sql}")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(a: Any, b: Any): Any =
    GramUtil.jaccardSorted(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.GramUtil.jaccardSorted($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): JaccardSorted =
    copy(left = l, right = r)
  override def prettyName: String = "jaccard_sorted"
}

/** `overlap_sorted(a, b)` — |a ∩ b| of two sorted distinct string
  * arrays as BIGINT (one merge scan; the containment numerator).
  */
case class OverlapSorted(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (!left.dataType.isInstanceOf[ArrayType] ||
        left.dataType.asInstanceOf[ArrayType].elementType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"overlap_sorted expects ARRAY<STRING>, got ${left.dataType.sql}")
    else if (!right.dataType.isInstanceOf[ArrayType] ||
        right.dataType.asInstanceOf[ArrayType].elementType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"overlap_sorted expects ARRAY<STRING>, got ${right.dataType.sql}")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(a: Any, b: Any): Any =
    GramUtil.overlapSorted(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.GramUtil.overlapSorted($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): OverlapSorted =
    copy(left = l, right = r)
  override def prettyName: String = "overlap_sorted"
}

/** `overlap_sorted_long(a, b)` — |a ∩ b| of two sorted distinct
  * `array<bigint>` by primitive merge scan (hash-encoded gram sets).
  */
case class OverlapSortedLong(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  private def ok(dt: DataType): Boolean = dt match {
    case ArrayType(org.apache.spark.sql.types.LongType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (!ok(left.dataType) || !ok(right.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"overlap_sorted_long expects ARRAY<BIGINT>, got " +
          s"${left.dataType.sql}, ${right.dataType.sql}")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(a: Any, b: Any): Any =
    GramUtil.overlapSortedLong(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.GramUtil.overlapSortedLong($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): OverlapSortedLong =
    copy(left = l, right = r)
  override def prettyName: String = "overlap_sorted_long"
}

/** Runtime kernel for [[MinhashSig]]. */
object MinhashUtil {

  /** Universal-hash permutation constants for slot j: a_j/b_j from the
    * md5 hex of "a:j"/"b:j" — the same derivation the dedup oracle
    * writes out in SQL (`ha`/`hb` CTEs). Cached per (n, p).
    */
  private val constCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Long), (Array[Long], Array[Long])]()

  private def consts(n: Int, p: Long): (Array[Long], Array[Long]) =
    constCache.computeIfAbsent((n, p), { _ =>
      def md5Hex(s: String): String =
        java.security.MessageDigest.getInstance("MD5")
          .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      (Array.tabulate(n)(j =>
         java.lang.Long.parseLong(md5Hex(s"a:$j").substring(0, 7), 16) % (p - 1) + 1),
       Array.tabulate(n)(j =>
         java.lang.Long.parseLong(md5Hex(s"b:$j").substring(0, 7), 16) % p))
    })

  /** n-slot minhash signature of a gram array: slot j = min over
    * grams of (a_j·(md5(g) mod p) + b_j) mod p. One static call per
    * ROW with the slot loop inside — the aggregate formulation
    * (explode + n min-slots) computes the identical values but pays a
    * corpus-sized explode, a shuffle, and the janino compile of an
    * n-wide aggregate for what is embarrassingly map-parallel work.
    */
  def signature(grams: ArrayData, n: Int, p: Long): ArrayData = {
    val (ha, hb) = consts(n, p)
    val out = Array.fill(n)(Long.MaxValue)
    var i = 0
    val len = grams.numElements()
    while (i < len) {
      val h = HashUtil.md5Prefix(grams.getUTF8String(i), 15) % p
      var j = 0
      while (j < n) {
        val v = (ha(j) * h + hb(j)) % p
        if (v < out(j)) out(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** `minhash_sig(grams, n, p)` — map-only n-slot minhash signature
  * (see [[MinhashUtil.signature]]).
  */
case class MinhashSig(child: Expression, n: Int, p: Long) extends UnaryExpression {

  require(n > 0 && p > 1, "minhash_sig requires n > 0 and p > 1")

  override def checkInputDataTypes(): TypeCheckResult =
    if (!child.dataType.isInstanceOf[ArrayType] ||
        child.dataType.asInstanceOf[ArrayType].elementType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"minhash_sig expects ARRAY<STRING>, got ${child.dataType.sql}")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(grams: Any): Any =
    MinhashUtil.signature(grams.asInstanceOf[ArrayData], n, p)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, g => s"graft.functions.MinhashUtil.signature($g, $n, ${p}L)")
  override protected def withNewChildInternal(c: Expression): MinhashSig =
    copy(child = c)
  override def prettyName: String = "minhash_sig"
}

/** Runtime kernel for [[LevBanded]]. */
object LevUtil {

  /** Banded Levenshtein distance: exact value when ≤ `k`, −1
    * otherwise (the builtin `levenshtein(l, r, k)` contract). A
    * two-row DP over the |i−j| ≤ k diagonal band with O(1) char
    * access — O(min-len·k) time, two int rows of state.
    *
    * The builtin exists but is unusable in a pairwise hot path:
    * `UTF8String.charAt` re-scans from the string start on every
    * access (variable-width encoding), so the builtin's DP degrades
    * to ~O(n²·len) per PAIR — measured ~2 ms per ~300-char
    * comparison, 6.5 s of dedup_edit_distance's 6.6 s at sf0.1. One
    * up-front decode to a char array makes every cell O(1);
    * same-value-by-construction (character-level distance either
    * way).
    */
  def banded(a: UTF8String, b: UTF8String, k: Int): Int = {
    val s = a.toString
    val t = b.toString
    val n = s.length
    val m = t.length
    if (math.abs(n - m) > k) return -1
    if (n == 0) return m // <= k by the length guard
    if (m == 0) return n
    val INF = Int.MaxValue / 2
    var prev = new Array[Int](m + 1)
    var cur = new Array[Int](m + 1)
    var j = 0
    while (j <= m) { prev(j) = if (j <= k) j else INF; j += 1 }
    var i = 1
    while (i <= n) {
      cur(0) = if (i <= k) i else INF
      val lo = math.max(1, i - k)
      val hi = math.min(m, i + k)
      if (lo > 1) cur(lo - 1) = INF
      var rowMin = cur(0)
      val ci = s.charAt(i - 1)
      j = lo
      while (j <= hi) {
        val cost = if (ci == t.charAt(j - 1)) 0 else 1
        var v = prev(j - 1) + cost
        val del = prev(j) + 1
        if (del < v) v = del
        val ins = cur(j - 1) + 1
        if (ins < v) v = ins
        cur(j) = v
        if (v < rowMin) rowMin = v
        j += 1
      }
      if (hi < m) cur(hi + 1) = INF
      if (rowMin > k) return -1
      val tmp = prev; prev = cur; cur = tmp
      i += 1
    }
    if (prev(m) <= k) prev(m) else -1
  }
}

/** `lev_banded(l, r, k)` — threshold-banded Levenshtein distance (see
  * [[LevUtil.banded]]).
  */
case class LevBanded(left: Expression, right: Expression, k: Int)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != StringType || right.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"lev_banded expects (STRING, STRING), got " +
          s"(${left.dataType.sql}, ${right.dataType.sql})")
    else if (k < 0)
      TypeCheckResult.TypeCheckFailure(s"lev_banded threshold must be >= 0, got $k")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(a: Any, b: Any): Any =
    LevUtil.banded(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String], k)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.LevUtil.banded($a, $b, $k)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): LevBanded =
    copy(left = l, right = r)
  override def prettyName: String = "lev_banded"
}

/** Runtime kernel for [[Md5Prefix]]. */
object HashUtil {
  private val mdLocal = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** The first `nHex` hex digits of md5(s) as a long — bit-identical
    * to `CAST(conv(substring(md5(cast(s as binary)), 1, nHex), 16, 10)
    * AS BIGINT)` (and DuckDB's `('0x' || substr(md5(s), 1, nHex))::
    * BIGINT`) for nHex ≤ 15, but with no hex-string allocation, no
    * conv() parse, and a thread-local reused MessageDigest. The
    * composed form allocates a digest + a 32-char hex string + a
    * substring + a decimal parse PER CALL — at one md5 per shingle
    * that's tens of millions of allocations per corpus pass, and this
    * kernel sits in the hottest loop of the minhash/simhash pipelines.
    */
  def md5Prefix(s: UTF8String, nHex: Int): Long = {
    val md = mdLocal.get()
    md.reset()
    val b = md.digest(s.getBytes)
    val full = nHex / 2
    var v = 0L
    var i = 0
    while (i < full) { v = (v << 8) | (b(i) & 0xffL); i += 1 }
    if (nHex % 2 == 1) v = (v << 4) | ((b(full) & 0xff) >>> 4)
    v
  }
}

/** `md5_prefix(s, nHex)` — leading `nHex` hex digits of md5(s) as a
  * BIGINT, as a native codegen'd expression (nHex ≤ 15 keeps the
  * value under 2⁶⁰, so downstream `% p` arithmetic never overflows).
  */
case class Md5Prefix(child: Expression, nHex: Int) extends UnaryExpression {
  require(nHex > 0 && nHex <= 15, "md5_prefix requires 0 < nHex <= 15")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"md5_prefix expects STRING, got ${child.dataType.sql}")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(s: Any): Any =
    HashUtil.md5Prefix(s.asInstanceOf[UTF8String], nHex)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.HashUtil.md5Prefix($s, $nHex)")
  override protected def withNewChildInternal(c: Expression): Md5Prefix = copy(child = c)
  override def prettyName: String = "md5_prefix"
}

/** Runtime kernel for [[ZOrder2]]. */
object ZOrderUtil {
  /** Interleave the low `bits` bits of x (even positions) and y (odd
    * positions): the Morton / Z-order curve key. Sorting by it gives
    * multi-dimensional locality — consecutive key ranges are small
    * rectangles in (x, y) space, so per-file min/max column stats
    * become selective on BOTH dimensions (the ClickHouse
    * ORDER BY (a, b) / Delta OPTIMIZE ZORDER data-skipping analog).
    */
  def interleave2(x: Long, y: Long, bits: Int): Long = {
    var v = 0L
    var i = 0
    while (i < bits) {
      v |= ((x >>> i) & 1L) << (2 * i)
      v |= ((y >>> i) & 1L) << (2 * i + 1)
      i += 1
    }
    v
  }
}

/** `zorder2(x, y, bits)` — 2-D Morton interleave as a native
  * codegen'd expression ([[ZOrderUtil.interleave2]]); bits ≤ 31 keeps
  * the key in a positive long.
  */
case class ZOrder2(left: Expression, right: Expression, bits: Int)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  require(bits > 0 && bits <= 31, "zorder2 requires 0 < bits <= 31")

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != org.apache.spark.sql.types.LongType ||
        right.dataType != org.apache.spark.sql.types.LongType)
      TypeCheckResult.TypeCheckFailure(
        s"zorder2 expects (BIGINT, BIGINT), got ${left.dataType.sql}, ${right.dataType.sql}")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(x: Any, y: Any): Any =
    ZOrderUtil.interleave2(x.asInstanceOf[Long], y.asInstanceOf[Long], bits)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, y) => s"graft.functions.ZOrderUtil.interleave2($x, $y, $bits)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): ZOrder2 =
    copy(left = l, right = r)
  override def prettyName: String = "zorder2"
}

object StrFuncs {
  def char_grams(s: Column, n: Int, sorted: Boolean = false): Column =
    ExpressionUtils.column(CharGrams(ExpressionUtils.expression(s), n, sorted))

  def zorder2(x: Column, y: Column, bits: Int): Column =
    ExpressionUtils.column(ZOrder2(
      ExpressionUtils.expression(x), ExpressionUtils.expression(y), bits))

  def md5_prefix(s: Column, nHex: Int): Column =
    ExpressionUtils.column(Md5Prefix(ExpressionUtils.expression(s), nHex))

  def jaccard_sorted(a: Column, b: Column): Column =
    ExpressionUtils.column(JaccardSorted(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  def overlap_sorted(a: Column, b: Column): Column =
    ExpressionUtils.column(OverlapSorted(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  def overlap_sorted_long(a: Column, b: Column): Column =
    ExpressionUtils.column(OverlapSortedLong(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  def lev_banded(l: Column, r: Column, k: Int): Column =
    ExpressionUtils.column(LevBanded(
      ExpressionUtils.expression(l), ExpressionUtils.expression(r), k))

  def minhash_sig(grams: Column, n: Int, p: Long): Column =
    ExpressionUtils.column(MinhashSig(ExpressionUtils.expression(grams), n, p))
}
