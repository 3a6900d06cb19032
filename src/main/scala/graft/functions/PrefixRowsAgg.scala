package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BoundReference, Expression, InterpretedOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Variable-k top-prefix FULL-ROWS heap — the aggregate behind the
  * `percent_rank()/ntile()` prefix rewrite
  * ([[graft.plans.RewriteRankLimit]]).
  *
  * `percent_rank() <= p` / `ntile(t) <= q` bound the kept prefix by a
  * FRACTION of the group, so the cutoff depends on the group's total
  * row count — unknowable during a single-pass fold, and provably not
  * safely evictable (a future merge only ever RAISES the row-count
  * threshold, so any evicted row might become eligible). The sound
  * shape is two aggregations: a per-group `count(1)` joined back onto
  * the rows, and THIS heap, which reads its per-group k from that
  * joined column (`kExpr`, constant within a group by construction)
  * instead of a literal. State and shuffle stay O(k_g + boundary
  * ties) per group — the fraction the query keeps — where the Window
  * plan shuffles and full-sorts every row of every group.
  *
  * `rankSemantics = true` gives `rank()` tie-group semantics
  * (percent_rank's base; boundary tie groups kept whole);
  * `false` gives `row_number()` arrival-order semantics (ntile's
  * base; ties broken nondeterministically, exactly as the Window
  * form's partition-dependent pick).
  *
  * A group whose k exceeds `maxRows` fails LOUD with guidance
  * (aggregation buffers cannot spill; a prefix that large means the
  * Window sort was the right plan) — the graft never-wrong,
  * converge-or-throw contract, same as [[RankRowsAgg]].
  */
case class PrefixRowsAgg(
    rankSemantics: Boolean,
    orderKeys: Seq[Expression],
    ascending: Seq[Boolean],
    nullsFirst: Seq[Boolean],
    kExpr: Expression,
    payload: Expression,
    maxRows: Int = RankRowsAgg.DefaultMaxRows,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[PrefixRowsAgg.Buf] {

  require(orderKeys.nonEmpty && orderKeys.length == ascending.length &&
    orderKeys.length == nullsFirst.length, "sort spec arity mismatch")

  override def checkInputDataTypes(): TypeCheckResult = {
    val bad = orderKeys.find(e =>
      !org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(e.dataType))
    if (bad.isDefined)
      TypeCheckResult.TypeCheckFailure(
        s"prefix_rows sort key type ${bad.get.dataType.sql} is not orderable")
    else if (kExpr.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"prefix_rows k column must be BIGINT, got ${kExpr.dataType.sql}")
    else if (!payload.dataType.isInstanceOf[StructType])
      TypeCheckResult.TypeCheckFailure(
        s"prefix_rows payload must be a struct, got ${payload.dataType.sql}")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def children: Seq[Expression] = (orderKeys :+ kExpr) :+ payload
  override def nullable: Boolean = false
  private def payloadType: StructType = payload.dataType.asInstanceOf[StructType]
  // rnk: rank()/row_number() value; pend: the row's tie-group END
  // position (== rnk under row_number semantics) — cume_dist's
  // numerator, free to emit from the same fold
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("rnk", LongType, nullable = false),
      StructField("pend", LongType, nullable = false),
      StructField("row", payloadType, nullable = false))),
    containsNull = false)

  private def numKeys: Int = orderKeys.length
  private def numFields: Int = numKeys + 2 // keys, k, payload

  @transient private lazy val ascOrd: InterpretedOrdering =
    new InterpretedOrdering(orderKeys.zipWithIndex.map { case (e, i) =>
      SortOrder(BoundReference(i, e.dataType, nullable = true),
        if (ascending(i)) org.apache.spark.sql.catalyst.expressions.Ascending
        else org.apache.spark.sql.catalyst.expressions.Descending,
        if (nullsFirst(i)) org.apache.spark.sql.catalyst.expressions.NullsFirst
        else org.apache.spark.sql.catalyst.expressions.NullsLast,
        Seq.empty)
    })

  @transient private lazy val keyOrd: java.util.Comparator[UnsafeRow] =
    (a: UnsafeRow, b: UnsafeRow) => ascOrd.compare(a, b)

  @transient private lazy val proj: UnsafeProjection =
    UnsafeProjection.create(children)

  override def createAggregationBuffer(): PrefixRowsAgg.Buf =
    new PrefixRowsAgg.Buf(
      new java.util.TreeMap[UnsafeRow, java.util.ArrayList[UnsafeRow]](keyOrd), 0, -1)

  private def setK(buf: PrefixRowsAgg.Buf, kLong: Long): Unit = {
    if (kLong > maxRows)
      throw new IllegalStateException(
        s"$prettyName: a group's prefix needs $kLong rows (> maxRows=$maxRows). " +
          "The rewritten heap cannot spill like the Window plan it replaced — " +
          "a prefix this large means the Window sort is the right plan: disable " +
          "the rewrite (spark.graft.rankLimitRewrite=false) for this query, or " +
          "raise spark.graft.rankLimitRewrite.maxTieRows.")
    buf.k = math.max(kLong, 0L).toInt
  }

  private def evict(buf: PrefixRowsAgg.Buf): Unit = {
    if (rankSemantics) {
      // rank(): a boundary tie GROUP is kept whole while fewer than k
      // rows sort strictly before it
      while (buf.map.size > 1 &&
          buf.total - buf.map.lastEntry().getValue.size >= buf.k) {
        val ev = buf.map.pollLastEntry()
        buf.total -= ev.getValue.size
      }
    } else {
      // row_number(): evict single worst rows down to k
      while (buf.total > buf.k && !buf.map.isEmpty) {
        val last = buf.map.lastEntry()
        val rows = last.getValue
        rows.remove(rows.size - 1)
        buf.total -= 1
        if (rows.isEmpty) buf.map.remove(last.getKey)
      }
    }
    if (buf.total > maxRows)
      throw new IllegalStateException(
        s"$prettyName: a single group retains ${buf.total} rows (> maxRows=$maxRows) " +
          "from sort-key ties at the prefix boundary — raise " +
          "spark.graft.rankLimitRewrite.maxTieRows or disable the rewrite " +
          "(spark.graft.rankLimitRewrite=false).")
  }

  private def insert(buf: PrefixRowsAgg.Buf, row: UnsafeRow): Unit = {
    if (buf.k < 0) setK(buf, row.getLong(numKeys))
    if (buf.k == 0) return
    val existing = buf.map.get(row)
    if (existing != null) {
      existing.add(row.copy())
      buf.total += 1
    } else {
      if (!buf.map.isEmpty && keyOrd.compare(row, buf.map.lastKey()) > 0 &&
          buf.total >= buf.k) {
        return // strictly worse than the worst retained key, prefix full
      }
      val stored = row.copy()
      val lst = new java.util.ArrayList[UnsafeRow](1)
      lst.add(stored)
      buf.map.put(stored, lst)
      buf.total += 1
    }
    evict(buf)
  }

  override def update(buf: PrefixRowsAgg.Buf, input: InternalRow): PrefixRowsAgg.Buf = {
    insert(buf, proj(input))
    buf
  }

  override def merge(a: PrefixRowsAgg.Buf, b: PrefixRowsAgg.Buf): PrefixRowsAgg.Buf = {
    if (a.k < 0) a.k = b.k
    val it = b.map.values().iterator()
    while (it.hasNext) {
      val rows = it.next()
      var i = 0
      while (i < rows.size) { insert(a, rows.get(i)); i += 1 }
    }
    a
  }

  override def eval(buf: PrefixRowsAgg.Buf): Any = {
    val out = new scala.collection.mutable.ArrayBuffer[Any](buf.total)
    var cum = 0L
    val it = buf.map.values().iterator()
    while (it.hasNext) {
      val rows = it.next()
      var i = 0
      while (i < rows.size) {
        // rank(): every row of a tie group shares the group rank;
        // row_number(): arrival position. Eviction may retain one
        // boundary group past k (rank mode) — trimmed here.
        val rnk = if (rankSemantics) cum + 1 else cum + i + 1
        val pend = if (rankSemantics) cum + rows.size else cum + i + 1
        if (rnk <= buf.k) {
          out += InternalRow(rnk, pend,
            rows.get(i).getStruct(numKeys + 1, payloadType.length).copy())
        }
        i += 1
      }
      cum += rows.size
    }
    new GenericArrayData(out.toArray)
  }

  override def serialize(buf: PrefixRowsAgg.Buf): Array[Byte] = {
    var size = 8
    val it0 = buf.map.values().iterator()
    while (it0.hasNext) {
      val rows = it0.next()
      size += 4
      var i = 0
      while (i < rows.size) { size += 4 + rows.get(i).getSizeInBytes; i += 1 }
    }
    val out = ByteBuffer.allocate(size)
    out.putInt(buf.k)
    out.putInt(buf.map.size)
    val it = buf.map.values().iterator()
    while (it.hasNext) {
      val rows = it.next()
      out.putInt(rows.size)
      var i = 0
      while (i < rows.size) {
        val bytes = rows.get(i).getBytes
        out.putInt(bytes.length)
        out.put(bytes)
        i += 1
      }
    }
    out.array()
  }

  override def deserialize(bytes: Array[Byte]): PrefixRowsAgg.Buf = {
    val in = ByteBuffer.wrap(bytes)
    val buf = createAggregationBuffer()
    buf.k = in.getInt
    val nGroups = in.getInt
    var g = 0
    while (g < nGroups) {
      val m = in.getInt
      var i = 0
      var lst: java.util.ArrayList[UnsafeRow] = null
      while (i < m) {
        val len = in.getInt
        val arr = new Array[Byte](len)
        in.get(arr)
        val row = new UnsafeRow(numFields)
        row.pointTo(arr, len)
        if (lst == null) {
          lst = new java.util.ArrayList[UnsafeRow](m)
          buf.map.put(row, lst)
        }
        lst.add(row)
        i += 1
      }
      buf.total += m
      g += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): PrefixRowsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): PrefixRowsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): PrefixRowsAgg =
    copy(orderKeys = newChildren.dropRight(2),
      kExpr = newChildren(newChildren.length - 2), payload = newChildren.last)

  override def prettyName: String = "prefix_rows"
}

object PrefixRowsAgg {
  /** Ordered key-group map + retained count + per-group k (−1 until
    * the first row/merge supplies it).
    */
  final class Buf(
      val map: java.util.TreeMap[UnsafeRow, java.util.ArrayList[UnsafeRow]],
      var total: Int,
      var k: Int)
}
