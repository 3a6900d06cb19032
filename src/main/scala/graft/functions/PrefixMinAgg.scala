package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.{Bridge => ExpressionUtils}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `prefix_min(df, gram, k)` — the k smallest (df, gram) pairs per
  * group under the global (df ASC, gram-bytes ASC) order, returned as
  * `array<string>` of the grams (ascending).
  *
  * This is the prefix-filter selection step of the ngram-jaccard
  * pipeline: a doc's prefix is its ⌈(1−τ)·sz⌉+1 globally-rarest grams.
  * Expressed as `row_number() OVER (PARTITION BY doc_id ORDER BY df,
  * gram)` it full-sorts every posting row through one reducer pass;
  * as a bounded heap it keeps O(k) state per group and
  * partial-aggregates map-side, so the doc_id shuffle carries ≤ k rows
  * per (partition, group) — the same reshape TopKByAgg applies to ANN
  * ranking.
  *
  * `k` is an expression evaluated per input row (the per-doc prefix
  * length rides along each posting row) and MUST be constant within a
  * group — entries evicted under an earlier smaller k are gone, so a
  * late larger k could NOT be honored retroactively; `update` throws
  * on a mismatch rather than silently dropping candidates. (Merging a
  * populated buffer with an empty partial buffer, whose k is still 0,
  * is the one legitimate k difference — `merge` max-resolves it.)
  */
case class PrefixMinAgg(
    df: Expression,
    gram: Expression,
    k: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[PrefixMinAgg.Buf] {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (df.dataType != LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"prefix_min requires a BIGINT df, got ${df.dataType.sql}")
    else if (gram.dataType != StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"prefix_min requires a STRING gram, got ${gram.dataType.sql}")
    else if (k.dataType != IntegerType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"prefix_min requires an INT k, got ${k.dataType.sql}")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess

  override def children: Seq[Expression] = Seq(df, gram, k)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  import PrefixMinAgg.{Buf, largestFirst}

  override def createAggregationBuffer(): Buf = new Buf

  private def offer(buf: Buf, e: (Long, Array[Byte])): Unit = {
    if (buf.heap.size < buf.k) buf.heap.add(e)
    else if (largestFirst.compare(e, buf.heap.peek()) > 0) {
      buf.heap.poll(); buf.heap.add(e)
    }
  }

  /** Re-trim after k could only have GROWN (max-merge): never drops
    * below-k entries, so no re-expansion is ever needed.
    */
  private def trim(buf: Buf): Unit =
    while (buf.heap.size > buf.k) buf.heap.poll()

  override def update(buf: Buf, input: InternalRow): Buf = {
    val d = df.eval(input); val g = gram.eval(input); val kv = k.eval(input)
    if (d != null && g != null && kv != null) {
      val ki = kv.asInstanceOf[Int]
      if (buf.k != 0 && ki != buf.k)
        throw new IllegalArgumentException(
          s"prefix_min requires k constant per group, saw ${buf.k} then $ki")
      buf.k = ki
      offer(buf, (d.asInstanceOf[Long], g.asInstanceOf[UTF8String].getBytes.clone()))
    }
    buf
  }

  override def merge(a: Buf, b: Buf): Buf = {
    a.k = math.max(a.k, b.k)
    val it = b.heap.iterator()
    while (it.hasNext) offer(a, it.next())
    trim(a)
    a
  }

  override def eval(buf: Buf): Any = {
    trim(buf)
    // drain a copy, largest-first → ascending array
    val copy = new java.util.PriorityQueue[(Long, Array[Byte])](
      math.max(1, buf.heap.size), largestFirst)
    copy.addAll(buf.heap)
    val arr = new Array[Any](copy.size)
    var i = copy.size - 1
    while (i >= 0) { arr(i) = UTF8String.fromBytes(copy.poll()._2); i -= 1 }
    new GenericArrayData(arr)
  }

  override def serialize(buf: Buf): Array[Byte] = {
    val entries = new Array[(Long, Array[Byte])](buf.heap.size)
    buf.heap.toArray(entries)
    val bb = ByteBuffer.allocate(8 + entries.map(e => 12 + e._2.length).sum)
    bb.putInt(buf.k).putInt(entries.length)
    entries.foreach { case (d, g) => bb.putLong(d).putInt(g.length).put(g) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new Buf
    buf.k = bb.getInt
    val n = bb.getInt
    var i = 0
    while (i < n) {
      val d = bb.getLong
      val g = new Array[Byte](bb.getInt)
      bb.get(g)
      buf.heap.add((d, g))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): PrefixMinAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): PrefixMinAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): PrefixMinAgg =
    copy(df = c(0), gram = c(1), k = c(2))
  override def prettyName: String = "prefix_min"
}

object PrefixMinAgg {

  /** k plus a bounded worst-first heap of (df, gram-utf8-bytes). */
  final class Buf {
    var k: Int = 0
    val heap = new java.util.PriorityQueue[(Long, Array[Byte])](8, largestFirst)
  }

  /** Heap head = the LARGEST (df, gram) — the entry evicted first.
    * Gram bytes compare unsigned-lexicographic (UTF8String binary
    * order), a consistent global total order across all docs — the
    * only property the prefix-filter pigeonhole argument needs.
    */
  private[functions] object largestFirst
      extends java.util.Comparator[(Long, Array[Byte])] with Serializable {
    override def compare(a: (Long, Array[Byte]), b: (Long, Array[Byte])): Int = {
      val c = java.lang.Long.compare(b._1, a._1)
      if (c != 0) return c
      val (x, y) = (a._2, b._2)
      val n = math.min(x.length, y.length)
      var i = 0
      while (i < n) {
        val d = (y(i) & 0xff) - (x(i) & 0xff)
        if (d != 0) return d
        i += 1
      }
      y.length - x.length
    }
  }

  def prefix_min(df: Column, gram: Column, k: Column): Column =
    ExpressionUtils.column(
      PrefixMinAgg(ExpressionUtils.expression(df), ExpressionUtils.expression(gram),
        ExpressionUtils.expression(k))
        .toAggregateExpression())
}
