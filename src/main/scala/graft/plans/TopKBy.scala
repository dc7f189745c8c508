package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Bounded top-k buffer: keeps the k largest (score, id) pairs, with
  * deterministic ordering — score DESC, id ASC on ties.
  */
final class TopKBuffer(val k: Int) {
  require(k >= 1, "topk_by needs k >= 1")
  // min-heap on (score asc, id desc) so the root is the weakest element
  private val ord: Ordering[(Double, Long)] = Ordering.by {
    case (s, id) => (-s, id)
  }
  val heap = new scala.collection.mutable.PriorityQueue[(Double, Long)]()(ord)

  def add(score: Double, id: Long): Unit = {
    if (heap.size < k) heap.enqueue((score, id))
    else {
      val (ws, wid) = heap.head
      if (score > ws || (score == ws && id < wid)) {
        heap.dequeue(); heap.enqueue((score, id))
      }
    }
  }

  def merge(other: TopKBuffer): Unit =
    other.heap.foreach { case (s, id) => add(s, id) }

  /** Elements best-first. */
  def sorted: Array[(Double, Long)] =
    heap.toArray.sortBy { case (s, id) => (-s, id) }
}

/** topk_by(score, id, k) → array<struct<score double, id bigint>> of the
  * k largest scores per group (SURVEY.md §2 extension).
  *
  * Why not a window + row_number ≤ k: a window must SORT every group's
  * full row set after the shuffle. This aggregate keeps an O(k) heap
  * and — crucially — participates in PARTIAL aggregation, so each map
  * task ships at most k candidates per group across the shuffle. For
  * top-k-neighbors over 1e9 vectors that is the difference between
  * shuffling the corpus and shuffling k rows per query.
  */
case class TopKBy(scoreExpr: Expression, idExpr: Expression, k: Int,
                  mutableAggBufferOffset: Int = 0,
                  inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKBuffer] {

  override def children: Seq[Expression] = Seq(scoreExpr, idExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType), StructField("id", LongType))))
  override def prettyName: String = "topk_by"

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = scoreExpr.eval(input)
    val id = idExpr.eval(input)
    if (s != null && id != null)
      buf.add(s.asInstanceOf[Double], id.asInstanceOf[Long])
    buf
  }

  override def merge(a: TopKBuffer, b: TopKBuffer): TopKBuffer = {
    a.merge(b); a
  }

  override def eval(buf: TopKBuffer): Any = {
    val rows: Array[Any] = buf.sorted.map { case (s, id) =>
      InternalRow(s, id)
    }
    new GenericArrayData(rows)
  }

  override def serialize(buf: TopKBuffer): Array[Byte] = {
    val items = buf.heap.toArray
    val bb = ByteBuffer.allocate(8 + items.length * 16)
    bb.putInt(buf.k); bb.putInt(items.length)
    items.foreach { case (s, id) => bb.putDouble(s); bb.putLong(id) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new TopKBuffer(bb.getInt)
    val n = bb.getInt
    (0 until n).foreach(_ => buf.add(bb.getDouble, bb.getLong))
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKBy =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKBy =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKBy =
    copy(scoreExpr = newChildren(0), idExpr = newChildren(1))
}

object TopKBy {
  /** Column API: `df.groupBy(g).agg(topk_by(score, id, 5))`. */
  def topkBy(score: Column, id: Column, k: Int): Column =
    GraftBridge.column(
      TopKBy(GraftBridge.expression(score), GraftBridge.expression(id), k)
        .toAggregateExpression())
}
