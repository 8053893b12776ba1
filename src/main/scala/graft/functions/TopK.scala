package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Bounded top-k state: up to k (score, id) pairs, best-first order
  * decided by (score desc, id asc). Mutable insert keeps the k best;
  * the array is kept unsorted until eval/serialize (insert is O(k)
  * on the worst element only when full). */
final class TopKBuffer(val k: Int) {
  var n: Int = 0
  val scores = new Array[Double](k)
  val ids = new Array[Long](k)

  /** true if (s1, id1) ranks better than (s2, id2). Scores compare by
    * java.lang.Double.compare — the same total order Spark's window
    * sort uses (NaN greatest, so a NaN score ranks first under
    * "score desc" in BOTH formulations; plain `>` would be false both
    * ways and rank NaN inconsistently). */
  @inline private def better(s1: Double, id1: Long, s2: Double, id2: Long): Boolean = {
    val c = java.lang.Double.compare(s1, s2)
    c > 0 || (c == 0 && id1 < id2)
  }

  private def worstIx: Int = {
    var w = 0
    var i = 1
    while (i < n) {
      if (better(scores(w), ids(w), scores(i), ids(i))) w = i
      i += 1
    }
    w
  }

  def insert(score: Double, id: Long): Unit =
    if (n < k) {
      scores(n) = score; ids(n) = id; n += 1
    } else if (k > 0) {
      val w = worstIx
      if (better(score, id, scores(w), ids(w))) { scores(w) = score; ids(w) = id }
    }

  def merge(other: TopKBuffer): Unit = {
    var i = 0
    while (i < other.n) { insert(other.scores(i), other.ids(i)); i += 1 }
  }

  /** (id, rank, score) triples, best first (same total order as
    * [[better]], so NaN handling matches the insert path). */
  def sorted: Array[(Long, Int, Double)] = {
    val ixs = (0 until n).sortWith((i, j) => better(scores(i), ids(i), scores(j), ids(j)))
    ixs.zipWithIndex.map { case (i, r) => (ids(i), r + 1, scores(i)) }.toArray
  }
}

/** `top_k_by_score(score, id, k)` → array<struct<id, rnk, score>> —
  * a [[TypedImperativeAggregate]] holding a bounded k-element buffer.
  *
  * This is the scale-correct top-k-per-group: partial buffers are
  * built map-side and only k rows per group cross the exchange,
  * versus the window formulation (row_number + filter) that shuffles
  * and sorts EVERY candidate row. Ties break on the smaller id, so
  * results are deterministic and oracle-comparable.
  */
case class TopKByScore(
    score: Expression, id: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer]
  with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {

  override def children: Seq[Expression] = Seq(score, id)
  // declared input types: a float score / int id column is implicitly
  // cast at analysis time instead of failing at runtime with a
  // ClassCastException in update()
  override def inputTypes: Seq[DataType] = Seq(DoubleType, LongType)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("rnk", IntegerType, nullable = false),
    StructField("score", DoubleType, nullable = false))), containsNull = false)
  override def prettyName: String = "top_k_by_score"

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(b: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      b.insert(s.asInstanceOf[Double], i.asInstanceOf[Long])
    b
  }

  override def merge(b: TopKBuffer, other: TopKBuffer): TopKBuffer = { b.merge(other); b }

  override def eval(b: TopKBuffer): Any =
    new GenericArrayData(b.sorted.map { case (id0, rnk, sc) =>
      InternalRow(id0, rnk, sc)
    }.toArray[Any])

  override def serialize(b: TopKBuffer): Array[Byte] = {
    val buf = ByteBuffer.allocate(8 + b.n * 16)
    buf.putInt(b.k).putInt(b.n)
    var i = 0
    while (i < b.n) { buf.putDouble(b.scores(i)).putLong(b.ids(i)); i += 1 }
    buf.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val buf = ByteBuffer.wrap(bytes)
    val b = new TopKBuffer(buf.getInt())
    val n = buf.getInt()
    var i = 0
    while (i < n) { b.insert(buf.getDouble(), buf.getLong()); i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(offset: Int): TopKByScore =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TopKByScore =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopKByScore =
    copy(score = newChildren(0), id = newChildren(1))
}
