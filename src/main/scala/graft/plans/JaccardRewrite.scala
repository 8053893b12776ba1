package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{ArrayIntersect, ArrayUnion, BinaryExpression, Cast, Divide, Expression, ImplicitCastInputTypes, Size}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Single-pass Jaccard similarity of two bigint-array sets.
  *
  * `cast(size(array_intersect(a,b)) as double) / size(array_union(a,b))`
  * builds two hash tables AND materializes two intermediate arrays per
  * row; this computes |A∩B| and |A∪B| from one hash set and two counts
  * (union = |A|+|B|−inter), allocating nothing but the set. Matches
  * the builtin semantics exactly: distinct-set sizes, null elements
  * counted as a distinct member.
  */
case class JaccardSets(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaccard_sets"

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val set = new java.util.HashSet[java.lang.Long]()
    var aNull = false
    var i = 0
    while (i < a.numElements()) {
      if (a.isNullAt(i)) aNull = true else set.add(a.getLong(i))
      i += 1
    }
    val sizeA = set.size() + (if (aNull) 1 else 0)
    val seenB = new java.util.HashSet[java.lang.Long]()
    var bNull = false
    var inter = 0L
    i = 0
    while (i < b.numElements()) {
      if (b.isNullAt(i)) bNull = true
      else {
        val v = b.getLong(i)
        if (seenB.add(v) && set.contains(v)) inter += 1
      }
      i += 1
    }
    val sizeB = seenB.size() + (if (bNull) 1 else 0)
    if (aNull && bNull) inter += 1
    val union = sizeA + sizeB - inter
    if (union == 0) Double.NaN else inter.toDouble / union
  }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) =
    defineCodeGen(ctx, ev, (a, b) => s"graft.plans.JaccardSets.compute($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): JaccardSets =
    copy(left = newLeft, right = newRight)
}

object JaccardSets {
  /** Static entry for generated code — same math as nullSafeEval. */
  def compute(a: ArrayData, b: ArrayData): Double = {
    val set = new java.util.HashSet[java.lang.Long]()
    var aNull = false
    var i = 0
    while (i < a.numElements()) {
      if (a.isNullAt(i)) aNull = true else set.add(a.getLong(i))
      i += 1
    }
    val sizeA = set.size() + (if (aNull) 1 else 0)
    val seenB = new java.util.HashSet[java.lang.Long]()
    var bNull = false
    var inter = 0L
    i = 0
    while (i < b.numElements()) {
      if (b.isNullAt(i)) bNull = true
      else {
        val v = b.getLong(i)
        if (seenB.add(v) && set.contains(v)) inter += 1
      }
      i += 1
    }
    val sizeB = seenB.size() + (if (bNull) 1 else 0)
    if (aNull && bNull) inter += 1
    val union = sizeA + sizeB - inter
    if (union == 0) Double.NaN else inter.toDouble / union
  }
}

/** Optimizer rule: fuse the Jaccard idiom over bigint arrays into
  * [[JaccardSets]]. Pattern-matches the exact shape the dedup tier
  * (and any user query) writes:
  * `cast(size(array_intersect(a,b)) as double) / size(array_union(a,b))`
  * with semantically-equal children on both sides.
  */
object JaccardRewrite extends Rule[LogicalPlan] {

  private def isLongArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case Divide(
        Cast(Size(ArrayIntersect(a, b), _), DoubleType, _, _),
        Cast(Size(ArrayUnion(a2, b2), _), DoubleType, _, _), _)
        if a.semanticEquals(a2) && b.semanticEquals(b2) && isLongArray(a) && isLongArray(b) =>
      JaccardSets(a, b)
  }

  /** Runtime installation — works on any session, including the
    * driver-built harness sessions (no SparkSessionExtensions needed). */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(JaccardRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ JaccardRewrite
}
