package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Native vector kernels for the similarity tier. The SQL-lambda
  * formulations (`aggregate(zip_with(a, b, …))` dot products, the
  * 16×64-multiply hyperplane signature) evaluate INTERPRETED — every
  * element pays a boxed expression-tree walk, which made the ANN
  * queries lambda-bound rather than scan-bound. These expressions do
  * the same arithmetic in straight JVM loops inside whole-stage
  * codegen.
  *
  * Parity contract (asserted by the s01–s05 oracle rows and
  * VectorOpsSpec): each kernel folds doubles sequentially
  * left-to-right, exactly like the Spark `aggregate` lambda it
  * replaced and DuckDB's `list_sum` — float→double promotion is exact,
  * so the results are bit-identical across all three formulations.
  */
object VectorOps {

  /** Sequential-fold dot product of two float vectors. Callers
    * ([[DotF]]) enforce equal lengths; this fold itself is total. */
  def dotF(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    s
  }

  /** Integer dot product of two long vectors — exact by nature
    * (integer addition is associative; there is no fold-order parity
    * concern, only the boxed-lambda cost this kernel removes). */
  def dotL(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0L
    var i = 0
    while (i < n) {
      s += a.getLong(i) * b.getLong(i)
      i += 1
    }
    s
  }

  /** sqrt of the sequential-fold sum of squares. */
  def vnorm(a: ArrayData): Double = {
    val n = a.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      s += x * x
      i += 1
    }
    math.sqrt(s)
  }

  /** Hyperplane coefficient matrix: entry (p, d) is
    * h32("pl:p:d")/2^31 − 1 ∈ [−1, 1) — the same md5-derived rationals
    * the DuckDB oracle computes in SQL. Cached per (planes, dims). */
  private val planeCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Array[Double]]]()

  def planes(nPlanes: Int, dims: Int): Array[Array[Double]] =
    planeCache.computeIfAbsent((nPlanes, dims), { case (p, d) =>
      Array.tabulate(p, d)((pi, di) => Hashing.jvm32(s"pl:$pi:$di") / 2147483648.0 - 1.0)
    })

  /** nPlanes-bit random-hyperplane signature: bit p is set iff the
    * sequential-fold dot of the vector with plane p is >= 0. */
  def hyperplaneSig(v: ArrayData, nPlanes: Int, dims: Int): Long = {
    val m = planes(nPlanes, dims)
    val n = math.min(v.numElements(), dims)
    var sig = 0L
    var p = 0
    while (p < nPlanes) {
      val row = m(p)
      var s = 0.0
      var i = 0
      while (i < n) {
        s += v.getFloat(i).toDouble * row(i)
        i += 1
      }
      if (s >= 0) sig |= 1L << p
      p += 1
    }
    sig
  }
}

/** `dotf(a, b)` → double: sequential-fold dot product. NULL when the
  * lengths differ — the same result as the SQL-lambda
  * `aggregate(zip_with(a, b, …))` it replaced, where `zip_with` pads
  * the short side with nulls and the null propagates through the sum
  * (a silent truncation would return a plausible partial product). */
case class DotF(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dotf"
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true // mismatched lengths → null

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) null else VectorOps.dotF(x, y)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      if ($a.numElements() != $b.numElements()) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = graft.functions.VectorOps.dotF($a, $b);
      }""")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DotF =
    copy(left = newLeft, right = newRight)
}

/** `dotl(a, b)` → bigint: integer dot product (s27's quantized
  * scoring path). NULL when the lengths differ, like [[DotF]]. */
case class DotL(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = LongType
  override def prettyName: String = "dotl"
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true // mismatched lengths → null

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) null else VectorOps.dotL(x, y)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      if ($a.numElements() != $b.numElements()) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = graft.functions.VectorOps.dotL($a, $b);
      }""")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DotL =
    copy(left = newLeft, right = newRight)
}

/** `vnorm(a)` → double: sqrt of the sequential sum of squares. */
case class VNorm(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vnorm"
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(a: Any): Any =
    VectorOps.vnorm(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.VectorOps.vnorm($c)")

  override protected def withNewChildInternal(newChild: Expression): VNorm =
    copy(child = newChild)
}

/** `hyperplane_sig(v, nPlanes, dims)` → bigint LSH signature. */
case class HyperplaneSig(child: Expression, nPlanes: Int, dims: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = LongType
  override def prettyName: String = "hyperplane_sig"
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(a: Any): Any =
    VectorOps.hyperplaneSig(a.asInstanceOf[ArrayData], nPlanes, dims)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.VectorOps.hyperplaneSig($c, $nPlanes, $dims)")

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSig =
    copy(child = newChild)
}
