package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType, StringType}

import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst ST_* expressions (WKB `BinaryType` out), replacing
  * the reference's DuckDB `spatial` extension surface
  * (`/root/reference/src/dwca_parquet/settings.py:51,60`,
  * `templates/query.sql:1`). Full codegen via static [[Geo]] helpers —
  * these stay inside whole-stage codegen spans, unlike a Scala UDF.
  *
  * NOTE the reference calls `ST_POINT(decimalLatitude,
  * decimalLongitude)` — x = latitude. [[StPoint]] keeps plain (x, y)
  * semantics; the *call site* preserves the reference's (lat, lon)
  * argument order for parity (SURVEY §2.4 F3).
  */
case class StPoint(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(DoubleType, DoubleType)
  override def dataType: DataType = BinaryType
  override def prettyName: String = "st_point"
  // null in -> null out: lets Catalyst's NullPropagation fold
  // st_point(null, y) to a null literal at plan time
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(x: Any, y: Any): Any =
    Geo.pointWkb(x.asInstanceOf[Double], y.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Geo.pointWkb($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): StPoint =
    copy(left = newLeft, right = newRight)
}

/** WKT string → WKB bytes; null in → null out, malformed WKT throws
  * (same as DuckDB's ST_GeomFromText). */
case class StGeomFromText(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = BinaryType
  override def prettyName: String = "st_geomfromtext"
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(s: Any): Any =
    Geo.wktToWkb(s.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Geo.wktToWkb($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): StGeomFromText =
    copy(child = newChild)
}

/** WKB bytes → canonical WKT string (round-trip / debugging). */
case class StAsText(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = StringType
  override def prettyName: String = "st_astext"
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(b: Any): Any =
    UTF8String.fromString(Geo.wkbToWkt(b.asInstanceOf[Array[Byte]]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.unsafe.types.UTF8String.fromString(graft.functions.Geo.wkbToWkt($c))")

  override protected def withNewChildInternal(newChild: Expression): StAsText =
    copy(child = newChild)
}

/** WKB → [xmin, ymin, xmax, ymax] (null for empty geometry; off the
  * hot path — bbox/footer computation — so CodegenFallback is fine,
  * and it lets a non-null input produce a null result). */
case class StEnvelope(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  import org.apache.spark.sql.types.{ArrayType, DoubleType}
  import org.apache.spark.sql.catalyst.util.GenericArrayData
  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "st_envelope"

  override protected def nullSafeEval(b: Any): Any = {
    val e = Geo.envelope(b.asInstanceOf[Array[Byte]])
    if (e == null) null else new GenericArrayData(e)
  }

  override protected def withNewChildInternal(newChild: Expression): StEnvelope =
    copy(child = newChild)
}

/** Registers the ST_* functions on a session (idempotent), so
  * `expr("st_point(lat, lon)")` and `spark.sql` resolve them. Done at
  * query-build time rather than via `SparkSessionExtensions` because
  * the driver owns session construction. */
object GeoFunctions {
  // once per registry instance (see Hashing.registered for rationale)
  private val registered =
    java.util.Collections.synchronizedSet(
      java.util.Collections.newSetFromMap(
        new java.util.WeakHashMap[AnyRef, java.lang.Boolean]))

  def register(spark: SparkSession): Unit = registered.synchronized {
    // whole body under the guard's monitor — see Hashing.register
    val reg = spark.sessionState.functionRegistry
    if (!registered.add(reg)) return
    reg.createOrReplaceTempFunction("st_point", exprs => StPoint(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction("st_geomfromtext", exprs => StGeomFromText(exprs(0)), "built-in")
    reg.createOrReplaceTempFunction("st_astext", exprs => StAsText(exprs(0)), "built-in")
    reg.createOrReplaceTempFunction("st_envelope", exprs => StEnvelope(exprs(0)), "built-in")
  }
}
