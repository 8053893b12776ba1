package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native one-pass byte-feature extractor for media payloads (m05):
  * `byte_features(blob)` → struct(resized_md5, n_bytes, mean_byte_bp,
  * hist4), skipping the 4-byte magic tag.
  *
  * The SQL formulation it replaces made FOUR passes over the payload
  * as interpreted higher-order lambdas — one boxed eval per byte for
  * the stride-4 resample, the byte sum, and each histogram test
  * (`aggregate`/`filter` over `sequence(5, char_length(p))`,
  * Multimodal m05). This kernel reads the raw bytes once in a tight
  * JVM loop and stays inside whole-stage codegen — the same
  * SQL-lambda→native pattern as [[SimHash64]].
  *
  * Parity contract (asserted by the m05 oracle and ByteFeaturesSpec's
  * cross-check against the retired SQL formulation, which assumed —
  * as the testdata guarantees — ASCII payloads where byte position ==
  * char position):
  *   - resized_md5: lowercase-hex md5 of bytes at offsets 4, 8, 12, …
  *     (the 4× stride downsample)
  *   - n_bytes: payload length minus the 4-byte tag
  *   - mean_byte_bp: floor(sum(bytes after tag) * 10000 / n_bytes)
  *   - hist4: counts of byte>>6 ∈ {0,1,2,3}, comma-joined
  * Payloads of ≤4 bytes (nothing after the tag) yield NULL — callers
  * filter them, but the kernel stays total.
  */
case class ByteFeatures(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = StructType(Seq(
    StructField("resized_md5", StringType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("mean_byte_bp", LongType, nullable = false),
    StructField("hist4", StringType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "byte_features"

  override def eval(input: InternalRow): Any = {
    val b = child.eval(input)
    if (b == null) null else ByteFeatures.compute(b.asInstanceOf[Array[Byte]])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.ByteFeatures.compute($c);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): ByteFeatures =
    copy(child = newChild)
}

object ByteFeatures {
  private val tl =
    ThreadLocal.withInitial[MessageDigest](() => MessageDigest.getInstance("MD5"))

  private val hexDigits = "0123456789abcdef".toCharArray

  /** One pass over the payload; null when nothing follows the tag. */
  def compute(blob: Array[Byte]): InternalRow = {
    val n = blob.length
    if (n <= 4) return null
    val d = tl.get()
    d.reset()
    var sum = 0L
    val hist = new Array[Long](4)
    var i = 4
    while (i < n) {
      val b = blob(i) & 0xff
      sum += b
      hist(b >> 6) += 1
      if (((i - 4) & 3) == 0) d.update(blob(i)) // offsets 4, 8, 12, …
      i += 1
    }
    val dig = d.digest()
    val hex = new Array[Char](32)
    i = 0
    while (i < 16) {
      hex(2 * i) = hexDigits((dig(i) >> 4) & 0xf)
      hex(2 * i + 1) = hexDigits(dig(i) & 0xf)
      i += 1
    }
    val nBytes = (n - 4).toLong
    InternalRow(
      UTF8String.fromString(new String(hex)),
      nBytes,
      sum * 10000L / nBytes,
      UTF8String.fromString(s"${hist(0)},${hist(1)},${hist(2)},${hist(3)}"))
  }
}
