package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native 64-bit SimHash over a token array.
  *
  * The SQL formulation (an `aggregate` over `sequence(0, 63)` with a
  * `filter` per bit) runs INTERPRETED — higher-order-function lambda
  * bodies are outside whole-stage codegen, and it pays two md5 calls
  * per token (h32 + h32b) plus 64 boxed per-bit passes over the token
  * list. This kernel digests each token ONCE (bits 0-31 from md5
  * bytes 0-3 big-endian, bits 32-63 from bytes 4-7 — the same two
  * words [[Hashing.h32Bytes]]/[[Hashing.h32bBytes]] expose), folds
  * bit counts in a tight JVM loop, and stays inside codegen.
  *
  * Parity contract (asserted by the d04/d06 oracle rows and
  * [[SimHash64]]'s spec): bit b of the result is set iff
  * `2 * |{tokens with bit b set}| >= |tokens|`, with null tokens
  * counted in the denominator but never the numerator — exactly the
  * SQL-lambda semantics. Consequently an EMPTY token array sets all
  * 64 bits (2·0 >= 0): every degenerate/empty doc lands on simhash
  * -1 at hamming 0 from every other empty doc. Deliberate — it
  * matches the SQL/DuckDB fold bit for bit, and the d06/d07 bucket
  * cap is the guard that keeps a mega-bucket of empty docs from
  * exploding the band self-join (they are d01 exact-dup territory
  * anyway).
  */
case class SimHash64(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(a: Any): Any =
    SimHash64.hash(a.asInstanceOf[ArrayData])

  // NOTE: the companion method must NOT be named `eval` — the case
  // class inherits Expression.eval, which suppresses the static
  // forwarder scalac would otherwise emit for the companion, and the
  // generated call then fails to compile (silently de-codegen-ing the
  // whole stage under the default codegen fallback)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash64.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  private val tl =
    ThreadLocal.withInitial[MessageDigest](() => MessageDigest.getInstance("MD5"))

  def hash(tokens: ArrayData): Long = {
    val n = tokens.numElements()
    val counts = new Array[Int](64)
    val d = tl.get()
    var i = 0
    while (i < n) {
      val t = tokens.getUTF8String(i)
      if (t != null) {
        d.reset()
        val dig = d.digest(t.getBytes)
        val lo = ((dig(0) & 0xffL) << 24) | ((dig(1) & 0xffL) << 16) |
          ((dig(2) & 0xffL) << 8) | (dig(3) & 0xffL)
        val hi = ((dig(4) & 0xffL) << 24) | ((dig(5) & 0xffL) << 16) |
          ((dig(6) & 0xffL) << 8) | (dig(7) & 0xffL)
        var b = 0
        while (b < 32) {
          if (((lo >>> b) & 1L) == 1L) counts(b) += 1
          b += 1
        }
        while (b < 64) {
          if (((hi >>> (b - 32)) & 1L) == 1L) counts(b) += 1
          b += 1
        }
      }
      i += 1
    }
    var r = 0L
    var b = 0
    while (b < 64) {
      if (2 * counts(b) >= n) r |= (1L << b)
      b += 1
    }
    r
  }
}
