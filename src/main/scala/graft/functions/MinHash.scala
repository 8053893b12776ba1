package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native MinHash kernels. The SQL-lambda formulation
  * (`transform(sh, s -> h32(s) % p)` etc.) runs INTERPRETED — each
  * element pays a boxed expression-tree walk, which dominated the LSH
  * tier (~90 s CPU per pass at sf0.1). These expressions do the same
  * math in straight JVM code: one incremental md5 per shingle (no
  * intermediate string/hex allocations), dedup on the 128-bit digest
  * (equivalent to the oracle's string dedup), affine permutations in
  * a tight loop.
  *
  * Parity contract (asserted by the d02/d03/d05 oracle rows): output
  * is identical to the SQL formulation — shingle = n tokens joined
  * with ' ', base hash = first 4 md5 bytes as unsigned int32 mod
  * 2^31−1, sig_j = min over shingles of (a_j·h + b_j) mod p with
  * [[Hashing.jvm32]]-derived coefficients.
  */
object MinHash {

  val P: Long = 2147483647L // Mersenne prime 2^31-1: a_j*h < 2^62 fits int64

  def coefA(k: Int): Array[Long] =
    (0 until k).map(j => 1 + Hashing.jvm32(s"perm:a:$j") % (P - 1)).toArray
  def coefB(k: Int): Array[Long] =
    (0 until k).map(j => Hashing.jvm32(s"perm:b:$j") % P).toArray

  private val tl = ThreadLocal.withInitial[MessageDigest](() => MessageDigest.getInstance("MD5"))
  private val SPACE = Array[Byte](' ')

  private def h32of(digest: Array[Byte]): Long =
    (((digest(0) & 0xffL) << 24) | ((digest(1) & 0xffL) << 16) |
      ((digest(2) & 0xffL) << 8) | (digest(3) & 0xffL)) % P

  /** Distinct word n-gram shingle hashes (mod P), insertion order.
    * Dedup key is the full 16-byte digest — string-collision odds are
    * 2^-128, so this equals the oracle's dedup-by-string. */
  def hashedShingles(tokens: ArrayData, n: Int): ArrayData = {
    val m = tokens.numElements()
    val out = new java.util.ArrayList[Long]()
    val seen = new java.util.HashSet[java.math.BigInteger]()
    val d = tl.get()
    var i = 0
    while (i + n <= m) {
      d.reset()
      var j = 0
      while (j < n) {
        if (j > 0) d.update(SPACE)
        val t = tokens.getUTF8String(i + j)
        if (t != null) d.update(t.getBytes)
        j += 1
      }
      val dig = d.digest()
      if (seen.add(new java.math.BigInteger(dig))) out.add(h32of(dig))
      i += 1
    }
    toArrayData(out)
  }

  private def toArrayData(out: java.util.ArrayList[Long]): ArrayData = {
    val arr = new Array[Long](out.size())
    var i = 0
    while (i < arr.length) { arr(i) = out.get(i); i += 1 }
    new GenericArrayData(arr)
  }

  /** Distinct char n-gram hashes of a string (mod P), insertion order.
    * Gram positions are CODE-POINT positions — Spark's `substring` and
    * DuckDB's `substr` both count code points, so supplementary-plane
    * characters (emoji, rare CJK) slice identically to the SQL
    * formulations; bytes hashed are the gram's UTF-8 encoding. */
  def hashedCharGrams(s: UTF8String, n: Int): ArrayData = {
    val str = s.toString
    val out = new java.util.ArrayList[Long]()
    val seen = new java.util.HashSet[String]()
    val d = tl.get()
    val cps = str.codePointCount(0, str.length)
    var start = 0 // UTF-16 index of the current gram's first code point
    var i = 0
    while (i + n <= cps) {
      val end = str.offsetByCodePoints(start, n)
      val g = str.substring(start, end)
      if (seen.add(g)) {
        d.reset()
        out.add(h32of(d.digest(g.getBytes(java.nio.charset.StandardCharsets.UTF_8))))
      }
      start = str.offsetByCodePoints(start, 1)
      i += 1
    }
    toArrayData(out)
  }

  /** k-permutation affine MinHash signature of a hash set. */
  def affineMin(hv: ArrayData, k: Int): ArrayData = {
    val a = coefA(k); val b = coefB(k)
    val sig = Array.fill[Long](k)(Long.MaxValue)
    val m = hv.numElements()
    var i = 0
    while (i < m) {
      val h = hv.getLong(i)
      var j = 0
      while (j < k) {
        val v = (a(j) * h + b(j)) % P
        if (v < sig(j)) sig(j) = v
        j += 1
      }
      i += 1
    }
    if (m == 0) new GenericArrayData(Array.empty[Long]) else new GenericArrayData(sig)
  }
}

/** `hashed_shingles(tokens, n)` → array<bigint>. */
case class HashedShingles(child: Expression, n: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hashed_shingles"

  override protected def nullSafeEval(a: Any): Any =
    MinHash.hashedShingles(a.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHash.hashedShingles($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): HashedShingles =
    copy(child = newChild)
}

/** `hashed_chargrams(text, n)` → array<bigint>. */
case class HashedCharGrams(child: Expression, n: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hashed_chargrams"

  override protected def nullSafeEval(s: Any): Any =
    MinHash.hashedCharGrams(s.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHash.hashedCharGrams($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): HashedCharGrams =
    copy(child = newChild)
}

/** `affine_minhash(hv, k)` → array<bigint> of k signature values. */
case class AffineMinHash(child: Expression, k: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "affine_minhash"

  override protected def nullSafeEval(a: Any): Any =
    MinHash.affineMin(a.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHash.affineMin($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): AffineMinHash =
    copy(child = newChild)
}
