package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Cross-engine deterministic hashing.
  *
  * Every hash the dedup / similarity / fingerprint operators use is
  * derived from md5 (available and bit-identical in Spark, DuckDB and
  * the JVM), NOT from engine-native `hash()` functions (Spark's
  * murmur3-32 and DuckDB's 64-bit hash don't agree). The first 8 hex
  * chars of the md5 are parsed as an unsigned 32-bit int → BIGINT,
  * which both engines can do exactly.
  *
  * Scale note: md5 is ~10× slower than murmur3 but still >100 MB/s/core
  * and embarrassingly parallel; it stays inside whole-stage codegen
  * (all builtin expressions, no UDFs).
  */
object Hashing {

  /** 32-bit md5-derived hash of a string column, as BIGINT ∈ [0, 2^32). */
  def h32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** SQL-text form for use inside Spark lambda expressions — resolves
    * to the native [[H32]] expression ([[register]] must have run on
    * the session). Higher-order-function lambda bodies evaluate
    * INTERPRETED (outside whole-stage codegen), where the builtin
    * `conv(substring(md5(x),1,8),16,10)` chain allocates a 32-char hex
    * string + 3 more intermediates per call; [[H32]] digests the
    * UTF8String bytes directly (~10× less alloc on the LSH hot path). */
  def h32Sql(e: String): String = s"h32($e)"

  /** SQL-text form of the SECOND 32-bit word of the md5 (hex chars
    * 9-16). Together with [[h32Sql]] it gives 64 independent md5 bits
    * per input — the 64-bit SimHash needs them (32-bit SimHash gives
    * only 256 buckets per 8-bit band: a quadratic self-join at scale). */
  def h32bSql(e: String): String = s"h32b($e)"

  // Registries already populated — keyed on the registry instance
  // (not the session: cloned sessions can share one registry), weakly
  // so a torn-down session doesn't pin its registry. Without this,
  // every query function re-registered all ~10 kernels and each
  // bench/gate run logged ~20 "replaced a previously registered
  // function" WARNs.
  private val registered =
    java.util.Collections.synchronizedSet(
      java.util.Collections.newSetFromMap(
        new java.util.WeakHashMap[AnyRef, java.lang.Boolean]))

  /** Idempotent session registration of the native hash + MinHash
    * kernels (the n/k arguments must be integer literals). Safe to
    * call from every query function; registers once per registry. */
  def register(spark: SparkSession): Unit = registered.synchronized {
    // the whole body holds the guard's monitor: a bare add-then-return
    // let a SECOND thread (concurrent layer scans) see the guard set
    // and proceed to ANALYSIS while the first was still mid-
    // registration — unresolved-function failures under concurrency
    val reg = spark.sessionState.functionRegistry
    if (!registered.add(reg)) return
    def litInt(e: Expression): Int = {
      require(e.foldable, s"argument must be an integer literal, got: ${e.sql}")
      e.eval().asInstanceOf[Number].intValue()
    }
    reg.createOrReplaceTempFunction("h32", exprs => H32(exprs.head), "built-in")
    reg.createOrReplaceTempFunction("h32b", exprs => H32B(exprs.head), "built-in")
    reg.createOrReplaceTempFunction("simhash64", exprs => SimHash64(exprs.head), "built-in")
    reg.createOrReplaceTempFunction("hashed_shingles",
      exprs => HashedShingles(exprs(0), litInt(exprs(1))), "built-in")
    reg.createOrReplaceTempFunction("hashed_chargrams",
      exprs => HashedCharGrams(exprs(0), litInt(exprs(1))), "built-in")
    reg.createOrReplaceTempFunction("affine_minhash",
      exprs => AffineMinHash(exprs(0), litInt(exprs(1))), "built-in")
    reg.createOrReplaceTempFunction("dotf",
      exprs => DotF(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction("dotl",
      exprs => DotL(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction("vnorm",
      exprs => VNorm(exprs.head), "built-in")
    reg.createOrReplaceTempFunction("hyperplane_sig",
      exprs => HyperplaneSig(exprs(0), litInt(exprs(1)), litInt(exprs(2))), "built-in")
    reg.createOrReplaceTempFunction("byte_features",
      exprs => ByteFeatures(exprs.head), "built-in")
    reg.createOrReplaceTempFunction("duck_type_mask",
      exprs => DuckTypeMask(exprs.head), "built-in")
    reg.createOrReplaceTempFunction("nfc",
      exprs => NfcNormalize(exprs.head), "built-in")
    def litStr(e: Expression): String = {
      require(e.foldable && e.dataType ==
        org.apache.spark.sql.types.StringType,
        s"argument must be a string literal, got: ${e.sql}")
      val v = e.eval()
      require(v != null, s"argument must be a non-null string literal, got: ${e.sql}")
      v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString
    }
    reg.createOrReplaceTempFunction("multi_find",
      exprs => MultiFind(exprs.head, exprs.tail.map(litStr)), "built-in")
    // aggregate: the analyzer wraps a bare AggregateFunction into an
    // AggregateExpression, so registration looks like any expression
    reg.createOrReplaceTempFunction("top_k_by_score",
      exprs => TopKByScore(exprs(0), exprs(1), litInt(exprs(2))), "built-in")
    // Spark's own runtime-filter bloom machinery, exposed as SQL
    // functions: bloom_agg(col, nItems, nBits) folds xxhash64(col)
    // into a BloomFilter sketch (mergeable partial aggregate, constant
    // output size); bloom_might(filter, col) is the codegen'd
    // membership probe. Both sides hash with the same XxHash64, so
    // probe semantics match build semantics exactly.
    reg.createOrReplaceTempFunction("bloom_agg",
      exprs => new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
        new org.apache.spark.sql.catalyst.expressions.XxHash64(Seq(exprs(0))),
        // the aggregate type-checks for BIGINT literals
        org.apache.spark.sql.catalyst.expressions.Literal(
          exprs(1).eval().asInstanceOf[Number].longValue()),
        org.apache.spark.sql.catalyst.expressions.Literal(
          exprs(2).eval().asInstanceOf[Number].longValue())), "built-in")
    reg.createOrReplaceTempFunction("bloom_might",
      exprs => org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        exprs(0),
        new org.apache.spark.sql.catalyst.expressions.XxHash64(Seq(exprs(1)))), "built-in")
    // literal string-array second arg, resolved once at plan time
    reg.createOrReplaceTempFunction("text_features",
      exprs => {
        require(exprs(1).foldable,
          s"text_features stops must be a literal string array, got: ${exprs(1).sql}")
        TextFeatures(exprs(0),
          exprs(1).eval().asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
            .toArray[UTF8String](StringType).map(_.toString).toSeq)
      }, "built-in")
  }

  private val tlMd5 = ThreadLocal.withInitial[MessageDigest](() => MessageDigest.getInstance("MD5"))

  /** First 4 md5 bytes, big-endian unsigned — identical to parsing the
    * first 8 hex chars (jvm32 / duck32). Static for codegen calls. */
  def h32Bytes(s: UTF8String): Long = {
    val d = tlMd5.get()
    d.reset()
    val digest = d.digest(s.getBytes)
    ((digest(0) & 0xffL) << 24) | ((digest(1) & 0xffL) << 16) |
      ((digest(2) & 0xffL) << 8) | (digest(3) & 0xffL)
  }

  /** md5 bytes 4-7, big-endian unsigned — the second 32-bit word
    * (= hex chars 9-16). Static for codegen calls. */
  def h32bBytes(s: UTF8String): Long = {
    val d = tlMd5.get()
    d.reset()
    val digest = d.digest(s.getBytes)
    ((digest(4) & 0xffL) << 24) | ((digest(5) & 0xffL) << 16) |
      ((digest(6) & 0xffL) << 8) | (digest(7) & 0xffL)
  }

  /** DuckDB mirror of [[h32]]. */
  def duck32(e: String): String =
    s"(('0x' || substr(md5($e), 1, 8))::BIGINT)"

  /** DuckDB mirror of [[h32bSql]]. */
  def duck32b(e: String): String =
    s"(('0x' || substr(md5($e), 9, 8))::BIGINT)"

  /** Driver-side mirror of [[h32]] (used to precompute LSH plane
    * matrices as literals instead of re-hashing per row). */
  def jvm32(s: String): Long = {
    val d = MessageDigest.getInstance("MD5")
      .digest(s.getBytes(StandardCharsets.UTF_8))
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }
}

/** Native 32-bit md5-derived hash (see [[Hashing.h32Bytes]]). */
case class H32(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "h32"
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(s: Any): Any =
    Hashing.h32Bytes(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Hashing.h32Bytes($c)")

  override protected def withNewChildInternal(newChild: Expression): H32 =
    copy(child = newChild)
}

/** Native second-word md5 hash (see [[Hashing.h32bBytes]]). */
case class H32B(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "h32b"
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(s: Any): Any =
    Hashing.h32bBytes(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Hashing.h32bBytes($c)")

  override protected def withNewChildInternal(newChild: Expression): H32B =
    copy(child = newChild)
}
