package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

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

  /** SQL-text form of [[h32]] for use inside Spark lambda expressions. */
  def h32Sql(e: String): String =
    s"cast(conv(substring(md5($e),1,8),16,10) as bigint)"

  /** DuckDB mirror of [[h32]]. */
  def duck32(e: String): String =
    s"(('0x' || substr(md5($e), 1, 8))::BIGINT)"

  /** Driver-side mirror of [[h32]] (used to precompute LSH plane
    * matrices as literals instead of re-hashing per row). */
  def jvm32(s: String): Long = {
    val d = MessageDigest.getInstance("MD5")
      .digest(s.getBytes(StandardCharsets.UTF_8))
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }
}
