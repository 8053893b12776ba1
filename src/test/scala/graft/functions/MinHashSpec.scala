package graft.functions

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

/** The native kernels must equal the SQL-lambda formulation they
  * replaced (which the DuckDB oracles still mirror). */
class MinHashSpec extends AnyFunSuite with SparkTestBase {

  private val P = MinHash.P

  test("hashed_shingles equals the lambda formulation") {
    Hashing.register(spark)
    import spark.implicits._
    val docs = Seq(
      "key agg row scan slow fast table value",
      "a b c",
      "x y",             // < 3 tokens -> empty set
      "dup dup dup dup"  // repeated shingles -> dedup
    ).zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val native = docs.selectExpr("id", "hashed_shingles(split(text, ' '), 3) as hv")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    // sequence(1, 0) counts DOWN in Spark, so restrict the lambda
    // formulation to docs with >= 3 tokens (the short doc is asserted
    // empty against the native kernel below)
    val lambda = docs.where("size(split(text, ' ')) >= 3").selectExpr("id",
      s"""transform(array_distinct(transform(sequence(1, size(split(text,' '))-2),
            i -> concat_ws(' ', slice(split(text,' '), i, 3)))), s -> ${"h32(s)"} % $P) as hv""")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    assert(native(0) === lambda(0))
    assert(native(1) === lambda(1))
    assert(native(2) === Set.empty)
    assert(native(3) === lambda(3))
    assert(native(3).size === 1)
  }

  test("hashed_chargrams matches jvm32 of each distinct gram") {
    Hashing.register(spark)
    import spark.implicits._
    val text = "abcdabcd"
    val got = Seq(text).toDF("t")
      .selectExpr("hashed_chargrams(t, 4) as hv")
      .head.getSeq[Long](0).toSet
    val want = text.sliding(4).toSeq.distinct
      .map(g => Hashing.jvm32(g) % P).toSet
    assert(got === want)
  }

  test("hashed_chargrams slices by code points (supplementary plane)") {
    Hashing.register(spark)
    import spark.implicits._
    // 😀 is one code point but two UTF-16 chars; Spark's substring
    // counts code points, and the kernel must agree with it.
    val text = "a😀bc😁d"
    val got = Seq(text).toDF("t")
      .selectExpr("hashed_chargrams(t, 3) as hv")
      .head.getSeq[Long](0).toSet
    val sql = Seq(text).toDF("t").selectExpr(
      s"""transform(array_distinct(transform(sequence(1, char_length(t)-2),
            i -> substring(t, i, 3))), g -> h32(g) % $P) as hv""")
      .head.getSeq[Long](0).toSet
    assert(got === sql)
    assert(got.size === 4) // 6 code points -> 4 grams, all distinct
  }

  test("affine_minhash equals per-permutation mins") {
    Hashing.register(spark)
    import spark.implicits._
    val hv = Seq(5L, 99L, 1234567L, P - 1)
    val got = Seq(Tuple1(hv)).toDF("hv")
      .selectExpr("affine_minhash(hv, 16) as sig")
      .head.getSeq[Long](0)
    val a = MinHash.coefA(16); val b = MinHash.coefB(16)
    val want = (0 until 16).map(j => hv.map(h => (a(j) * h + b(j)) % P).min)
    assert(got === want)
    // empty set -> empty signature
    val empty = Seq(Tuple1(Seq.empty[Long])).toDF("hv")
      .selectExpr("affine_minhash(hv, 16) as sig").head.getSeq[Long](0)
    assert(empty.isEmpty)
  }

  test("h32 native equals jvm32 and the md5-hex parse") {
    Hashing.register(spark)
    import spark.implicits._
    val ss = Seq("", "a", "the quick brown fox", "0:x y z")
    val rows = ss.toDF("s").selectExpr("s", "h32(s) as n",
      "cast(conv(substring(md5(s),1,8),16,10) as bigint) as o").collect()
    rows.foreach { r =>
      assert(r.getLong(1) === r.getLong(2))
      assert(r.getLong(1) === Hashing.jvm32(r.getString(0)))
    }
  }
}
