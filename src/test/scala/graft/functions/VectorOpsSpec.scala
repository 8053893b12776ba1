package graft.functions

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

/** The native vector kernels must be bit-identical to the SQL-lambda
  * formulations they replaced (which the DuckDB oracles still mirror):
  * all three fold doubles sequentially left-to-right. */
class VectorOpsSpec extends AnyFunSuite with SparkTestBase {

  private def vecs(n: Int, dims: Int): Seq[(Long, Seq[Float])] =
    (0 until n).map { i =>
      i.toLong -> (0 until dims).map { d =>
        // deterministic pseudo-random floats incl. negatives/denormal-ish
        (Hashing.jvm32(s"v:$i:$d") / 2147483648.0 - 1.0).toFloat
      }
    }

  test("dotf equals the aggregate(zip_with(...)) lambda bit-for-bit") {
    Hashing.register(spark)
    import spark.implicits._
    val df = vecs(50, 7).toDF("id", "a")
      .selectExpr("id", "a", "reverse(a) as b")
    val rows = df.selectExpr(
      "dotf(a, b) as native",
      """aggregate(zip_with(a, b, (x, y) -> cast(x as double) * y),
           cast(0 as double), (acc, v) -> acc + v) as lambda""").collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("dotf is NULL on length mismatch, matching zip_with null propagation") {
    Hashing.register(spark)
    import spark.implicits._
    val r = Seq((Seq(1f, 2f, 3f), Seq(1f, 2f))).toDF("a", "b").selectExpr(
      "dotf(a, b) as native",
      """aggregate(zip_with(a, b, (x, y) -> cast(x as double) * y),
           cast(0 as double), (acc, v) -> acc + v) as lambda""").head
    assert(r.isNullAt(0), "dotf must not silently truncate to the shorter vector")
    assert(r.isNullAt(1))
    val ok = Seq((Seq(1f, 2f), Seq(3f, 4f))).toDF("a", "b")
      .selectExpr("dotf(a, b)").head
    assert(ok.getDouble(0) === 11.0)
  }

  test("vnorm equals the sqrt-aggregate lambda bit-for-bit") {
    Hashing.register(spark)
    import spark.implicits._
    val df = vecs(50, 9).toDF("id", "embedding")
    val rows = df.selectExpr(
      "vnorm(embedding) as native",
      """sqrt(aggregate(transform(embedding, x -> cast(x as double) * x),
           cast(0 as double), (acc, v) -> acc + v)) as lambda""").collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("hyperplane_sig equals the nested-aggregate lambda") {
    Hashing.register(spark)
    import spark.implicits._
    val planes: Seq[Seq[Double]] = (0 until 16).map(p =>
      (0 until 64).map(d => Hashing.jvm32(s"pl:$p:$d") / 2147483648.0 - 1.0))
    val df = vecs(100, 64).toDF("id", "embedding")
    import org.apache.spark.sql.functions.typedLit
    val rows = df.withColumn("planes", typedLit(planes)).selectExpr(
      "hyperplane_sig(embedding, 16, 64) as native",
      """cast(aggregate(sequence(0, 15), cast(0 as bigint),
           (acc, p) -> acc + if(
             aggregate(sequence(1, 64), cast(0 as double),
               (a, i) -> a + cast(element_at(embedding, i) as double) * element_at(element_at(planes, p+1), i)) >= 0,
             shiftleft(cast(1 as bigint), p), cast(0 as bigint))) as bigint) as lambda""").collect()
    rows.foreach(r => assert(r.getLong(0) === r.getLong(1)))
    // signatures are non-degenerate on this input
    assert(rows.map(_.getLong(0)).distinct.length > 1)
  }

  test("dotl equals the SQL-lambda integer fold; length mismatch is NULL") {
    graft.functions.Hashing.register(spark)
    import spark.implicits._
    val df = Seq(
      (Seq(1L, -2L, 3L), Seq(4L, 5L, -6L)),
      (Seq(127L, 127L), Seq(127L, -127L)),
      (Seq.empty[Long], Seq.empty[Long])
    ).toDF("a", "b")
    val rows = df.selectExpr(
      "dotl(a, b) as native",
      "aggregate(zip_with(a, b, (x, y) -> x * y), 0L, (acc, v) -> acc + v) as lambda"
    ).collect()
    rows.foreach(r => assert(r.get(0) === r.get(1)))
    val mism = Seq((Seq(1L, 2L), Seq(1L)))
      .toDF("a", "b").selectExpr("dotl(a, b) as d").head
    assert(mism.isNullAt(0), "length mismatch must be NULL, not a truncated product")
  }
}
