package graft.operators

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

class SkewSpec extends AnyFunSuite with SparkTestBase {

  test("saltedJoin equals the plain join on skewed data") {
    import spark.implicits._
    // 90% of the big side lands on one hot key
    val big = (0 until 5000).map(i => (if (i % 10 == 0) i % 7 else 999, i))
      .toDF("k", "v")
    val small = (0 until 1000).map(i => (i, s"dim$i")).toDF("k", "name")

    val plain = big.join(small, "k").select("k", "v", "name")
      .collect().map(_.toString).sorted
    val salted = Skew.saltedJoin(big, small, "k", buckets = 8)
      .select("k", "v", "name")
      .collect().map(_.toString).sorted
    assert(salted === plain)
  }

  test("hotKeys surfaces the skewed key first") {
    import spark.implicits._
    val big = (0 until 1000).map(i => (if (i % 10 == 0) i % 7 else 999, i))
      .toDF("k", "v")
    val top = Skew.hotKeys(big, "k", topK = 1).head
    assert(top.getInt(0) === 999)
  }
}
