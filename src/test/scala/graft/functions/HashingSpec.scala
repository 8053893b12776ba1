package graft.functions

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

class HashingSpec extends AnyFunSuite with SparkTestBase {

  private val rnd = new scala.util.Random(42)

  test("jvm32 matches the h32 SQL expression for random strings") {
    val strings = (Seq("", "a", "the quick brown fox", "0:key agg row") ++
      (0 until 200).map(_ => rnd.alphanumeric.take(rnd.nextInt(40) + 1).mkString))
      .distinct
    // one Spark job over the whole sample, not a job per case
    import spark.implicits._
    val fromSql = strings.toDF("s")
      .selectExpr("s", Hashing.h32Sql("s") + " as h")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    strings.foreach { s =>
      assert(fromSql(s) === Hashing.jvm32(s), s"mismatch for '$s'")
    }
  }

  test("jvm32 range is unsigned 32-bit") {
    (0 until 1000).foreach { _ =>
      val h = Hashing.jvm32(rnd.nextString(12))
      assert(h >= 0L && h < (1L << 32))
    }
  }
}
