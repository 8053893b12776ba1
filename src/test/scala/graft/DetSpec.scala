package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DetSpec extends AnyFunSuite with SparkTestBase {

  private val rnd = new scala.util.Random(7)

  test("dsum is order- and partitioning-independent") {
    import spark.implicits._
    (0 until 5).foreach { _ =>
      val xs = List.fill(300)((rnd.nextDouble() - 0.5) * 2e6)
      val a = xs.toDF("v").repartition(7)
      val b = rnd.shuffle(xs).toDF("v").repartition(3)
      val sa = a.agg(Det.dsum(col("v"))).head.getDouble(0)
      val sb = b.agg(Det.dsum(col("v"))).head.getDouble(0)
      assert(java.lang.Double.doubleToLongBits(sa) ===
        java.lang.Double.doubleToLongBits(sb))
    }
  }

  test("davg returns null on empty input") {
    import spark.implicits._
    val row = Seq.empty[Double].toDF("v").agg(Det.davg(col("v"))).head
    assert(row.isNullAt(0))
  }
}
