package graft.queries

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

/** Text-tier semantics beyond the oracle gate: serial cross-checks of
  * the array-builtin formulations. */
class TextOpsSpec extends AnyFunSuite with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("t11 repetition fractions equal the serial computation; verdict splits the corpus") {
    import org.apache.spark.sql.functions._
    val docs = graft.Tables(spark, sf, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("t")).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val expected = docs.map { case (id, t) =>
      val dupTok = 10000 - (t.distinct.length * 10000L) / t.length
      val g2 = if (t.length >= 2) t.sliding(2).map(_.mkString(" ")).toSeq else Seq.empty
      val dup2 = if (g2.nonEmpty) 10000 - (g2.distinct.length * 10000L) / g2.length else 0L
      id -> ((dupTok, dup2, dup2 <= 800 && dupTok <= 7000))
    }
    val got = TextOps.all("t11_repetition").fn(spark, sf)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(got === expected)
    // the verdict must discriminate on real data, not rubber-stamp
    assert(got.values.exists(_._3) && got.values.exists(!_._3))
  }
}
