package graft.queries

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

/** Dedup-tier semantics on the sf0.001 testdata (fast) plus planted
  * invariants that hold at any scale. */
class DedupSpec extends AnyFunSuite with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("d03 LSH pairs are symmetric-free, above threshold, and verified") {
    val rows = Dedup.all("d03_lsh_pairs").fn(spark, sf).collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("d1") < r.getAs[Long]("d2")) // canonical order
      assert(r.getAs[Double]("jac") >= 0.7)             // verified, not just bucketed
    }
  }

  test("exact-dup groups partition the table") {
    val df = Dedup.all("d01_exact_dup").fn(spark, sf)
    val total = df.selectExpr("sum(n_docs)").head.getLong(0)
    val docs = graft.Tables(spark, sf, "documents").count()
    assert(total === docs)
  }

  test("simhash of identical token multisets is identical") {
    val df = Dedup.all("d04_simhash").fn(spark, sf)
    // deterministic: same input -> same simhash on repeated run
    val a = df.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val b = Dedup.all("d04_simhash").fn(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(a === b)
    // 32-bit range
    assert(a.values.forall(h => h >= 0 && h < (1L << 32)))
  }
}
