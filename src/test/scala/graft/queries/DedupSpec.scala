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

  test("d06 banding recovers EVERY pair at hamming <= 3 (pigeonhole recall proof)") {
    import spark.implicits._
    // planted distances: flips placed to defeat any single band where
    // possible — id 4 differs from id 1 in all four 8-bit bands
    val base = 0x12345678L
    val sh = Seq(
      1L -> base,
      2L -> (base ^ 3L),                                  // h=2, both flips in band 0
      3L -> (base ^ (1L | (1L << 8) | (1L << 16))),       // h=3, bands 0..2 flipped
      4L -> (base ^ (1L | (1L << 8) | (1L << 16) | (1L << 24))) // h=4, ALL bands flipped
    ).toDF("doc_id", "simhash")
    val pairs = Dedup.simhashPairs(sh)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // every hamming<=3 pair is present — including distance 2 and 3,
    // which the old 2×16-bit banding could silently miss
    assert(pairs === Set((1L, 2L, 2), (1L, 3L, 3), (2L, 3L, 3), (3L, 4L, 1)))
  }

  test("connected components: min-label propagation over planted chains") {
    import spark.implicits._
    // 1-2-3-4 is a diameter-3 chain (multiple propagation rounds);
    // 10-11 is a separate component
    val edges = Seq((2L, 1L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("a", "b")
    val got = Dedup.connectedComponents(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L))
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
