package graft.queries

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

/** Pipeline-tier semantics on the sf0.001 testdata. */
class PipelineSpec extends AnyFunSuite with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("p03 seq packing is range-partition-width invariant") {
    // the two-phase prefix sum must produce the exact single-window
    // answer at ANY width — per-partition offsets compose. Widths 2
    // and 13 force different partition boundaries (13 > distinct-ish
    // ranges also exercises empty partitions).
    def run(w: Int): Map[Long, (Int, Long)] =
      Pipeline.seqPack(spark, sf, w).collect()
        .map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2))).toMap
    val a = run(2)
    val b = run(13)
    assert(a === b)
    assert(a.nonEmpty)
  }

  test("p04 source mix: deterministic, never oversamples, takes the heaviest source whole") {
    // sf0.01: 20 sources x 25 docs, weights 2:3:4:5 by number%4 ->
    // feasible total 350, rates {4000,6000,8000,10000} bp. Weight-5
    // sources get rate 10000 = every doc, deterministically.
    val sf01 = "/root/testdata/sf0.01"
    def run() = Pipeline.all("p04_source_mix").fn(spark, sf01)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val a = run()
    assert(a.toSet === run().toSet) // pure function of ids
    val bySource = a.groupBy(_._2).view.mapValues(_.length).toMap
    for ((src, n) <- bySource) assert(n <= 25, s"$src oversampled: $n")
    for (k <- Seq(3, 7, 11, 15, 19))
      assert(bySource(s"src$k") === 25, s"limiting-weight src$k not taken whole")
  }

  test("p03 seq_id equals the serial concat-then-chunk assignment") {
    val rows = Pipeline.seqPack(spark, sf, 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      .sortBy(_._1)
    var cum = 0L
    rows.foreach { case (id, n, seqId) =>
      assert(seqId === cum / 256, s"doc $id")
      cum += n
    }
  }
}
