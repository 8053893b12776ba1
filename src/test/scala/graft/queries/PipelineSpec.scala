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
