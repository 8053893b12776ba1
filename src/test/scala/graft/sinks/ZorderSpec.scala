package graft.sinks

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

/** sink26's physical claims — the gate oracle pins the per-chunk
  * bounding-box STATS; this spec pins what the stats are FOR:
  * the written layout actually skips files for a 2-D box query,
  * which a 1-D sort order cannot.
  */
class ZorderSpec extends AnyFunSuite with SparkTestBase {

  // gate scale, not sf0.001: the fixed box (pk 100-300, sk 10-30)
  // needs the sf0.01 key domains (pk <= 2000, sk <= 100) to land in
  // the interior of the bucket grid
  private val sf = "/root/testdata/sf0.01"

  test("z-order layout: one directory per chunk, and the 2-D box skips most of them") {
    val df = graft.sinks.SinkQueries.all("sink26_zorder_cluster").fn(spark, sf)
    val rows = df.collect()
    val chunks = rows.length
    assert(chunks > 8, s"expected a spread of z-chunks, got $chunks")

    // the write really is one directory per chunk value
    val out = new java.io.File(
      graft.sinks.SinkQueries.scratchPath("zorder"))
    val dirs = out.listFiles().filter(f =>
      f.isDirectory && f.getName.startsWith("chunk="))
    assert(dirs.length == chunks,
      s"dirs ${dirs.length} != chunk stats rows $chunks")

    // SKIPPING: the fixed box (pk in [100,300], sk in [10,30]) must
    // be answerable from a strict minority of chunks — the entire
    // point of interleaving both dimensions' bits. (A pk-sorted
    // layout at the same file count answers any sk-only predicate
    // from ALL files; here both dimensions bound every chunk.)
    val hit = rows.count(_.getAs[Long]("box_hit") == 1L)
    assert(hit > 0, "box must land somewhere")
    assert(hit * 2 < chunks, s"z-order should skip a majority: hit $hit of $chunks")

    // every chunk's bounding box is tight on BOTH dimensions: no
    // chunk spans more than half of either domain (the 1-D failure
    // mode — full-range boxes on the unsorted dimension — is absent)
    val mpk = rows.map(_.getAs[Long]("pk_max")).max
    val msk = rows.map(_.getAs[Long]("sk_max")).max
    rows.foreach { r =>
      assert(r.getAs[Long]("pk_max") - r.getAs[Long]("pk_min") <= mpk / 2 + 1,
        s"chunk ${r.getAs[Long]("chunk")} spans pk too widely")
      assert(r.getAs[Long]("sk_max") - r.getAs[Long]("sk_min") <= msk / 2 + 1,
        s"chunk ${r.getAs[Long]("chunk")} spans sk too widely")
    }
  }

  test("morton interleave is order-preserving per 4-bit cell: chunk recovers (pb, sb) exactly") {
    // decode the Morton code back to its two bucket coordinates and
    // check the round trip over the full 8-bit domain — the bit
    // placement the gate and oracle both rely on
    for (pb <- 0 until 16; sb <- 0 until 16) {
      val z = ((pb & 1) << 1) | ((pb & 2) << 2) | ((pb & 4) << 3) | ((pb & 8) << 4) |
        (sb & 1) | ((sb & 2) << 1) | ((sb & 4) << 2) | ((sb & 8) << 3)
      val pbBack = ((z >> 1) & 1) | ((z >> 2) & 2) | ((z >> 3) & 4) | ((z >> 4) & 8)
      val sbBack = (z & 1) | ((z >> 1) & 2) | ((z >> 2) & 4) | ((z >> 3) & 8)
      assert(pbBack == pb && sbBack == sb, s"roundtrip failed at ($pb, $sb) -> $z")
    }
  }
}
