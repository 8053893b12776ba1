package graft.queries

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

/** Similarity-tier invariants on the sf0.001 testdata. */
class SimilaritySpec extends AnyFunSuite with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("s09 recall harness: one row per probe, integer recall in range, hits bounded by k") {
    val rows = Similarity.all("s09_ann_recall").fn(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(_._1).distinct.length === rows.length)
    assert(rows.nonEmpty)
    rows.foreach { case (probe, hits, bp) =>
      assert(hits >= 0 && hits <= 3, s"probe $probe hits $hits")
      assert(bp === hits * 10000 / 3, s"probe $probe recall_bp $bp")
    }
  }

  test("s01 heap-aggregate top-k equals the window formulation on real embeddings") {
    // the window form (row_number over probe_id) is the semantic
    // reference; the shipped bounded-heap aggregate must agree row for
    // row — ordering, ties (cosine desc, cand_id asc) and all
    val agg = Similarity.all("s01_topk_cosine").fn(spark, sf)
      .collect().map(_.toSeq).toSet
    val win = Similarity.windowTopk(spark, sf, 5)
      .collect().map(_.toSeq).toSet
    assert(agg === win)
    assert(agg.size === 50) // 10 probes x 5
  }

  test("s10 semantic clusters: labels are component minima over the s04 pair graph") {
    val pairs = Similarity.all("s04_embed_dup").fn(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val clusters = Similarity.all("s10_embed_clusters").fn(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every edge endpoint is labeled, both ends share a label, and
    // the label is never larger than the member
    pairs.foreach { case (a, b) =>
      assert(clusters.contains(a) && clusters.contains(b), s"($a,$b) unlabeled")
      assert(clusters(a) === clusters(b), s"($a,$b) split across clusters")
      assert(clusters(a) <= math.min(a, b))
    }
    // only vertices that appear in an edge are labeled
    val vertices = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    assert(clusters.keySet === vertices)
  }
}
