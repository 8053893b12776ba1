package graft.queries

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

/** t32 watermark detection + g09 HITS — semantic pins beyond the
  * oracle equality gate. */
class TextSignalsSpec extends AnyFunSuite with SparkTestBase {

  private val d = "/root/testdata/sf0.001"

  test("t32: the planted chain is mostly green and detection separates planted from clean") {
    // the driver-side sampler really biased the chain: ≥70% of its
    // pairs are green (γ=1/4 would give ~25%)
    val chain = TextSignals.wmChain
    val green = chain.sliding(2).count { case Seq(a, b) =>
      graft.functions.Hashing.jvm32(s"wm:$a:$b") % 4 == 0 }
    assert(green >= (chain.size - 1) * 7 / 10, s"only $green/16 green")

    val rows = TextSignals.all("t32_watermark_detect").fn(spark, d)
      .selectExpr("planted", "n_pairs", "n_green",
        "cast(z as double) as z", "flagged")
      .collect()
    val (p, u) = rows.partition(_.getLong(0) == 1L)
    assert(p.nonEmpty && u.nonEmpty)
    // every planted doc long enough for the z-test flags; z > 4 needs
    // T ≥ ~29 at ~57% green density, so pin at T ≥ 40 with margin
    val longPlanted = p.filter(_.getLong(1) >= 40)
    assert(longPlanted.nonEmpty)
    assert(longPlanted.forall(_.getLong(4) === 1L),
      "a long planted doc escaped detection")
    // clean text sits near the null — not exactly AT it: the green
    // indicator is deterministic per pair TYPE, so a corpus's common
    // pairs drag every doc the same way (sf0.001 measures −0.6σ).
    // What matters for detection is distance from the 4σ line.
    val meanU = u.map(_.getDouble(3)).sum / u.length
    assert(math.abs(meanU) < 1.5, s"clean-doc mean z = $meanU")
    assert(u.count(_.getLong(4) == 1L) <= u.length / 100,
      "clean docs flagged above the 4-sigma false-positive budget")
    // planted docs' green fraction is biased far above γ
    val gfP = p.map(r => r.getLong(2).toDouble / r.getLong(1)).sum / p.length
    val gfU = u.map(r => r.getLong(2).toDouble / r.getLong(1)).sum / u.length
    assert(gfP > gfU + 0.15, s"green-fraction separation too weak: $gfP vs $gfU")
  }

  test("g09: HITS scores are alternating-path counts — parity-consistent and degree-dominated") {
    val rows = graft.queries.Graph.all("g09_hits").fn(spark, d).collect()
    val (supp, cust) = rows.partition(_.getString(1) == "supplier")
    assert(supp.nonEmpty && cust.nonEmpty)
    // bipartite encoding: suppliers odd, customers even
    assert(supp.forall(_.getLong(0) % 2 == 1))
    assert(cust.forall(_.getLong(0) % 2 == 0))
    // unnormalized integer iterates are strictly positive
    assert(rows.forall(_.getLong(2) > 0))
    // a2(v) = Σ_{u→v} h1(u) ≥ indegree(v) since h1 ≥ 1 — authority
    // scores dominate the plain indegree everywhere
    val a2 = supp.map(r => r.getLong(0) -> r.getLong(2)).toMap
    val edges = graft.Tables(spark, d, "orders").select("o_orderkey", "o_custkey")
      .join(graft.Tables(spark, d, "lineitem").selectExpr(
        "l_orderkey", "l_suppkey"),
        org.apache.spark.sql.functions.col("o_orderkey") ===
          org.apache.spark.sql.functions.col("l_orderkey"))
      .selectExpr("o_custkey * 2 as src", "l_suppkey * 2 + 1 as dst")
      .distinct()
    val indegree = edges.groupBy("dst").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(indegree.forall { case (n, din) => a2.getOrElse(n, 0L) >= din })
  }
}
