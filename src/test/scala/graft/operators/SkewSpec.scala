package graft.operators

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

class SkewSpec extends AnyFunSuite with SparkTestBase {

  test("saltedJoin equals the plain join on skewed data") {
    import spark.implicits._
    // 90% of the big side lands on one hot key
    val big = (0 until 5000).map(i => (if (i % 10 == 0) i % 7 else 999, i))
      .toDF("k", "v")
    val small = (0 until 1000).map(i => (i, s"dim$i")).toDF("k", "name")

    val plain = big.join(small, "k").select("k", "v", "name")
      .collect().map(_.toString).sorted
    val salted = Skew.saltedJoin(big, small, "k", buckets = 8)
      .select("k", "v", "name")
      .collect().map(_.toString).sorted
    assert(salted === plain)
  }

  test("hotKeys surfaces the skewed key first") {
    import spark.implicits._
    val big = (0 until 1000).map(i => (if (i % 10 == 0) i % 7 else 999, i))
      .toDF("k", "v")
    val top = Skew.hotKeys(big, "k", topK = 1).head
    assert(top.getInt(0) === 999)
  }

  test("AQE splits the skewed shuffle-join partition at runtime (the claimed skew path)") {
    // Several query docs claim "bucket/key skew splits under AQE like
    // any equi-join" — prove the mechanism once, at test thresholds
    // (production thresholds are MB-scale; the MECHANISM is identical).
    import spark.implicits._
    val confs = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16384",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8192",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force a shuffle join
      // Sessions.scaleDefensive keeps RUNTIME broadcast at 10MB — the
      // dim side would convert to broadcast mid-execution and dodge
      // the skew machinery this test exists to prove; pin it off too
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // NOTE: nothing downstream may require hash distribution on k —
      // OptimizeSkewedJoin refuses to split when a consumer needs the
      // join's partitioning (a groupBy("k") here silently disables it);
      // the unkeyed count has no required distribution
      val big = (0 until 200000)
        .map(i => (if (i % 20 == 0) i % 13 else 9999, i)).toDF("k", "v")
      val dim = (0 until 10000).map(i => (i, s"dim$i")).toDF("k", "name")
      val j = big.join(dim, "k")
      // collect j ITSELF so the inspected queryExecution is the one
      // AQE finalized (a derived .count() would execute a different plan)
      assert(j.collect().length === 200000) // AQE re-plans DURING execution
      val plan = j.queryExecution.executedPlan.toString.toLowerCase
      assert(plan.contains("skew=true") || plan.contains("skewed"),
        s"AQE did not mark the hot partition as skewed:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
