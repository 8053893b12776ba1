package graft.plans

import graft.SparkTestBase
import graft.operators.TemporalJoins
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The custom sort-merge AsOfJoinExec must agree row-for-row with the
  * composed union+window formulation on randomized input (same
  * semantics, two execution paths), and must actually appear in the
  * physical plan. */
class AsOfJoinPlanSpec extends AnyFunSuite with SparkTestBase {

  /** Deterministic pseudo-random event frame: n rows across k users,
    * ts collisions made likely (coarse second grid) to exercise the
    * tie-break path. */
  private def mkEvents(seed: String, n: Int, users: Int): DataFrame = {
    import spark.implicits._
    (0 until n).map { i =>
      val h = graft.functions.Hashing.jvm32(s"$seed:$i")
      // ~1 in 5 quotes carries a NULL payload value: the latest match
      // must contribute ALL payload columns including its NULLs (no
      // per-column fallback to an older quote — the "tearing" bug)
      val v = if (h % 5 == 0) None else Some((h % 1000) / 10.0)
      (i.toLong, h % users, (h / 7) % 50, v)
    }.toDF("event_id", "user_id", "sec", "value")
      .selectExpr("event_id", "user_id",
        "timestamp_micros(sec * 1000000) as ts", "value")
  }

  test("AsOfJoinExec equals the union+window formulation on fuzzed input") {
    val probes = mkEvents("p", 400, 13).select(
      col("user_id"), col("ts"), col("event_id").as("probe_id"))
    val quotes = mkEvents("q", 300, 13)
    val payload = Seq("event_id" -> "q_id", "value" -> "q_value")

    val viaPlan = AsOfJoinPlan.asOf(probes, quotes, "user_id", "ts", "event_id", payload)
      .select("probe_id", "q_id", "q_value")
    val viaWindow = TemporalJoins.asOf(probes, quotes, "user_id", "ts", "event_id", payload)
      .select("probe_id", "q_id", "q_value")

    def rows(df: DataFrame) = df.collect().map(_.toSeq).toSet
    val a = rows(viaPlan)
    val b = rows(viaWindow)
    assert(a === b)
    assert(a.size === 400)
    // non-degenerate: some probes matched, some did not
    assert(a.exists(_(1) != null) && a.exists(_(1) == null))

    // Downstream BUFFERING consumers over the exec's output: the
    // zero-copy payload buffer (AsOfJoinPlan.scala) is only legal
    // because buffering parents copy — drive an aggregate and a sort
    // over it so a future contract violation (a stale buffer mutated
    // after emission) corrupts a grouped count or a sorted run and
    // fails here, not in production. min/max keep the compare exact
    // (a double sum would differ in ulps across orders).
    def grouped(df: DataFrame) = df.groupBy("q_id")
      .agg(count(lit(1)).as("n"), min("q_value").as("mn"), max("q_value").as("mx"))
      .collect().map(_.toSeq).toSet
    assert(grouped(viaPlan) === grouped(viaWindow))
    def sorted(df: DataFrame) = df.orderBy("probe_id", "q_id")
      .collect().map(_.toSeq).toSeq
    assert(sorted(viaPlan) === sorted(viaWindow))
  }

  test("the physical plan contains AsOfJoinExec") {
    val probes = mkEvents("p2", 50, 5).select(
      col("user_id"), col("ts"), col("event_id").as("probe_id"))
    val quotes = mkEvents("q2", 50, 5)
    val df = AsOfJoinPlan.asOf(probes, quotes, "user_id", "ts", "event_id",
      Seq("value" -> "q_value"))
    df.count() // force planning through AQE
    val phys = df.queryExecution.executedPlan.toString
    assert(phys.contains("AsOfJoin"), s"plan missing AsOfJoinExec:\n$phys")
  }

  test("string keys work (buffer-backed key detach)") {
    import spark.implicits._
    val q = Seq(("a", 10L, 1L, 1.0), ("a", 20L, 2L, 2.0), ("b", 5L, 3L, 3.0))
      .toDF("k", "sec", "event_id", "value")
      .selectExpr("k", "timestamp_micros(sec * 1000000) as ts", "event_id", "value")
    val p = Seq(("a", 15L, 100L), ("b", 4L, 101L), ("c", 1L, 102L))
      .toDF("k", "sec", "probe_id")
      .selectExpr("k", "timestamp_micros(sec * 1000000) as ts", "probe_id")
    val got = AsOfJoinPlan.asOf(p, q, "k", "ts", "event_id", Seq("event_id" -> "q_id"))
      .select("probe_id", "q_id").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(got === Map(100L -> Some(1L), 101L -> None, 102L -> None))
  }
}
