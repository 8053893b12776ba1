package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TemporalJoinsSpec extends AnyFunSuite with SparkTestBase {

  test("NULL keys and NULL timestamps never match — both formulations agree") {
    import spark.implicits._
    // null-keyed quote AND probe share the window's NULL partition;
    // a null-ts quote sorts first under asc ordering — none may match
    val q = Seq(
      (Option(1L), Option(10L), 100L, 1.0),
      (Option.empty[Long], Option(5L), 101L, 2.0), // null key
      (Option(1L), Option.empty[Long], 102L, 3.0)  // null ts
    ).toDF("user_id", "sec", "event_id", "value")
      .selectExpr("user_id", "timestamp_micros(sec * 1000000) as ts", "event_id", "value")
    val p = Seq(
      (Option(1L), Option(15L), 900L),
      (Option.empty[Long], Option(15L), 901L) // null-key probe
    ).toDF("user_id", "sec", "probe_id")
      .selectExpr("user_id", "timestamp_micros(sec * 1000000) as ts", "probe_id")
    def run(df: org.apache.spark.sql.DataFrame) =
      df.select("probe_id", "q_id").collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    val viaWindow = run(TemporalJoins.asOf(p, q, "user_id", "ts", "event_id",
      Seq("event_id" -> "q_id")))
    val viaPlan = run(graft.plans.AsOfJoinPlan.asOf(p, q, "user_id", "ts", "event_id",
      Seq("event_id" -> "q_id")))
    val want = Map(900L -> Some(100L), 901L -> None)
    assert(viaWindow === want)
    assert(viaPlan === want)
  }

  test("asOf picks latest at-or-before quote, ties by greatest id, null when none") {
    import spark.implicits._
    // user 1: quotes at t=10 (two, ids 100/101) and t=20; user 2: t=50
    val q = Seq(
      (1L, 10L, 100L, 1.0),
      (1L, 10L, 101L, 1.5),
      (1L, 20L, 102L, 2.0),
      (2L, 50L, 200L, 9.0)
    ).toDF("user_id", "sec", "event_id", "value")
      .selectExpr("user_id", "timestamp_micros(sec * 1000000) as ts", "event_id", "value")
    val p = Seq(
      (1L, 10L, 900L), // equal ts -> sees quote id 101 (tie: greatest id)
      (1L, 15L, 901L), // between -> quote 101
      (1L, 25L, 902L), // after all -> quote 102
      (2L, 40L, 903L), // before user 2's only quote -> null
      (3L, 99L, 904L)  // user with no quotes -> null
    ).toDF("user_id", "sec", "probe_id")
      .selectExpr("user_id", "timestamp_micros(sec * 1000000) as ts", "probe_id")
    val got = TemporalJoins.asOf(p, q, "user_id", "ts", "event_id",
        Seq("event_id" -> "q_id", "value" -> "q_value"))
      .select("probe_id", "q_id", "q_value")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSet
    assert(got === Set(
      (900L, Some(101L), Some(1.5)),
      (901L, Some(101L), Some(1.5)),
      (902L, Some(102L), Some(2.0)),
      (903L, None, None),
      (904L, None, None)))
  }

  test("recentPairs includes both window ends and respects the key") {
    import spark.implicits._
    val p = Seq((1L, 100L, 1L), (2L, 100L, 2L))
      .toDF("user_id", "sec", "p_id")
      .selectExpr("user_id", "p_id", "timestamp_micros(sec * 1000000) as p_ts")
    val x = Seq(
      (1L, 100L, 10L), // gap 0 -> in
      (1L, 90L, 11L),  // gap 10s == window -> in
      (1L, 89L, 12L),  // gap 11s -> out
      (1L, 101L, 13L), // after probe -> out
      (2L, 95L, 20L)   // other user's probe only
    ).toDF("user_id", "sec", "x_id")
      .selectExpr("user_id", "x_id", "timestamp_micros(sec * 1000000) as x_ts")
    val got = TemporalJoins.recentPairs(p, "p_ts", x, "x_ts", "user_id", 10000000L)
      .select("p_id", "x_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 10L), (1L, 11L), (2L, 20L)))
  }

  test("j05 bucketized overlap join equals the direct theta join; plan is an equi-join") {
    val sf = "/root/testdata/sf0.001"
    val df = graft.queries.Temporal.all("j05_interval_overlap").fn(spark, sf)
    // the semantic reference: the same overlap as a per-key theta join
    val li = graft.Tables(spark, sf, "lineitem").selectExpr(
      "l_orderkey", "l_linenumber", "l_suppkey",
      "cast(unix_date(cast(l_shipdate as date)) as bigint) as sd",
      "cast(unix_date(cast(l_shipdate as date)) + (cast(l_quantity as int) % 7 + 1) as bigint) as rd")
    val theta = li.as("a").join(li.as("b"),
        org.apache.spark.sql.functions.expr(
          """a.l_suppkey = b.l_suppkey
             and (a.l_orderkey < b.l_orderkey
                  or (a.l_orderkey = b.l_orderkey and a.l_linenumber < b.l_linenumber))
             and a.sd <= b.rd and b.sd <= a.rd"""))
      .selectExpr("a.l_orderkey", "a.l_linenumber", "b.l_orderkey", "b.l_linenumber",
        "a.l_suppkey", "least(a.rd, b.rd) - greatest(a.sd, b.sd) + 1")
    val got = df.collect().map(_.toSeq).toSet
    val want = theta.collect().map(_.toSeq).toSet
    assert(got === want)
    assert(got.nonEmpty)
    // and the shipped plan must be the equi-join, not the theta shape
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"), plan)
    assert(plan.contains("SortMergeJoin") || plan.contains("BroadcastHashJoin")
      || plan.contains("ShuffledHashJoin"), plan)
  }

  test("j06 nearest equals the serial nearest with the pinned tie order; both directions win somewhere") {
    val sf = "/root/testdata/sf0.001"
    val ev = graft.queries.Relational.events(spark, sf)
      .selectExpr("event_id", "unix_micros(ts) as us", "user_id", "event_type", "value")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3), r.getDouble(4)))
    val clicks = ev.filter(_._4 == "click").groupBy(_._3)
    val expected = ev.filter(_._4 == "purchase").map { case (pid, pus, u, _, _) =>
      val cs = clicks.getOrElse(u, Array.empty)
      if (cs.isEmpty) pid -> None
      else {
        // the pinned order: |Δ| asc, backward before forward, then
        // greatest id (backward) / smallest id (forward)
        val best = cs.minBy { case (cid, cus, _, _, _) =>
          val back = cus <= pus
          (math.abs(pus - cus), if (back) 0 else 1, if (back) -cid else cid)
        }
        pid -> Some((best._1, best._5, pus - best._2))
      }
    }.toMap
    val got = graft.queries.Temporal.all("j06_nearest_join").fn(spark, sf)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(2)) None
         else Some((r.getLong(2), r.getDouble(3), r.getLong(4))))).toMap
    assert(got === expected)
    // the corpus must exercise both directions, or the CASE is untested
    val deltas = got.values.flatten.map(_._3)
    assert(deltas.exists(_ > 0) && deltas.exists(_ < 0),
      "nearest never chose one of the two directions on this corpus")
  }

  test("j07 point-in-time: strictly earlier only — no same-day leakage, serial agreement") {
    val sf = "/root/testdata/sf0.001"
    val orders = graft.Tables(spark, sf, "orders")
      .selectExpr("o_orderkey", "o_custkey",
        "cast(unix_date(cast(o_orderdate as date)) as bigint) as day", "o_totalprice")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val byCust = orders.groupBy(_._2)
    val expected = orders.map { case (k, c, day, _) =>
      val prior = byCust(c).filter(_._3 < day)
      k -> (if (prior.isEmpty) None
            else {
              val best = prior.maxBy(p => (p._3, p._1))
              Some((best._1, best._4, day - best._3))
            })
    }.toMap
    val got = graft.queries.Temporal.all("j07_pit_join").fn(spark, sf).collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(2)) None
         else Some((r.getLong(2), r.getDouble(3), r.getLong(4))))).toMap
    assert(got === expected)
    // leakage guard: staleness is strictly positive everywhere
    assert(got.values.flatten.forall(_._3 >= 1))
    // the corpus exercises the interesting cases: repeat customers with
    // real priors AND first orders with none
    assert(got.values.exists(_.isDefined) && got.values.exists(_.isEmpty))
  }

  test("j08 coalesce: spans equal the serial interval merge, are disjoint, and count every interval") {
    val sf01 = "/root/testdata/sf0.01"
    val spans = graft.queries.Temporal.all("j08_interval_coalesce").fn(spark, sf01)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val ivs = graft.Tables(spark, sf01, "lineitem").selectExpr(
        "l_suppkey",
        "cast(unix_date(cast(l_shipdate as date)) as bigint) as sd",
        "cast(unix_date(cast(l_shipdate as date)) + (cast(l_quantity as int) % 7 + 1) as bigint) as rd")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // serial sweep per supplier
    val expected = ivs.groupBy(_._1).flatMap { case (k, xs) =>
      val sorted = xs.map(t => (t._2, t._3)).sortBy(identity).toList
      val merged = sorted.drop(1).foldLeft(List((sorted.head._1, sorted.head._2, 1L))) {
        case ((s0, e0, n) :: rest, (s1, e1)) =>
          if (s1 <= e0 + 1) (s0, math.max(e0, e1), n + 1) :: rest
          else (s1, e1, 1L) :: (s0, e0, n) :: rest
        case (Nil, _) => Nil
      }
      merged.map { case (s0, e0, n) => (k, s0, e0, n) }
    }.toSet
    assert(spans.toSet === expected)
    // spans per supplier are disjoint with real gaps between them
    spans.groupBy(_._1).foreach { case (k, ss) =>
      val ordered = ss.sortBy(_._2)
      ordered.zip(ordered.drop(1)).foreach { case (a, b) =>
        assert(b._2 > a._3 + 1, s"supplier $k spans touch or overlap")
      }
    }
    // every interval is counted exactly once
    assert(spans.map(_._4).sum === ivs.length.toLong)
    // the merge must merge: some span holds many intervals
    assert(spans.exists(_._4 > 1), "no interval ever merged - vacuous")
  }

  test("j09 peak concurrency: equals the serial sweep; end-before-start at equal dates") {
    val sf = "/root/testdata/sf0.001"
    val ivs = graft.Tables(spark, sf, "orders")
      .join(graft.Tables(spark, sf, "customer"),
        org.apache.spark.sql.functions.col("o_custkey") ===
          org.apache.spark.sql.functions.col("c_custkey"))
      .selectExpr("c_nationkey", "o_orderkey", "cast(o_orderdate as date) as d")
      .collect()
      .map(r => (r.getAs[Number](0).longValue, r.getLong(1), r.getDate(2).toLocalDate))
    // serial sweep per nation: (+1 at d, -1 at d+30), ends before starts
    val expect = ivs.groupBy(_._1).map { case (nk, rows) =>
      val ev = rows.flatMap { case (_, k, d) =>
        Seq((d, 1, k), (d.plusDays(30), -1, k))
      }.sortBy { case (d, delta, k) => (d.toEpochDay, delta, k) }
      var run = 0L; var peak = Long.MinValue
      var firstPeak: java.time.LocalDate = null
      ev.foreach { case (d, delta, _) =>
        run += delta
        if (run > peak) { peak = run; firstPeak = d }
      }
      nk -> (peak, firstPeak)
    }
    val got = graft.SparkEntry.queries("j09_max_concurrent")(spark, sf).collect()
      .map(r => r.getAs[Number](0).longValue -> (r.getLong(1), r.getDate(2).toLocalDate))
      .toMap
    assert(got === expect)
    // non-vacuous: some nation genuinely overlaps orders
    assert(got.values.exists(_._1 > 1), "no nation ever had 2 concurrent orders")
  }

  test("j10 Allen census: equals the serial classification; partitions j05's pair set") {
    val sf = "/root/testdata/sf0.001"
    val got = graft.queries.Temporal.all("j10_allen_relations").fn(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // serial reference: classify every theta-join overlap pair
    val li = graft.Tables(spark, sf, "lineitem").selectExpr(
        "l_orderkey", "l_linenumber", "l_suppkey",
        "cast(unix_date(cast(l_shipdate as date)) as bigint) as sd",
        "cast(unix_date(cast(l_shipdate as date)) + (cast(l_quantity as int) % 7 + 1) as bigint) as rd")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    def rel(as: Long, ar: Long, bs: Long, br: Long): String =
      if (as == bs && ar == br) "equals"
      else if (as == bs && ar < br) "starts"
      else if (as == bs) "started_by"
      else if (ar == br && as < bs) "finished_by"
      else if (ar == br) "finishes"
      else if (as < bs && ar > br) "contains"
      else if (as > bs && ar < br) "during"
      else if (as < bs && ar == bs) "meets"
      else if (as > bs && br == as) "met_by"
      else if (as < bs) "overlaps"
      else "overlapped_by"
    val bySupp = li.groupBy(_._3)
    val expect = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    bySupp.values.foreach { rows =>
      for {
        a <- rows; b <- rows
        if (a._1 < b._1 || (a._1 == b._1 && a._2 < b._2)) && a._4 <= b._5 && b._4 <= a._5
      } expect(rel(a._4, a._5, b._4, b._5)) += 1L
    }
    assert(got === expect.toMap)
    // the census partitions j05's candidate set exactly
    val j05n = graft.queries.Temporal.all("j05_interval_overlap").fn(spark, sf).count()
    assert(got.values.sum === j05n)
    // non-degenerate: more than one relation occurs in the corpus
    assert(got.size > 1, s"only relations: ${got.keySet}")
  }

  test("allen CASE property: total, exclusive vs the formal definitions, inverse-consistent") {
    import spark.implicits._
    // seeded random overlapping closed-interval pairs, both orientations
    val rnd = new scala.util.Random(42)
    val pairs = Iterator.continually {
      val as = rnd.nextInt(40).toLong; val ar = as + rnd.nextInt(8)
      val bs = rnd.nextInt(40).toLong; val br = bs + rnd.nextInt(8)
      (as, ar, bs, br)
    }.filter { case (as, ar, bs, br) => as <= br && bs <= ar } // overlap only
      .take(2000).toSeq
    // evaluate the SHIPPED SQL CASE itself, one batch job
    val sql = graft.queries.Temporal.allenCase
    val got = pairs.toDF("a_sd", "a_rd", "b_sd", "b_rd")
      .selectExpr(s"$sql as r").collect().map(_.getString(0))
    // the 11 formal definitions (closed integer intervals)
    def defs(as: Long, ar: Long, bs: Long, br: Long): Map[String, Boolean] = Map(
      "equals" -> (as == bs && ar == br),
      "starts" -> (as == bs && ar < br),
      "started_by" -> (as == bs && ar > br),
      "finished_by" -> (ar == br && as < bs),
      "finishes" -> (ar == br && as > bs),
      "contains" -> (as < bs && ar > br),
      "during" -> (as > bs && ar < br),
      "meets" -> (as < bs && ar == bs && ar < br),
      "met_by" -> (bs < as && br == as && br < ar),
      "overlaps" -> (as < bs && bs < ar && ar < br),
      "overlapped_by" -> (bs < as && as < br && br < ar))
    val inverse = Map("equals" -> "equals", "starts" -> "started_by",
      "started_by" -> "starts", "finished_by" -> "finishes",
      "finishes" -> "finished_by", "contains" -> "during",
      "during" -> "contains", "meets" -> "met_by", "met_by" -> "meets",
      "overlaps" -> "overlapped_by", "overlapped_by" -> "overlaps")
    pairs.zip(got).foreach { case ((as, ar, bs, br), r) =>
      val d = defs(as, ar, bs, br)
      // exactly ONE definition holds, and it is the classified one
      assert(d.values.count(identity) === 1, s"($as,$ar,$bs,$br) not partitioned: $d")
      assert(d(r), s"($as,$ar,$bs,$br) classified $r but that definition is false")
    }
    // inverse-consistency: swapping the operands maps to the inverse relation
    val swapped = pairs.map { case (as, ar, bs, br) => (bs, br, as, ar) }
      .toDF("a_sd", "a_rd", "b_sd", "b_rd")
      .selectExpr(s"$sql as r").collect().map(_.getString(0))
    got.zip(swapped).zip(pairs).foreach { case ((r, rs), p) =>
      assert(rs === inverse(r), s"$p: $r swapped to $rs, expected ${inverse(r)}")
    }
    // the generator genuinely exercises the space
    assert(got.distinct.length === 11, s"only ${got.distinct.toSet} generated")
  }
}
