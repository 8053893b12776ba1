package graft.queries

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

/** Relational-tier semantics that the oracle gate alone can't pin
  * (serial recomputes of order-dependent logic). */
class RelationalSpec extends AnyFunSuite with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("q33 funnel equals the serial per-user replay; all stages populated") {
    val out = Relational.all("q33_funnel").fn(spark, sf).collect()
      .map(r => r.getAs[Long]("user_id") ->
        (Option(r.getAs[java.lang.Long]("t_view_ms")).map(_.toLong),
          Option(r.getAs[java.lang.Long]("t_click_ms")).map(_.toLong),
          Option(r.getAs[java.lang.Long]("t_purchase_ms")).map(_.toLong),
          r.getAs[Int]("stage"))).toMap
    // serial replay: first view, first click in (t1, t1+6h], first
    // purchase in (t2, t2+6h]
    val H6 = 6L * 3600 * 1000
    val ev = Relational.events(spark, sf)
      .selectExpr("user_id", "unix_millis(ts) as ms", "event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val expected = ev.groupBy(_._1).flatMap { case (u, es) =>
      def firstIn(tpe: String, after: Long, until: Long): Option[Long] =
        es.collect { case (_, ms, t) if t == tpe && ms > after && ms <= until => ms }
          .sorted.headOption
      firstIn("view", Long.MinValue, Long.MaxValue).map { t1 =>
        val t2 = firstIn("click", t1, t1 + H6)
        val t3 = t2.flatMap(x => firstIn("purchase", x, x + H6))
        u -> (Some(t1), t2, t3, 1 + t2.size + t3.size)
      }
    }.toMap
    assert(out === expected)
    // the testdata exercises every funnel depth
    assert(Set(1, 2, 3).subsetOf(out.values.map(_._4).toSet),
      s"stages seen: ${out.values.map(_._4).toSet}")
  }

  test("q34 cohort retention equals the serial matrix; day-0 is 100% and decay is real") {
    val got = Relational.all("q34_cohort_retention").fn(spark, sf).collect()
      .map(r => (r.getAs[java.sql.Date]("cohort_day").toString, r.getAs[Long]("k")) ->
        ((r.getAs[Long]("n_active"), r.getAs[Long]("cohort_size"),
          r.getAs[Long]("retention_bp")))).toMap
    val ev = Relational.events(spark, sf)
      .selectExpr("user_id", "cast(to_date(ts) as string) as day").collect()
      .map(r => (r.getLong(0), r.getString(1))).distinct
    val firstDay = ev.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    def days(s: String): Long = java.time.LocalDate.parse(s).toEpochDay
    val expected = ev.groupBy { case (u, d) => (firstDay(u), days(d) - days(firstDay(u))) }
      .map { case ((cd, k), xs) =>
        val size = firstDay.values.count(_ == cd).toLong
        val n = xs.map(_._1).distinct.length.toLong
        (cd, k) -> ((n, size, n * 10000 / size))
      }
    assert(got === expected)
    // day 0 contains the whole cohort by definition...
    got.collect { case ((_, 0L), (n, size, bp)) =>
      assert(n === size && bp === 10000L)
    }
    // ...and later offsets genuinely decay on this corpus
    assert(got.exists { case ((_, k), (_, _, bp)) => k > 0 && bp < 10000 },
      "no cohort ever loses a user - matrix is vacuous here")
    assert(got.keys.map(_._2).max >= 7, "no week-deep offset in the matrix")
  }

  test("q35 transitions equal the serial Markov counts; shares sum to ~10000") {
    val ev = Relational.events(spark, sf)
      .selectExpr("user_id", "unix_micros(ts) as us", "event_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val expected = ev.groupBy(_._1).values.flatMap { es =>
      val s = es.sortBy(e => (e._2, e._3))
      s.zip(s.drop(1)).collect {
        case (a, b) if b._2 - a._2 <= 21600000000L => (a._4, b._4)
      }
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = Relational.all("q35_event_transitions").fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(got.view.mapValues(_._1).toMap === expected)
    val total = expected.values.sum
    got.foreach { case (k, (n, bp)) =>
      assert(bp === n * 10000 / total, s"share of $k") }
    // floor-rounded shares undershoot by < |cells|
    val shareSum = got.values.map(_._2).sum
    assert(shareSum <= 10000 && shareSum > 10000 - got.size,
      s"share sum $shareSum implausible")
    assert(got.size > 1, "degenerate single-transition matrix")
  }

  test("q36 resample: contiguous per-user grid, fill carries the last observation, gaps are real") {
    val sf01 = "/root/testdata/sf0.01"
    val rows = Relational.all("q36_resample_ffill").fn(spark, sf01).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime,
        r.getLong(2), r.getLong(3)))
    val byUser = rows.groupBy(_._1)
    val dayMs = 86400000L
    byUser.foreach { case (u, rs) =>
      val days = rs.map(_._2).sorted
      // contiguous daily grid from first to last observed day
      assert(days.zip(days.drop(1)).forall { case (a, b) => b - a == dayMs },
        s"user $u grid has holes or duplicates")
      // first grid day is observed (fill has a value from day one)
      assert(rs.minBy(_._2)._3 > 0, s"user $u grid starts before first observation")
    }
    // serial fill replay from the raw events
    val ev = Relational.events(spark, sf01)
      .selectExpr("user_id", "ts", "event_id", "cast(floor(value * 10000) as bigint) as v")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getLong(3)))
    val expected = ev.groupBy(_._1).flatMap { case (u, es) =>
      def dayOf(t: java.sql.Timestamp) = t.getTime - Math.floorMod(t.getTime, dayMs)
      val byDay = es.groupBy(e => dayOf(e._2))
      val d0 = byDay.keys.min; val d1 = byDay.keys.max
      var lastV = 0L
      (d0 to d1 by dayMs).map { day =>
        val obs = byDay.getOrElse(day, Array.empty[(Long, java.sql.Timestamp, Long, Long)])
        if (obs.nonEmpty)
          lastV = obs.maxBy(e => (e._2.getTime, e._3))._4
        (u, day, obs.length.toLong, lastV)
      }
    }.toSet
    assert(rows.map(t => (t._1, t._2, t._3, t._4)).toSet === expected)
    // the fill must DO something: some gap day exists
    assert(rows.exists(_._3 == 0L), "no gap day anywhere - resample is vacuous here")
  }

  test("q37 rolling reach: equals the serial sliding distinct; wau bounds dau; stickiness sane") {
    val sf01 = "/root/testdata/sf0.01"
    val got = Relational.all("q37_rolling_reach").fn(spark, sf01).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val ud = Relational.events(spark, sf01)
      .selectExpr("user_id", "cast(unix_date(cast(ts as date)) as bigint) as day")
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val days = ud.map(_._2).distinct.sorted
    val expected = days.map { d =>
      val dau = ud.collect { case (u, dd) if dd == d => u }.distinct.size.toLong
      val wau = ud.collect { case (u, dd) if dd >= d - 6 && dd <= d => u }.distinct.size.toLong
      d -> ((dau, wau, dau * 10000 / wau))
    }.toMap
    assert(got === expected)
    got.foreach { case (d, (dau, wau, st)) =>
      assert(wau >= dau, s"day $d wau < dau")
      assert(st <= 10000 && st > 0, s"day $d stickiness $st")
    }
    // the window must widen reach somewhere (wau > dau), or the
    // rolling union measured nothing
    assert(got.values.exists(v => v._2 > v._1), "wau never exceeds dau - vacuous")
  }

  test("q38 MAD outliers: equals the serial robust statistics; cut is real and resistant") {
    val sf01 = "/root/testdata/sf0.01"
    val r = Relational.all("q38_robust_outliers").fn(spark, sf01).head
    val (n, med, mad, out, bp) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    // serial replay with the pinned rank-ceil(N/2) contract
    val vs = Relational.events(spark, sf01)
      .selectExpr("cast(floor(value * 100) as bigint) as v")
      .collect().map(_.getLong(0)).sorted
    val k = ((vs.length + 1) / 2) - 1
    val expMed = vs(k)
    val devs = vs.map(x => math.abs(x - expMed)).sorted
    val expMad = devs(k)
    val expOut = devs.count(_ > 3 * expMad).toLong
    assert((n, med, mad, out) === ((vs.length.toLong, expMed, expMad, expOut)))
    assert(bp === out * 10000 / n)
    // non-vacuous: the cut fires on this corpus but not on everything
    assert(out > 0 && out < n / 4, s"outlier count $out of $n implausible")
    // robustness: corrupting the top value by 1000x cannot move the
    // median or MAD (the reason this beats mean±kσ)
    val corrupted = (vs.dropRight(1) :+ vs.last * 1000).sorted
    assert(corrupted(k) === expMed, "median moved under a single whale")
  }

  test("q39 constraint audit: one scan, every rule adjudicated, the planted violation red") {
    val sf01 = "/root/testdata/sf0.01"
    val rows = graft.SparkEntry.queries("q39_constraint_audit")(spark, sf01)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(rows.size === 8)
    // the suite can show red: qty_max_le_30 is violated by the data
    // (max quantity is 50) and must surface as a failed rule
    assert(!rows("qty_max_le_30")._2 && rows("qty_max_le_30")._1 > 3000)
    // ...as must the naive (orderkey, linenumber) pk this corpus breaks
    assert(!rows("pk_unique")._2 && rows("pk_unique")._1 < 10000)
    // clean-by-construction rules pass with their metrics at the contract
    assert(rows("line_key_unique") === ((10000L, true)))
    assert(rows("shipdate_complete") === ((10000L, true)))
    assert(rows("orders_referential") === ((0L, true)))
    assert(rows("returnflag_domain") === ((0L, true)))
    assert(rows("discount_in_0_10pct")._2)
  }

  test("q40 attribution: every purchase's cents are conserved to the cent") {
    val sf01 = "/root/testdata/sf0.01"
    // total attributed must equal the exact cent total of purchases
    // that have at least one qualifying click (the allocator's audit)
    val e = Relational.events(spark, sf01)
      .selectExpr("event_id", "user_id", "event_type",
        "unix_micros(ts) as us", "cast(floor(value * 100) as bigint) as cents")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        r.getLong(4)))
    val clicks = e.filter(_._3 == "click")
    val attributable = e.filter(_._3 == "purchase").filter { p =>
      clicks.exists(c => c._2 == p._2 && c._4 <= p._4
        && c._4 > p._4 - 21600000000L)
    }
    val expTotal = attributable.map(_._5).sum
    val got = graft.SparkEntry.queries("q40_attribution")(spark, sf01)
      .selectExpr("sum(attributed_cents) as t", "sum(n_credits) as n")
      .head
    assert(got.getLong(0) === expTotal,
      "attributed cents diverged from the purchase total - allocation leak")
    assert(got.getLong(1) > attributable.length,
      "no purchase split across multiple touches - linear model vacuous")
  }

  test("attribution conserves cents for refunds (negative values) too") {
    import spark.implicits._
    val ts0 = java.sql.Timestamp.valueOf("2024-01-01 12:00:00")
    def t(mins: Int) = new java.sql.Timestamp(ts0.getTime + mins * 60000L)
    // one refund of -0.05 (= -5 cents) split across 2 clicks: the
    // truncating div gives -2 each, and the most recent click must
    // absorb the remaining -1 cent
    val purchases = Seq((100L, t(60), 1L, -0.05))
      .toDF("event_id", "ts", "user_id", "value")
    val clicks = Seq((1L, t(10), 1L, 0.0), (2L, t(20), 1L, 0.0))
      .toDF("event_id", "ts", "user_id", "value")
    val got = Relational.attributionCredits(purchases, clicks)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(got.values.sum === -5L, s"refund leaked a cent: $got")
    assert(got(2L) === -3L && got(1L) === -2L,
      "the most recent touch must absorb the remainder cent")
  }

  test("q41 spatial grid join equals the brute-force pairs; no neighborhood is skipped") {
    val sf = "/root/testdata/sf0.001"
    val pts = graft.Tables(spark, sf, "customer")
      .selectExpr("c_custkey", "(c_custkey * 2654435761L) % 600",
        "(c_custkey * 40503L) % 300")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val brute = (for {
      (a, ax, ay) <- pts; (b, bx, by) <- pts if a < b
      d2 = (ax - bx) * (ax - bx) + (ay - by) * (ay - by) if d2 <= 400
    } yield (a, b, d2)).toSet
    val got = graft.SparkEntry.queries("q41_spatial_grid_join")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === brute)
    // non-vacuous: the grid actually prunes (pairs exist, and far
    // pairs outnumber near ones so brute != all-pairs)
    assert(got.nonEmpty && got.size < pts.length.toLong * (pts.length - 1) / 2)
    // boundary honesty: some found pair must CROSS a cell boundary
    // (caught only via the 3x3 neighborhood, not same-cell matches)
    assert(got.exists { case (a, b, _) =>
      val pa = pts.find(_._1 == a).get; val pb = pts.find(_._1 == b).get
      pa._2 / 20 != pb._2 / 20 || pa._3 / 20 != pb._3 / 20
    }, "all pairs share a cell - the neighborhood expansion is untested")
  }

  test("q42 islands: serial re-derivation agrees; gaps split, 30-day gaps don't") {
    val sf = "/root/testdata/sf0.001"
    val hist = graft.Tables(spark, sf, "orders")
      .selectExpr("o_custkey", "o_orderkey", "cast(o_orderdate as date) as d",
        "cast(round(o_totalprice * 100) as bigint) as price_c")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDate(2).toLocalDate, r.getLong(3)))
      .groupBy(_._1)
    // serial single-threaded gaps-and-islands per customer
    val expect = hist.flatMap { case (cust, rows) =>
      val sorted = rows.sortBy(t => (t._3.toEpochDay, t._2))
      var island = 0L
      var prev: Option[java.time.LocalDate] = None
      val tagged = sorted.map { case (_, _, d, p) =>
        val gap = prev.map(pd => java.time.temporal.ChronoUnit.DAYS.between(pd, d))
        if (gap.forall(_ > 30)) island += 1
        prev = Some(d)
        (island, d, p)
      }
      tagged.groupBy(_._1).map { case (isl, g) =>
        val days = g.map(_._2)
        ((cust, isl), (g.size.toLong, days.minBy(_.toEpochDay), days.maxBy(_.toEpochDay),
          g.map(_._3).sum))
      }
    }
    val got = graft.SparkEntry.queries("q42_gaps_islands")(spark, sf).collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getDate(3).toLocalDate, r.getDate(4).toLocalDate, r.getLong(6))))
      .toMap
    assert(got === expect)
    // non-vacuous: at least one customer has MULTIPLE islands (a real gap
    // split) and at least one island has MULTIPLE orders (a real merge)
    assert(got.keys.groupBy(_._1).exists(_._2.size > 1), "no customer ever split")
    assert(got.values.exists(_._1 > 1), "no island ever merged two orders")
  }

  test("q43 json extract: equals the serial parse; malformed degrades to null, not failure") {
    val sf = "/root/testdata/sf0.001"
    val kRe = """"k"\s*:\s*(-?\d+)""".r
    val raw = graft.Tables(spark, sf, "events")
      .select("event_type", "props").collect()
      .map(r => r.getString(0) -> kRe.findFirstMatchIn(r.getString(1)).map(_.group(1).toInt))
    val expect = raw.groupBy(_._1).map { case (et, g) =>
      val ks = g.flatMap(_._2)
      et -> (g.length.toLong, ks.length.toLong, ks.map(_.toLong).sum,
        ks.min.toLong, ks.max.toLong, ks.count(_ >= 50).toLong)
    }
    val got = graft.SparkEntry.queries("q43_json_extract")(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
      .toMap
    assert(got === expect)
    assert(got.nonEmpty && got.values.forall(v => v._2 == v._1),
      "fixture should parse fully - n_parsed must equal n here")
    // the malformed-degrades-to-null contract, exercised directly
    import spark.implicits._
    val bad = Seq(("x", """{"k": 7}"""), ("x", "not json"), ("x", """{"j": 1}"""))
      .toDF("event_type", "props")
      .selectExpr("cast(from_json(props, 'k INT').k as int) as k")
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getInt(0)))
    assert(bad.toSeq === Seq(Some(7), None, None))
  }
}
