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
}
