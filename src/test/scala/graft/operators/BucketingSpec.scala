package graft.operators

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

/** Bucketing is the co-located-join lever at 100 TB (SURVEY §4):
  * pre-bucketing both fact tables on the join key means the join
  * needs NO exchange at read time. Spark only honors bucket layout
  * through the catalog, so this exercises saveAsTable + the
  * bucket-aware scan, and asserts the shuffle really is gone.
  */
class BucketingSpec extends AnyFunSuite with SparkTestBase {

  /** DROP TABLE only removes what the (ephemeral, in-memory) catalog
    * knows about — a crashed previous JVM leaves the managed-table
    * DIRECTORY behind with no catalog entry, and the next
    * saveAsTable dies on LOCATION_ALREADY_EXISTS. Remove the
    * warehouse location too. */
  private def dropManaged(names: String*): Unit = names.foreach { n =>
    spark.sql(s"DROP TABLE IF EXISTS $n")
    val loc = new java.io.File(spark.conf.get("spark.sql.warehouse.dir")
      .stripPrefix("file:"), n)
    if (loc.exists()) {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete(): Unit
      }
      rm(loc)
    }
  }

  test("join of two tables bucketed on the key plans without a shuffle") {
    import spark.implicits._
    dropManaged("bk_orders", "bk_lines")
    (0L until 1000L).map(i => (i, s"o$i")).toDF("okey", "odata")
      .write.bucketBy(8, "okey").sortBy("okey").saveAsTable("bk_orders")
    (0L until 3000L).map(i => (i % 1000, i, i * 1.5)).toDF("okey", "lkey", "amount")
      .write.bucketBy(8, "okey").sortBy("okey").saveAsTable("bk_lines")

    // disable broadcast so both joins take the sort-merge path (a
    // BroadcastExchange would make the no-Exchange assertion vacuous);
    // restore whatever the shared session had, not a hardcoded default
    val savedThreshold =
      spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = spark.table("bk_orders").join(spark.table("bk_lines"), "okey")
      assert(j.count() === 3000)
      val phys = j.queryExecution.executedPlan.toString
      assert(!phys.contains("Exchange"),
        s"bucketed join should not shuffle:\n$phys")

      // contrast: the same data unbucketed DOES shuffle (sanity that
      // the assertion above is meaningful)
      val a = (0L until 1000L).map(i => (i, s"o$i")).toDF("okey", "odata")
      val b = (0L until 3000L).map(i => (i % 1000, i)).toDF("okey", "lkey")
      val u = a.join(b, "okey")
      u.count()
      assert(u.queryExecution.executedPlan.toString.contains("Exchange"))
    } finally savedThreshold match {
      case Some(v) => spark.conf.set("spark.sql.autoBroadcastJoinThreshold", v)
      case None => spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
    spark.sql("DROP TABLE IF EXISTS bk_orders")
    spark.sql("DROP TABLE IF EXISTS bk_lines")
  }

  test("sink10 gate query: join AND aggregate plan with zero exchanges") {
    // the gate entry writes both sides bucketed on the join key, then
    // joins and groupBys on that key — co-location must carry through
    // BOTH operators (HashPartitioning(c_custkey, 8) satisfies the
    // aggregate's (c_custkey, c_name) clustering by the subset rule),
    // or the write-time shuffle bought nothing
    dropManaged("g_orders_bk", "g_customer_bk")
    val savedThreshold =
      spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = graft.sinks.SinkQueries.all("sink10_bucketed_join")
        .fn(spark, "/root/testdata/sf0.001")
      assert(df.count() > 0)
      val phys = df.queryExecution.executedPlan.toString
      assert(phys.contains("SortMergeJoin"), phys)
      assert(!phys.contains("Exchange"),
        s"bucketed join+agg must not shuffle:\n$phys")
    } finally savedThreshold match {
      case Some(v) => spark.conf.set("spark.sql.autoBroadcastJoinThreshold", v)
      case None => spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
    spark.sql("DROP TABLE IF EXISTS g_orders_bk")
    spark.sql("DROP TABLE IF EXISTS g_customer_bk")
  }
}
