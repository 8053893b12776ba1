package graft.queries

import graft.{CacheScope, SparkTestBase}
import org.scalatest.funsuite.AnyFunSuite

/** Per-query cache lifecycle: three cache-heavy gate queries run
  * back-to-back WITHOUT any clearCache, each consumed inside its own
  * CacheScope — nothing may survive. (Verify/Bench wrap every query
  * this way; this pins the discipline the r8 verdict flagged as
  * missing for long-lived sessions.) */
class CacheScopeSpec extends AnyFunSuite with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("no cached RDD survives a scoped gate query; three back-to-back leave a clean session") {
    // a known-clean baseline: clearCache drops catalog entries, and
    // any checkpoint RDD a previous suite built OUTSIDE a scope
    // (spec-direct fn calls) is released explicitly — suite order
    // must not decide this test
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    assert(spark.sparkContext.getPersistentRDDs.isEmpty)

    // d03 (LSH pair frames), t07 (term-frequency frame), s13 (ANN
    // embedding cache) — the tier's heaviest persisters
    val queries = Seq(
      Dedup.all("d03_lsh_pairs"),
      TextOps.all("t07_tfidf"),
      Similarity.all("s13_ivfpq"))
    queries.foreach { q =>
      val n = CacheScope.scoped { q.fn(spark, sf).count() }
      assert(n > 0)
      // released at scope exit, not at some later clearCache
      assert(spark.sparkContext.getPersistentRDDs.isEmpty,
        s"cached RDDs leaked: ${spark.sparkContext.getPersistentRDDs.values.map(_.name)}")
    }

    // outside a scope the old contract holds: persist is plain and the
    // caller owns the release
    val df = CacheScope.persist(graft.Tables(spark, sf, "documents"))
    df.count()
    assert(spark.sparkContext.getPersistentRDDs.nonEmpty)
    df.unpersist()
  }

  test("PlanMemo reuse re-registers the builder's persists in the CURRENT scope") {
    import spark.implicits._
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    var builds = 0
    def kernel() = graft.PlanMemo.of(spark, "memo-spec-kernel") {
      builds += 1
      val sub = CacheScope.persist(Seq(1, 2, 3).toDF("a"))
      sub.selectExpr("a * 2 as b")
    }
    // scope A: first build — the recorded sub-persist is scope-released
    CacheScope.scoped { assert(kernel().count() === 3) }
    assert(builds === 1)
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      "scope A leaked the memoized kernel's sub-persist")
    // scope B: reuse — NO rebuild, but the sub-persist is re-declared
    // in B (cached while B runs) and released at B's exit
    CacheScope.scoped {
      val df = kernel()
      assert(builds === 1, "PlanMemo rebuilt a memoized kernel")
      assert(df.count() === 3)
      assert(spark.sparkContext.getPersistentRDDs.nonEmpty,
        "reuse did not re-register the builder's persist")
    }
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      "scope B leaked the re-registered persist")
  }

  test("nested scopes release only their own registrations") {
    import spark.implicits._
    val outer = CacheScope.scoped {
      val keep = CacheScope.persist(Seq(1, 2, 3).toDF("a"))
      keep.count()
      CacheScope.scoped {
        val inner = CacheScope.persist(Seq(4, 5).toDF("b"))
        inner.count()
        assert(spark.sparkContext.getPersistentRDDs.size === 2)
      }
      // inner released, outer still cached
      assert(spark.sparkContext.getPersistentRDDs.size === 1)
      keep
    }
    assert(spark.sparkContext.getPersistentRDDs.isEmpty)
    assert(outer.count() === 3) // still computable, just uncached
  }
}
