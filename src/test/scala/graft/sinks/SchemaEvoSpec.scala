package graft.sinks

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

/** sink27's physical claims — the gate oracle pins HEAD's rows; this
  * spec pins the lifecycle mechanics: per-version schemas, null-fill
  * on old files, time-travel isolation of the pre-evolution view,
  * and the no-rewrite property (evolution appends, never touches
  * committed files). */
class SchemaEvoSpec extends AnyFunSuite with SparkTestBase {

  test("schema evolution: v1 keeps 3 columns, v2 null-fills old files, no file is rewritten") {
    // drive the gate once; it leaves the two-commit table behind
    graft.sinks.SinkQueries.all("sink27_schema_evolution")
      .fn(spark, "/root/testdata/sf0.001").count()
    val out = graft.sinks.SinkQueries.scratchPath("schemaevo")

    // time travel to v1: the added column is INVISIBLE even though
    // v1's files are also live in v2 — each version reads with its
    // own recorded schema
    val v1 = Sinks.readAtVersion(spark, out, 1)
    assert(v1.columns.toSeq === Seq("o_orderkey", "o_custkey", "o_totalprice"))

    // HEAD: old rows null-fill, added rows carry the value
    val v2 = Sinks.readAtVersion(spark, out, 2)
    assert(v2.columns.contains("o_priority"))
    val old = v2.where("o_orderkey < 400000000000L")
    val neu = v2.where("o_orderkey >= 400000000000L")
    assert(old.where("o_priority is not null").count() === 0)
    assert(neu.where("o_priority is null").count() === 0)
    assert(neu.where("o_priority != (o_orderkey - 400000000000L) % 5").count() === 0)

    // no-rewrite: every v1 file is live, untouched, in v2
    val m1 = Sinks.readManifest(spark, out, 1).toSet
    val m2 = Sinks.readManifest(spark, out, 2).toSet
    assert(m1.subsetOf(m2), "evolution must append, never rewrite")
    assert((m2 -- m1).forall(_.startsWith("c2/")), "v2's additions live in the commit-2 dir")

    // the pinned read equals the expensive mergeSchema footer sweep
    // it replaces — same rows, same null-fill semantics
    val swept = spark.read.option("mergeSchema", "true")
      .parquet(m2.toSeq.sorted.map(f => s"$out/$f"): _*)
      .select("o_orderkey", "o_custkey", "o_totalprice", "o_priority")
    assert(v2.select("o_orderkey", "o_custkey", "o_totalprice", "o_priority")
      .exceptAll(swept).count() === 0)
    assert(swept.exceptAll(
      v2.select("o_orderkey", "o_custkey", "o_totalprice", "o_priority"))
      .count() === 0)

    // retention GC expires the schema with its manifest: after
    // vacuum(keep=1), v1's recorded schema is gone (no orphan log
    // files), v2's survives, and HEAD still reads (append-only
    // evolution means no data file was reclaimable)
    Sinks.vacuum(spark, out, keep = 1)
    assert(Sinks.manifestSchema(spark, out, 1).isEmpty)
    assert(Sinks.manifestSchema(spark, out, 2).isDefined)
    assert(Sinks.readAtVersion(spark, out, 2).count() === v2.count())
  }
}
