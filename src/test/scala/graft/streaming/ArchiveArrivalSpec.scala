package graft.streaming

import graft.SparkTestBase
import graft.dwca.{ConvertJob, FleetFixture}
import org.scalatest.funsuite.AnyFunSuite

/** stream27's intake semantics: the checkpointed file-source seen-set
  * makes conversion exactly-once across restarts, and a new catalog
  * arrival converts exactly its own rows — the RQ-queue contract
  * (at-least-once delivery + idempotent worker) strengthened end to
  * end.
  */
class ArchiveArrivalSpec extends AnyFunSuite with SparkTestBase {

  test("restart converts nothing; a new arrival converts only itself") {
    FleetFixture.ensure()
    val cat = FleetFixture.stageCatalog(spark, "catalog-spec")
    val ckpt = s"$cat-ckpt"
    val outBase = FleetFixture.freshOutBase("out-arrival-spec")

    val r1 = ConvertJob.runArrivals(spark, cat, ckpt, outBase)
    assert(r1.size === FleetFixture.nArchives, s"first drain: $r1")
    assert(r1.values.toSet === Set("ran"), s"first drain: $r1")

    // same checkpoint, same files: the seen-set suppresses every
    // re-delivery — zero conversions observed
    val r2 = ConvertJob.runArrivals(spark, cat, ckpt, outBase)
    assert(r2.isEmpty, s"restart reconverted: $r2")

    // one NEW catalog file (same archive bytes, fresh resource id):
    // exactly that row converts, nothing else re-runs
    FleetFixture.appendCatalogEntry(spark, cat, "arrival-new.parquet",
      "fleetNew", "1", FleetFixture.urlOf(FleetFixture.datasets.head))
    val r3 = ConvertJob.runArrivals(spark, cat, ckpt, outBase)
    assert(r3 === Map("fleetNew" -> "ran"), s"incremental drain: $r3")
    assert(spark.read.parquet(s"$outBase/fleetNew.parquet").count() > 0)

    // and the converted output matches the batch fleet's for the
    // same archive, column for column
    val viaStream = spark.read.parquet(s"$outBase/fleetNew.parquet")
      .selectExpr("id", "scientificName", "fid")
      .collect().map(_.toString).sorted.toSeq
    val firstId = FleetFixture.datasets.head.id
    val viaBatch = spark.read.parquet(s"$outBase/$firstId.parquet")
      .selectExpr("id", "scientificName", "fid")
      .collect().map(_.toString).sorted.toSeq
    assert(viaStream === viaBatch)
  }
}
