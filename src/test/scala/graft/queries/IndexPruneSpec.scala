package graft.queries

import graft.SparkTestBase
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** The r10 verdict's missing assertion: s16's SERVE phase must
  * actually prune the on-disk index to the probed cells — an `isin`
  * on the partition column that silently stopped pruning (e.g. a cast
  * slipped below the filter) would still return correct rows while
  * reading the ENTIRE inverted file, the difference between a bounded
  * serve read and a corpus scan at 1 B vectors. */
class IndexPruneSpec extends AnyFunSuite with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  /** Every FileSourceScan in the plan, descending through the AQE
    * wrapper (a leaf node — plain collect stops at it). */
  private def scansOf(p: SparkPlan): Seq[FileSourceScanExec] = p match {
    case a: AdaptiveSparkPlanExec => scansOf(a.inputPlan)
    case f: FileSourceScanExec    => Seq(f)
    case other => (other.children ++ other.subqueries).flatMap(scansOf)
  }

  test("s16 serve: postings and sidecar scans carry PartitionFilters and list exactly the probed cells") {
    graft.functions.Hashing.register(spark)
    val e = graft.Tables(spark, sf, "embeddings")
      .selectExpr("vec_id", "embedding", "vnorm(embedding) as nrm")
    SimilarityKernels.ivfPqBuild(spark, e)
    val served = SimilarityKernels.ivfPqServe(spark, e.where("vec_id < 10"))

    // the router's cell resolution, recomputed the way build trained it
    val cents = SimilarityKernels.lloydCents(e, SimilarityKernels.ivfSeeds(e), SimilarityKernels.ivfIters)
    val probed = SimilarityKernels.probeCells(e.where("vec_id < 10"), cents, 2)
      .select("cell").distinct().collect().map(_.getLong(0)).toSet
    val ix = SimilarityKernels.ivfPqIndexDir
    val totalCells = new java.io.File(s"$ix/postings")
      .listFiles().count(_.getName.startsWith("cell="))
    // precondition, or the pruning assertion proves nothing
    assert(probed.size < totalCells,
      s"probed cells (${probed.size}) cover the whole index ($totalCells) — spec cannot discriminate")

    val indexScans = scansOf(served.queryExecution.executedPlan).filter(f =>
      f.relation.location.rootPaths.exists(p =>
        p.toString.contains("postings") || p.toString.contains("vectors")))
    assert(indexScans.size == 2,
      s"expected the postings scan AND the refine-sidecar scan, found ${indexScans.size}")
    indexScans.foreach { f =>
      val which = f.relation.location.rootPaths.head.toString
      assert(f.partitionFilters.nonEmpty, s"no PartitionFilters on $which")
      assert(f.selectedPartitions.partitionCount == probed.size,
        s"$which lists ${f.selectedPartitions.partitionCount} partitions, probed ${probed.size}")
    }

    // mutation check — the regression this spec exists to catch:
    // drop the router's static `isin` push and rely on the cell
    // equi-join alone. The static listing then covers the WHOLE
    // index (any pruning left is runtime DPP at best), so the
    // partitionCount assertion above really distinguishes a routed
    // read from a full-index read. (Note an expression-only filter
    // over the partition column — even `cell % 16 IN (...)` — still
    // prunes statically; only losing the filter entirely regresses.)
    val pc = SimilarityKernels.probeCells(e.where("vec_id < 10"), cents, 2)
    val broken = org.apache.spark.sql.functions.broadcast(pc)
      .join(spark.read.parquet(s"$ix/postings")
        .withColumn("cell", col("cell").cast("bigint")), "cell")
    val bs = scansOf(broken.queryExecution.executedPlan).filter(
      _.relation.location.rootPaths.exists(_.toString.contains("postings")))
    assert(bs.nonEmpty && bs.head.selectedPartitions.partitionCount == totalCells,
      "join-only read statically pruned — the mutation check is vacuous")
  }
}
