package graft.streaming

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

/** stream12's contract: the streaming serve over the maintained index
  * answers exactly like the d14 batch query regardless of how the
  * shard is chopped into micro-batches, and the index genuinely
  * absorbs each batch's novelties (the CDC-ingest loop). */
class StreamShardDedupSpec extends AnyFunSuite with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private val Dd = graft.queries.Dedup

  private def bloomBytes: Array[Byte] = java.nio.file.Files.readAllBytes(
    java.nio.file.Paths.get(graft.queries.DedupKernels.shardIndexDir, "bloom", "bloom.bin"))

  test("stream12: multi-batch arrival equals d14; the index absorbs novelties; re-stream sees everything") {
    graft.functions.Hashing.register(spark)
    val docs = graft.Tables(spark, sf, "documents")
    val expected = Dd.all("d14_shard_dedup").fn(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(expected.nonEmpty && expected.values.exists(identity)
      && expected.values.exists(!_), "shard must mix seen and novel docs")

    // stage the corpus as 3 files: AvailableNow + maxFilesPerTrigger=1
    // drains as 3 micro-batches with an uncontrolled doc->batch split
    val stage = java.nio.file.Files.createTempDirectory("graft-stream12-").toString
    docs.repartition(3).write.mode("overwrite").parquet(stage)
    val schema = spark.read.parquet(stage).schema
    def chopped() = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(stage)

    graft.queries.DedupKernels.shardIndexBuild(spark, graft.queries.DedupKernels.corpusFps(docs))
    val before = bloomBytes
    val got = graft.queries.DedupKernels.shardDedupStream(spark, chopped())
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(got === expected, "multi-batch streaming answer diverged from the batch twin")

    // the maintained index absorbed exactly the novel fingerprints,
    // each once (cross-batch dedup of the appends), and the bloom
    // artifact really changed
    val novel = expected.count(!_._2)
    val inc = spark.read.parquet(s"${graft.queries.DedupKernels.shardIndexDir}/fps/incoming")
    assert(inc.count() === novel)
    assert(inc.distinct().count() === novel)
    assert(!java.util.Arrays.equals(before, bloomBytes), "bloom artifact never updated")

    // re-streaming the same shard against the UPDATED index: every
    // previously-novel fp is now seen — the incremental-dedup payoff
    val again = graft.queries.DedupKernels.shardDedupStream(spark, chopped())
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(again.keySet === expected.keySet)
    assert(again.values.forall(identity),
      "updated index must recognize previously-novel fingerprints")

    // batch-boundary invariance: the whole shard in ONE batch gives
    // the identical answer from a fresh index
    graft.queries.DedupKernels.shardIndexBuild(spark, graft.queries.DedupKernels.corpusFps(docs))
    val one = graft.queries.DedupKernels.shardDedupStream(spark,
        spark.readStream.schema(schema).parquet(stage))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(one === expected)
  }
}
