package graft.sources

import graft.SparkTestBase
import graft.dwca.DwcaQueries
import org.scalatest.funsuite.AnyFunSuite

class ZipLinesSourceSpec extends AnyFunSuite with SparkTestBase {

  private def zipDf = spark.read
    .format("graft.sources.ZipLinesSource")
    .option("path", DwcaQueries.fixtureZip)
    .load()

  test("reads every member's lines with one partition per member") {
    val df = zipDf
    assert(df.columns.toSeq === Seq("member", "line"))
    val members = df.select("member").distinct().collect().map(_.getString(0)).sorted
    assert(members === Array("measurementorfact.txt", "meta.xml", "multimedia.txt", "occurrence.txt"))
    // 4 members -> 4 partitions
    assert(df.rdd.getNumPartitions === 4)
    // line counts match the extracted files
    val occLines = df.where("member = 'occurrence.txt'").count()
    assert(occLines === 8) // header + 7 rows
  }

  test("member equality filter is pushed down and prunes partitions") {
    val df = zipDf.where("member = 'multimedia.txt'")
    assert(df.rdd.getNumPartitions === 1)
    assert(df.count() === 8) // header + 7 rows
    // the pushed filter is visible in the scan description
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ZipLines"), plan)
  }

  test("agrees with the mapPartitions zip scan") {
    val meta = graft.dwca.DwcaMeta.fromZip(DwcaQueries.fixtureZip)
    val viaDsv2 = zipDf.where(s"member = '${meta.core.location}'")
      .select("line").collect().map(_.getString(0)).toSeq
    val viaMapPartitions = ZipSource
      .memberLines(spark, DwcaQueries.fixtureZip, meta.core.location)
      .collect().toSeq
    assert(viaDsv2 === viaMapPartitions)
  }
}
