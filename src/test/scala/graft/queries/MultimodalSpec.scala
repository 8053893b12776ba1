package graft.queries

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

/** The codec-swap contract: the multimodal decode pipeline's plan is
  * a property of the plumbing, not the codec. */
class MultimodalSpec extends AnyFunSuite with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  /** A second codec with a genuinely different body — what a real
    * libjpeg/ffmpeg adapter would look like shape-wise. */
  private object AltCodec extends Multimodal.BlobCodec {
    override def decode(blob: Array[Byte]): (Int, Int) = {
      var acc = 17
      var i = 4
      while (i < blob.length) { acc = acc * 31 + (blob(i) & 0xff); i += 1 }
      (1 + math.abs(acc) % 1024, 1 + math.abs(acc / 7) % 1024)
    }
  }

  test("swapping the codec changes ZERO plan shape (and the plan is map-only)") {
    val stub = Multimodal.decodePipeline(spark, sf, Multimodal.StubCodec)
    val alt = Multimodal.decodePipeline(spark, sf, AltCodec)
    def shape(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.queryExecution.executedPlan.collect { case n => n.nodeName }
    assert(shape(stub) === shape(alt))
    // map-only: decode never shuffles the corpus
    assert(!shape(stub).exists(_.contains("Exchange")), shape(stub).mkString(", "))
    // both execute: same ids, codec-dependent values
    val a = stub.collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    val b = alt.collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    assert(a.keySet === b.keySet)
    assert(a !== b)
  }

  test("stub codec agrees with the oracle on degenerate payloads (missing bytes read as 0)") {
    // DuckDB's ascii(substr(p, n, 1)) is 0 past the end; the stub must
    // match rather than crash on a doc with < 2 payload bytes
    assert(Multimodal.StubCodec.decode(Array[Byte](1, 2, 3, 4)) === (1, 1))
    assert(Multimodal.StubCodec.decode(Array[Byte](1, 2, 3, 4, 65)) === (1 + 65 % 64, 1))
  }

  test("decode output schema is pinned regardless of codec") {
    val df = Multimodal.decodePipeline(spark, sf, AltCodec)
    assert(df.schema.map(f => (f.name, f.dataType.typeName)) ===
      Seq(("doc_id", "long"), ("width", "integer"),
        ("height", "integer"), ("n_px", "integer")))
  }
}
