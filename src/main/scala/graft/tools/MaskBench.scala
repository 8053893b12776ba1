package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Perf scratchpad: A/B the SnifferCsv classification pass'
  * formulations on the bulk-fixture core member —
  *   A: 8 (16 with prefix) count(when(mask&bit)) aggregates PER COLUMN
  *      (the current maskCounts shape: ~n_cols*16 aggregate buffer
  *      updates per row), vs
  *   B: one masks array per row, posexplode, groupBy(pos, mask) with
  *      2 counts (total, head) — per-row cost is n_cols hash-agg
  *      probes over a <= n_cols*257-group map.
  * Verifies B reconstructs A's counts exactly before timing.
  * Not part of the gate or bench surface. */
object MaskBench {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.scaleDefensive(SparkSession.builder()).master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.Hashing.register(spark)
    graft.dwca.BulkFixture.ensure()

    val dir = graft.sources.ZipSource.stagedMemberDir(spark,
      graft.dwca.BulkFixture.zipPath, "occurrence.txt")
    val lines = spark.read.textFile(dir)
    val hs = {
      val first = lines.first()
      first.split("\t", -1).toSeq
    }
    val schema = org.apache.spark.sql.types.StructType(hs.map(h =>
      org.apache.spark.sql.types.StructField(h, org.apache.spark.sql.types.StringType)))
    val data = spark.createDataset(lines.rdd.mapPartitionsWithIndex(
      (i, it) => if (i == 0) it.drop(1) else it))(org.apache.spark.sql.Encoders.STRING)
    val raw0 = spark.read.option("header", "false").option("sep", "\t")
      .option("escape", "\"").schema(schema).csv(data)
    val raw = raw0.select(raw0.columns.map(h =>
      when(col(h) === "", lit(null)).otherwise(col(h)).as(h)): _*)
    val N = 20480L

    val bits = Seq(1, 2, 4, 8, 16, 64, 32) // BOOL,BIGINT,DOUBLE,ISO,DMY,MDY,TS order irrelevant here

    def formA(withPrefix: Boolean): (Array[Array[Long]], Long) = {
      var mk = "__graft_sniff_head"
      val maskedCols = raw.columns.map(h => expr(s"duck_type_mask(`$h`)").as(h))
      val masked =
        if (withPrefix) raw.select(maskedCols :+ (monotonically_increasing_id() < N).as(mk): _*)
        else raw.select(maskedCols: _*)
      val head = col(mk)
      val aggs: Seq[Column] = raw.columns.toSeq.flatMap { h =>
        val m = col(s"`$h`")
        def bit(b: Int) = count(when(m.bitwiseAND(lit(b)) =!= 0, 1))
        def bitP(b: Int) = count(when(head && m.bitwiseAND(lit(b)) =!= 0, 1))
        val full = count(m) +: bits.map(bit)
        if (!withPrefix) full else full ++ (count(when(head, m)) +: bits.map(bitP))
      } :+ count(lit(1))
      val r = masked.agg(aggs.head, aggs.tail: _*).head()
      val W = if (withPrefix) 16 else 8
      (raw.columns.indices.map(i => (0 until W).map(j => r.getLong(W * i + j)).toArray).toArray,
        r.getLong(W * raw.columns.length))
    }

    def formB(withPrefix: Boolean): (Array[Array[Long]], Long) = {
      val masks = array(raw.columns.map(h => expr(s"duck_type_mask(`$h`)")): _*)
      val base =
        if (withPrefix) raw.select(masks.as("ms"), (monotonically_increasing_id() < N).as("hd"))
        else raw.select(masks.as("ms"), lit(false).as("hd"))
      val rows = base
        .select(col("hd"), posexplode(col("ms")).as(Seq("pos", "mask")))
        .groupBy("pos", "mask")
        .agg(count(lit(1)).as("c"), count(when(col("hd"), 1)).as("ch"))
        .collect()
      val W = if (withPrefix) 16 else 8
      val out = Array.fill(raw.columns.length)(new Array[Long](W))
      var total = 0L
      rows.foreach { r =>
        val pos = r.getInt(0)
        val mask = if (r.isNullAt(1)) -1 else r.getInt(1)
        val c = r.getLong(2)
        val ch = r.getLong(3)
        if (pos == 0) total += c
        if (mask >= 0) {
          out(pos)(0) += c
          bits.zipWithIndex.foreach { case (b, j) => if ((mask & b) != 0) out(pos)(j + 1) += c }
          if (withPrefix) {
            out(pos)(8) += ch
            bits.zipWithIndex.foreach { case (b, j) => if ((mask & b) != 0) out(pos)(j + 9) += ch }
          }
        }
      }
      (out, total)
    }

    // correctness cross-check
    for (p <- Seq(false, true)) {
      val (a, ta) = formA(p)
      val (b, tb) = formB(p)
      require(ta == tb, s"total mismatch $ta vs $tb")
      a.indices.foreach { i =>
        require(a(i).toSeq == b(i).toSeq, s"col $i prefix=$p A=${a(i).toSeq} B=${b(i).toSeq}")
      }
      println(s"prefix=$p: A == B (cols=${a.length}, rows=$ta)")
    }

    for (label <- Seq("A", "B"); p <- Seq(false, true)) {
      val times = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        if (label == "A") formA(p) else formB(p)
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"form $label prefix=$p: min ${times.head}%.3f  med ${times(2)}%.3f s")
    }
    spark.stop()
  }
}
