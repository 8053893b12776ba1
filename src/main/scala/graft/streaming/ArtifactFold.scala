package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}

/** The maintained-artifact fold template every streaming `*Stream`
  * shares (stream16/17/21/22/23/24): per micro-batch, merge the
  * arriving rows into the persisted artifact and swap it via
  * write-tmp + rename — one small PUT per batch, object-store-safe —
  * then read the artifact back as the maintained state. The merge
  * callback receives the batch and the prior artifact (None before
  * the first commit) and returns the new artifact; the fold ALGEBRA
  * (max for HLL registers, add for counters/ledgers/histograms,
  * re-cut for bottom-k samples) lives entirely at the call site, so
  * the swap/drain mechanics exist exactly once. */
object ArtifactFold {

  private def rm(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(rm)
    f.delete()
  }

  def fold(s: SparkSession, source: DataFrame, dir: String, name: String)
      (merge: (Dataset[Row], Option[DataFrame]) => DataFrame): DataFrame = {
    rm(new java.io.File(dir))
    val target = new java.io.File(dir, name)
    val q = source.writeStream
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        val sb = batch.sparkSession
        val prior =
          if (target.exists()) Some(sb.read.parquet(target.toString)) else None
        val merged = merge(batch, prior)
        val tmp = new java.io.File(dir, s"$name.tmp")
        merged.write.mode("overwrite").parquet(tmp.toString)
        rm(target)
        require(tmp.renameTo(target), s"$name artifact swap failed")
        ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    if (!q.awaitTermination(300000L)) {
      q.stop()
      throw new IllegalStateException(
        s"$name artifact fold did not drain within 300s")
    }
    s.read.parquet(target.toString)
  }
}
