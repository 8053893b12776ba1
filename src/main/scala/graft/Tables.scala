package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table catalog over the driver-generated parquet test data
  * (TESTDATA.md): TPC-H-ish star schema plus `events`, `documents`,
  * `embeddings`. Each table is one parquet file under `\$dir`.
  *
  * Scale notes: these are plain parquet scans — Catalyst pushes
  * filters/projections into the scan, and
  * `spark.sql.files.maxPartitionBytes` splits large files across
  * executors, so the same call works at sf0.001 and at 100 TB.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** JVM-lifetime schema catalog for the (static, read-only) test
    * tables — the role a metastore plays in production. Without it
    * every `spark.read.parquet` call re-infers the schema (a file
    * listing plus a footer-read job, ~60 ms driver-side), and a
    * multi-table query pays that per table per invocation: q02's plan
    * BUILD alone measured 0.32 s across its five reads. Keyed on the
    * parquet path; only the catalog tables below go through here, and
    * they are immutable inputs, never query outputs. (Schema inference
    * depends on `spark.sql.legacy.parquet.nanosAsLong` for
    * events.parquet — every graft session, test base included, sets it
    * true, so one JVM-wide cache is consistent across sessions.) */
  private val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[String, org.apache.spark.sql.types.StructType]()

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    val schema = schemaCache.computeIfAbsent(path, p => spark.read.parquet(p).schema)
    spark.read.schema(schema).parquet(path)
  }

  /** Plan-only frame reuse for IMMUTABLE staged artifacts (fingerprint-
    * keyed `graft.Staged` outputs: the DPP fact, serve indexes). A
    * path-based `spark.read.parquet` rebuilds its file index per call —
    * for a hive-partitioned artifact that is a re-listing of every
    * partition dir (84 month dirs for the DPP fact) plus a schema
    * footer read, per invocation. Reusing the resolved frame amortizes
    * the open, exactly like a long-lived server keeping the table
    * handle; no DATA is cached — scans still read what is on disk.
    * Callers must only pass paths whose content is immutable for the
    * session (Staged's contract). Weak-keyed per session. */
  private val frames = new java.util.WeakHashMap[SparkSession,
    scala.collection.concurrent.TrieMap[String, DataFrame]]()

  def stagedParquet(spark: SparkSession, path: String): DataFrame =
    frames.synchronized {
      var m = frames.get(spark)
      if (m == null) {
        m = scala.collection.concurrent.TrieMap.empty[String, DataFrame]
        frames.put(spark, m)
      }
      m
    }.getOrElseUpdate(path, spark.read.parquet(path))

  def lineitem(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "region")
  def events(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "events")
  def documents(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "embeddings")
}
