package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each registered query is a [[Q]]: a Spark plan builder over the
  * testdata dir, an optional DuckDB oracle SQL, and a bench flag.
  * Modules contribute their own maps; this object is pure wiring.
  */
object SparkEntry {

  /** All registered queries, keyed by operator id. A duplicate id across
    * modules would silently shadow a query (and its oracle) out of the
    * correctness gate — fail loudly instead. */
  def registry: Map[String, Q] = {
    val merged = queries0.reduce(_ ++ _)
    require(queries0.map(_.size).sum == merged.size,
      s"duplicate query id across modules: " +
        queries0.flatMap(_.keys).groupBy(identity).collect { case (k, v) if v.size > 1 => k }.mkString(", "))
    merged
  }

  private def queries0: Seq[Map[String, Q]] = Seq(
    graft.queries.Relational.all,
    graft.queries.TextOps.all,
    graft.queries.TextSignals.all,
    graft.queries.Dedup.all,
    graft.queries.Similarity.all,
    graft.queries.Multimodal.all,
    graft.queries.Pipeline.all,
    graft.queries.Temporal.all,
    graft.queries.Graph.all,
    graft.streaming.StreamQueries.all,
    graft.dwca.DwcaQueries.all,
    graft.sinks.SinkQueries.all,
    graft.meta.MetaQueries.all
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    registry.getOrElse("q02_star_join",
      sys.error("flagship query q02_star_join missing from registry"))
      .fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map { case (k, q) => k -> q.fn }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys → rows-only check. */
  def oracleSql: Map[String, String] =
    // Trim indentation but KEEP newlines — joining with spaces would let a
    // future `--` line comment swallow the rest of the statement. Verify.q
    // escapes \n for JSON.
    registry.collect { case (k, Q(_, Some(sql), _)) => k -> sql.linesIterator.map(_.trim).mkString("\n") }

  /** Headline bench set (a representative slice, not every query). */
  def benchQueries: Map[String, (SparkSession, String) => DataFrame] =
    registry.collect { case (k, q) if q.bench => k -> q.fn }
}
