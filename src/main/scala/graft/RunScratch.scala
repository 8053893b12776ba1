package graft

import java.nio.file.{Files, Paths}

/** Per-JVM scratch root for query-lifetime artifacts — sink outputs,
  * serve indexes built and read inside one query, streaming fold
  * ledgers, tar shards.
  *
  * Keyed by the JVM pid so two concurrent runs (a Verify dump at one
  * scale while a sweep at another is mid-flight) get DISJOINT roots:
  * the live-scratch oracle hazard SURVEY §8.17 documents for sink18 —
  * an interleaved different-scale run rewriting a scratch dir between
  * a dump and its DuckDB check — becomes impossible, because oracle
  * SQL built in this JVM embeds THIS JVM's root and graft.Verify dumps
  * that SQL alongside the results it produced.
  *
  * Deliberately NOT used for cross-run caches ([[Staged]]-gated paths:
  * zip staging, sink24's partitioned fact, s28's serve index, the DwC-A
  * fixtures) — those are fingerprint-keyed with atomic publish under a
  * FileLock and are MEANT to be shared across JVMs.
  *
  * Local-mode note: executors share the driver's filesystem, so a
  * foreachPartition writer and a driver-side reader see one tree. On a
  * real cluster these roots would be per-run object-store prefixes
  * (s3a://bucket/runs/<run-id>/...) keyed exactly the same way.
  */
object RunScratch {

  /** This JVM's scratch root. Stable for the process lifetime, so a
    * registry-init-time oracle string and a query-run-time writer
    * always agree on the path. */
  val root: String = Paths.get(System.getProperty("java.io.tmpdir"),
    s"graft-run-${ProcessHandle.current().pid()}").toString

  /** Path under the root — computed, never created. For oracle SQL
    * construction and for specs reading a query's output in-JVM. */
  def path(name: String): String = Paths.get(root, name).toString

  /** Clean slate for a writer that creates the target itself (Spark
    * sinks refuse an existing dir): removes any prior tree at the
    * path, ensures the PARENT exists, returns the path. */
  def fresh(name: String): String = {
    val p = Paths.get(root, name)
    rm(p.toFile)
    Files.createDirectories(p.getParent)
    p.toString
  }

  /** Clean slate as an existing EMPTY directory — for writers that
    * append files into a dir they expect present (tar shard writers,
    * artifact-fold ledgers). */
  def freshDir(name: String): String = {
    val p = Paths.get(root, name)
    rm(p.toFile)
    Files.createDirectories(p)
    p.toString
  }

  private def rm(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(rm)
    f.delete()
  }
}
