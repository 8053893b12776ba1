package graft

/** Marker-gated one-time staging keyed by a corpus FINGERPRINT.
  *
  * Serve-style bench paths (s28's ANN index, sink24's partitioned
  * fact) build an artifact once and measure only the read side; the
  * naive once-per-path marker breaks in two ways this helper closes:
  * a regenerated corpus under the same path would silently serve a
  * stale artifact (the marker CARRIES max-mtime+size of the source,
  * mismatch → rebuild), and a concurrent JVM could observe a
  * half-built artifact as ready (the marker is published by ATOMIC
  * rename after the build completes).
  */
object Staged {

  /** max(mtime)-sum(size) over the given files/directories. */
  def fingerprint(paths: String*): String = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    val fs = paths.flatMap(p => walk(new java.io.File(p)))
    s"${fs.map(_.lastModified).max}-${fs.map(_.length).sum}"
  }

  /** Ensure `root` holds the artifact `build` produces for source
    * fingerprint `fp`; returns `root`. Stale or absent → wipe and
    * rebuild. */
  def ensure(root: String, fp: String)(build: => Unit): String = {
    val marker = new java.io.File(root, "_READY")
    val ready = marker.exists() && {
      val src = scala.io.Source.fromFile(marker)
      try src.mkString.trim == fp finally src.close()
    }
    if (!ready) {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      rm(new java.io.File(root))
      new java.io.File(root).mkdirs()
      build
      val tmp = java.nio.file.Paths.get(root,
        s"_READY.tmp.${ProcessHandle.current().pid()}")
      java.nio.file.Files.write(tmp, fp.getBytes("UTF-8"))
      java.nio.file.Files.move(tmp, marker.toPath,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    root
  }
}
