package graft

import java.nio.file.Files
import java.util.concurrent.atomic.AtomicInteger

import org.scalatest.funsuite.AnyFunSuite

/** Staged — the marker-gated staging helper behind the serve-style
  * bench artifacts. Pins the failure modes the helper exists to
  * close: missing/empty sources must not fingerprint, and concurrent
  * builders must serialize (one build, one published marker) instead
  * of interleaving wipes with each other's builds.
  */
class StagedSpec extends AnyFunSuite {

  test("fingerprint fails fast on a missing path, an empty dir, and no paths") {
    intercept[IllegalArgumentException](Staged.fingerprint())
    intercept[IllegalArgumentException](
      Staged.fingerprint("/nonexistent/graft/corpus"))
    val empty = Files.createTempDirectory("graft-staged-empty")
    intercept[IllegalArgumentException](Staged.fingerprint(empty.toString))
  }

  test("fingerprint moves when the source changes") {
    val dir = Files.createTempDirectory("graft-staged-fp")
    val f = dir.resolve("a.txt")
    Files.write(f, "one".getBytes)
    val fp1 = Staged.fingerprint(dir.toString)
    Files.write(f, "longer".getBytes)
    assert(f.toFile.setLastModified(f.toFile.lastModified() + 2000))
    assert(Staged.fingerprint(dir.toString) !== fp1)
  }

  test("concurrent ensure serializes: one build, every caller returns normally") {
    val dir = Files.createTempDirectory("graft-staged-conc")
    val root = dir.resolve("artifact").toString
    val builds = new AtomicInteger(0)
    // Every thread must RETURN, not die on OverlappingFileLockException
    // — FileLock alone cannot serialize threads of one JVM, so ensure
    // layers a per-root monitor in front of it. Collect throwables:
    // an uncaught exception in a spawned thread would not fail join().
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    def race(n: Int)(body: => Unit): Unit = {
      val threads = (1 to n).map(_ => new Thread(() =>
        try body catch { case t: Throwable => errors.add(t) }))
      threads.foreach(_.start()); threads.foreach(_.join())
      assert(errors.isEmpty, s"ensure threw in a racing thread: ${errors.peek()}")
    }
    race(4)(Staged.ensure(root, "fp-1") {
      builds.incrementAndGet()
      Thread.sleep(200) // widen the race window
      Files.write(java.nio.file.Paths.get(root, "data.bin"), "payload".getBytes)
    })
    assert(builds.get() === 1, s"expected one build, got ${builds.get()}")
    assert(new java.io.File(root, "data.bin").exists())
    assert(new java.io.File(root, "_READY").exists())
    // stale fingerprint -> exactly one rebuild even under contention
    race(4)(Staged.ensure(root, "fp-2") {
      builds.incrementAndGet()
      Thread.sleep(100)
      Files.write(java.nio.file.Paths.get(root, "data.bin"), "v2".getBytes)
    })
    assert(builds.get() === 2, s"expected one rebuild, got ${builds.get() - 1}")
    assert(new String(Files.readAllBytes(
      java.nio.file.Paths.get(root, "data.bin"))) === "v2")
  }

  test("two spellings of one root share the monitor: no OverlappingFileLockException") {
    val dir = Files.createTempDirectory("graft-staged-alias")
    val root = dir.resolve("artifact").toString
    // trailing slash and a ./ segment are the same directory — distinct
    // monitor keys would let both threads reach ch.lock() and the
    // second die with OverlappingFileLockException
    val aliases = Seq(root, root + "/", dir.toString + "/./artifact")
    val builds = new AtomicInteger(0)
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = aliases.map(a => new Thread(() =>
      try Staged.ensure(a, "fp-1") {
        builds.incrementAndGet()
        Thread.sleep(200)
        Files.write(java.nio.file.Paths.get(root, "data.bin"), "x".getBytes)
      } catch { case t: Throwable => errors.add(t) }))
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(errors.isEmpty, s"aliased ensure threw: ${errors.peek()}")
    assert(builds.get() === 1, s"expected one build, got ${builds.get()}")
  }
}
