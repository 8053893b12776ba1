package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Pins [[TarShards]] to the USTAR layout itself (offsets, octal
  * encodings, checksum rule, EOF marker) — not just to its own
  * roundtrip, so agreement with external tar readers is asserted at
  * the byte level rather than assumed. */
class TarShardsSpec extends AnyFunSuite {

  private def tmpTar(members: (String, Array[Byte])*): String = {
    val f = java.io.File.createTempFile("tarspec", ".tar")
    f.deleteOnExit()
    val w = new TarShards.Writer(f.getAbsolutePath)
    members.foreach { case (n, b) => w.add(n, b) }
    w.close()
    f.getAbsolutePath
  }

  test("header conforms to USTAR: offsets, octal size, checksum rule, EOF blocks") {
    val payload = "hello tar".getBytes("UTF-8")
    val path = tmpTar("42.txt" -> payload)
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))

    // file size arithmetic: header + padded payload + two EOF blocks
    assert(bytes.length === 512 + 512 + 1024)
    // name NUL-terminated at offset 0
    assert(new String(bytes, 0, 6, "US-ASCII") === "42.txt")
    assert(bytes(6) === 0)
    // size: 11 octal digits at offset 124
    assert(new String(bytes, 124, 11, "US-ASCII") ===
      ("%011o".format(payload.length)))
    // typeflag '0' (regular file) at 156; magic "ustar\0" at 257;
    // version "00" at 263
    assert(bytes(156) === '0'.toByte)
    assert(new String(bytes, 257, 5, "US-ASCII") === "ustar")
    assert(bytes(262) === 0)
    assert(new String(bytes, 263, 2, "US-ASCII") === "00")
    // checksum: sum of header bytes with the checksum field read as
    // spaces, stored as 6 octal digits + NUL + space
    val h = bytes.slice(0, 512).clone()
    val stored = Integer.parseInt(new String(h, 148, 6, "US-ASCII"), 8)
    java.util.Arrays.fill(h, 148, 156, ' '.toByte)
    assert(h.map(_ & 0xff).sum === stored)
    assert(bytes(154) === 0 && bytes(155) === ' '.toByte)
    // two zero blocks terminate the archive
    assert(bytes.slice(1024, 2048).forall(_ === 0))
    // payload padded with zeros to the block boundary
    assert(bytes.slice(512 + payload.length, 1024).forall(_ === 0))
  }

  test("roundtrip: multi-member shard returns names and exact bytes in order") {
    val m = Seq(
      "1.txt" -> "first doc".getBytes("UTF-8"),
      "1.cls" -> "en".getBytes("UTF-8"),
      // payload exactly one block: exercises the zero-pad modulus
      "2.txt" -> Array.fill[Byte](512)(7),
      "2.cls" -> Array.emptyByteArray)
    val back = TarShards.readAll(tmpTar(m: _*))
    assert(back.map(_._1) === m.map(_._1))
    back.zip(m).foreach { case ((_, got), (_, want)) =>
      assert(java.util.Arrays.equals(got, want))
    }
  }

  test("binary members: real PNG/JPEG fixture bytes survive byte-exact (full 0x00-0xFF range)") {
    val imgs = Seq("img/img0.png", "img/img1.png", "img/img2.png", "img/img3.jpg")
      .map { r =>
        val in = getClass.getResourceAsStream(s"/graft/fixtures/$r")
        try r.split('/').last -> in.readAllBytes() finally in.close()
      }
    val back = TarShards.readAll(tmpTar(imgs: _*))
    assert(back.map(_._1) === imgs.map(_._1))
    back.zip(imgs).foreach { case ((n, got), (_, want)) =>
      assert(java.util.Arrays.equals(got, want), s"$n bytes mutated")
    }
  }

  test("reader refuses a corrupted header checksum") {
    val path = tmpTar("x.txt" -> "payload".getBytes("UTF-8"))
    val p = java.nio.file.Paths.get(path)
    val bytes = java.nio.file.Files.readAllBytes(p)
    bytes(0) = 'y'.toByte // name flip invalidates the stored checksum
    java.nio.file.Files.write(p, bytes)
    val e = intercept[IllegalArgumentException](TarShards.readAll(path))
    assert(e.getMessage.contains("checksum"))
  }
}
