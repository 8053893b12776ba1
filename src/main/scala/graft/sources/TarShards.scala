package graft.sources

import java.io.{BufferedInputStream, BufferedOutputStream, FileInputStream, FileOutputStream}

/** Minimal USTAR (POSIX.1-1988 `tar`) shard writer/reader — the
  * WebDataset container convention for multimodal training data:
  * each shard is one tar whose members pair up by basename
  * (`<id>.txt` + `<id>.cls` + `<id>.jpg` …), readers stream members
  * sequentially, and the dataset is a directory of shards consumed
  * shard-per-task. Tar (not zip) is the convention precisely because
  * of the streaming property this engine's scale posture wants: a
  * 512-byte header per member, payload inline, no central directory
  * — a reader needs ONE forward pass and no seeks, so a shard on
  * object storage costs one ranged GET.
  *
  * Deterministic by construction (mtime 0, fixed mode/uid/gid), so
  * shard bytes are a pure function of member content — the m15 gate
  * hashes the bytes back out through an independent SQL oracle.
  * Writer is streaming (O(member) memory); reader validates magic
  * and the USTAR checksum on every header before trusting a size.
  */
object TarShards {

  private val Block = 512

  private[sources] def headerFor(name: String, size: Long): Array[Byte] = {
    require(name.getBytes("US-ASCII").length <= 100, s"name too long: $name")
    val h = new Array[Byte](Block)
    def put(s: String, off: Int): Unit = {
      val b = s.getBytes("US-ASCII")
      System.arraycopy(b, 0, h, off, b.length)
    }
    put(name, 0)
    put("0000644", 100) // mode
    put("0000000", 108) // uid
    put("0000000", 116) // gid
    put(f"$size%011o", 124) // size, 11 octal digits
    put("00000000000", 136) // mtime 0 — deterministic shards
    java.util.Arrays.fill(h, 148, 156, ' '.toByte) // checksum = spaces while summing
    h(156) = '0' // typeflag: regular file
    put("ustar", 257); h(262) = 0 // magic
    put("00", 263) // version
    val sum = h.map(_ & 0xff).sum
    put(f"$sum%06o", 148)
    h(154) = 0
    h(155) = ' '
    h
  }

  /** Streaming shard writer: header + payload + zero-pad per member,
    * two zero blocks on close (the tar EOF marker). */
  final class Writer(path: String) {
    private val out = new BufferedOutputStream(new FileOutputStream(path))
    def add(name: String, bytes: Array[Byte]): Unit = {
      out.write(headerFor(name, bytes.length.toLong))
      out.write(bytes)
      val pad = (Block - bytes.length % Block) % Block
      if (pad > 0) out.write(new Array[Byte](pad))
    }
    def close(): Unit = {
      out.write(new Array[Byte](2 * Block))
      out.close()
    }
  }

  /** Read every (name, bytes) member of a shard in one forward pass,
    * validating magic + checksum per header. Reads the member list
    * eagerly — a WebDataset shard is sized to be task-resident
    * (~100 MB–1 GB by convention); the 100 TB dataset is MANY shards,
    * not big ones. */
  def readAll(path: String): Seq[(String, Array[Byte])] = {
    val in = new BufferedInputStream(new FileInputStream(path))
    try {
      val out = Seq.newBuilder[(String, Array[Byte])]
      val h = new Array[Byte](Block)
      var done = false
      while (!done) {
        var off = 0
        while (off < Block) {
          val n = in.read(h, off, Block - off)
          require(n > 0, s"truncated header in $path")
          off += n
        }
        if (h.forall(_ == 0)) done = true // EOF zero block
        else {
          require(new String(h, 257, 5, "US-ASCII") == "ustar",
            s"bad magic in $path")
          val stored = Integer.parseInt(
            new String(h, 148, 6, "US-ASCII").trim, 8)
          val copy = h.clone()
          java.util.Arrays.fill(copy, 148, 156, ' '.toByte)
          require(copy.map(_ & 0xff).sum == stored,
            s"header checksum mismatch in $path")
          val name = new String(h.slice(0, 100).takeWhile(_ != 0), "US-ASCII")
          val size = java.lang.Long.parseLong(
            new String(h, 124, 11, "US-ASCII").trim, 8)
          val bytes = new Array[Byte](size.toInt)
          var boff = 0
          while (boff < size) {
            val n = in.read(bytes, boff, size.toInt - boff)
            require(n > 0, s"truncated member $name in $path")
            boff += n
          }
          val pad = ((Block - size % Block) % Block).toInt
          var skipped = 0
          while (skipped < pad) {
            val n = in.skip((pad - skipped).toLong).toInt
            require(n > 0, s"truncated padding in $path")
            skipped += n
          }
          out += ((name, bytes))
        }
      }
      out.result()
    } finally in.close()
  }
}
