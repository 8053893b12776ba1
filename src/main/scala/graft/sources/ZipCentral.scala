package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

/** Central-directory metadata of a zip archive — the only way to
  * learn per-member method/size/offset without streaming the whole
  * archive. Shared by [[ZipLinesSource]]'s planner (STORED byte-range
  * splits) and [[ZipSource]]'s auto-staging router (DEFLATE members
  * past the size threshold get the one-pass re-chunk). Two bounded
  * reads: the EOCD tail window, then the directory itself — O(members)
  * driver-side bytes, never the archive body.
  */
private[graft] object ZipCentral {

  /** One central-directory entry, as planning needs it. `method` 0 is
    * STORED, 8 DEFLATE; `flags` bit0 = encrypted, bit3 = sizes
    * deferred to a data descriptor. */
  case class Entry(name: String, method: Int, flags: Int,
      usize: Long, localOff: Long) {
    def stored: Boolean = method == 0
  }

  /** Parse the END-OF-CENTRAL-DIRECTORY record + central directory.
    * Returns None on anything exotic (zip64 markers, malformed tail),
    * in which case callers fall back to streaming semantics. */
  def entries(conf: Configuration, path: String): Option[Seq[Entry]] = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val len = fs.getFileStatus(p).getLen
    val in = fs.open(p)
    try {
      val tailLen = math.min(len, 22L + 0xFFFF).toInt
      val tail = new Array[Byte](tailLen)
      in.readFully(len - tailLen, tail)
      def u16(b: Array[Byte], o: Int): Int =
        (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8)
      def u32(b: Array[Byte], o: Int): Long =
        (u16(b, o).toLong) | (u16(b, o + 2).toLong << 16)
      // last EOCD signature in the tail window
      var eocd = -1
      var i = tailLen - 22
      while (i >= 0 && eocd < 0) {
        if (tail(i) == 0x50 && tail(i + 1) == 0x4B &&
            tail(i + 2) == 0x05 && tail(i + 3) == 0x06) eocd = i
        i -= 1
      }
      if (eocd < 0) return None
      val nEntries = u16(tail, eocd + 10)
      val cdSize = u32(tail, eocd + 12)
      val cdOff = u32(tail, eocd + 16)
      if (nEntries == 0xFFFF || cdOff == 0xFFFFFFFFL) return None // zip64
      val cd = new Array[Byte](cdSize.toInt)
      in.readFully(cdOff, cd)
      val out = Seq.newBuilder[Entry]
      var o = 0
      var n = 0
      while (n < nEntries) {
        if (u32(cd, o) != 0x02014b50L) return None
        val flags = u16(cd, o + 8)
        val method = u16(cd, o + 10)
        val usize = u32(cd, o + 24)
        val nameLen = u16(cd, o + 28)
        val extraLen = u16(cd, o + 30)
        val commentLen = u16(cd, o + 32)
        val localOff = u32(cd, o + 42)
        val name = new String(cd, o + 46, nameLen,
          java.nio.charset.StandardCharsets.UTF_8)
        if (usize == 0xFFFFFFFFL || localOff == 0xFFFFFFFFL) return None // zip64
        if (!name.endsWith("/")) out += Entry(name, method, flags, usize, localOff)
        o += 46 + nameLen + extraLen + commentLen
        n += 1
      }
      Some(out.result())
    } catch { case _: Exception => None }
    finally in.close()
  }
}
