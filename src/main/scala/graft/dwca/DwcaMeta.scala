package graft.dwca

import java.io.InputStreamReader
import java.nio.charset.Charset
import java.util.regex.Pattern
import java.util.zip.ZipFile

import scala.collection.mutable.ArrayBuffer

import javax.xml.parsers.DocumentBuilderFactory
import org.w3c.dom.Element

/** One DwC-A member table: a delimited text file inside the archive
  * plus the schema facts `meta.xml` declares about it.
  *
  * Mirrors the reference's `SourceLayer`
  * (`/root/reference/src/dwca_parquet/libs/dwca.py:8-28`): `name` is
  * the location stem, `headers` come from the FIRST LINE of the data
  * file split by `fieldsTerminatedBy` compiled as a REGEX (not from
  * the `<field term=…>` declarations), and the join key is the header
  * at the `<id index>` / `<coreid index>` position.
  */
final case class DwcaLayer(
    name: String,
    location: String,
    encoding: String,
    sepRegex: String,
    idIndex: Int,
    isExtension: Boolean,
    headers: Seq[String],
    /** `<field index term>` declarations — the reference ignores them
      * (column names come from the data header), but they are the
      * schema-pinning source when inference parity matters
      * (SURVEY §7.4): index → full DwC term URI. */
    fieldTerms: Map[Int, String] = Map.empty) {

  /** Positional join-key resolution (`dwca.py:24-25`). */
  def idCol: String = headers(idIndex)

  /** Short term name (URI fragment) per header position, where
    * declared — e.g. 2 → "scientificName". */
  def termNames: Map[Int, String] =
    fieldTerms.map { case (i, uri) => i -> uri.substring(uri.lastIndexOf('/') + 1) }

  /** The separator as a literal single character, when it is one —
    * IPT archives almost always use "\t", ",", or ";", which Spark's
    * CSV `sep` takes directly. None means `sepRegex` is a genuine
    * regular expression (a class like `\s` or any metacharacter) and
    * the scan must take the [[graft.sources.RegexCsv]] path. */
  def sepLiteralOpt: Option[String] = DwcaMeta.sepLiteralOf(sepRegex)

  /** Literal separator for the CSV scan (throws on a regex form —
    * callers branch on [[sepLiteralOpt]] first). */
  def sepLiteral: String = sepLiteralOpt.getOrElse(throw new IllegalArgumentException(
    s"fieldsTerminatedBy '$sepRegex' is not a single-character separator"))
}

/** Parsed `meta.xml`: core + extensions + the all-columns set.
  *
  * `columns` is the union of ALL layers' headers. The reference has a
  * bug here: `all_columns.union(ext.headers)` discards its result
  * (`dwca.py:42`), so extension columns never join the set and an
  * extension-only `footprintWKT` never triggers the geometry branch.
  * We fix it (SURVEY §2.2 P3) — the divergence only widens coverage.
  */
final case class DwcaArchive(core: DwcaLayer, extensions: Seq[DwcaLayer]) {
  def columns: Set[String] = (core.headers ++ extensions.flatMap(_.headers)).toSet
  def layers: Seq[DwcaLayer] = core +: extensions
}

/** Driver-side `meta.xml` schema discovery (`dwca.py:31-44`). Pure JDK
  * (DOM + java.util.zip) — no executor work, the archive descriptor is
  * a few KB regardless of data scale. */
object DwcaMeta {

  /** The `fieldsTerminatedBy` value as a literal single character,
    * when it is one. ANY bare single character is the literal
    * separator the archive author meant — including regex
    * metacharacters like "|", which compiled as a regex would match
    * the empty string and shred every row character-by-character.
    * None only for genuine regex forms: escaped classes (\d, \s, …)
    * and multi-character patterns. */
  private[dwca] def sepLiteralOf(sepRegex: String): Option[String] = sepRegex match {
    case "\\t" => Some("\t")
    case s if s.length == 2 && s.charAt(0) == '\\' =>
      if (Character.isLetterOrDigit(s.charAt(1))) None else Some(s.substring(1))
    case s if s.length == 1 => Some(s)
    case _ => None
  }

  def fromZip(zipPath: String): DwcaArchive = {
    val zf = new ZipFile(zipPath)
    try {
      val dbf = DocumentBuilderFactory.newInstance()
      dbf.setNamespaceAware(false)
      val metaEntry = Option(zf.getEntry("meta.xml")).getOrElse(
        throw new IllegalArgumentException(s"$zipPath has no meta.xml"))
      val doc = dbf.newDocumentBuilder().parse(zf.getInputStream(metaEntry))

      def layersOf(tag: String): Seq[Element] = {
        val nl = doc.getElementsByTagName(tag)
        (0 until nl.getLength).map(nl.item(_).asInstanceOf[Element])
      }

      def parseLayer(node: Element, isExtension: Boolean): DwcaLayer = {
        val location = node.getElementsByTagName("location").item(0).getTextContent.trim
        val encoding = node.getAttribute("encoding")
        val sepRegex = node.getAttribute("fieldsTerminatedBy")
        val idTag = if (isExtension) "coreid" else "id"
        val idIndex = node.getElementsByTagName(idTag).item(0)
          .asInstanceOf[Element].getAttribute("index").toInt
        val headers = readHeaders(zf, location, encoding, sepRegex)
        val name = location.lastIndexOf('.') match {
          case -1 => location
          case i  => location.substring(0, i)
        }
        val fields = node.getElementsByTagName("field")
        val terms = (0 until fields.getLength).map { i =>
          val f = fields.item(i).asInstanceOf[Element]
          f.getAttribute("index").toInt -> f.getAttribute("term")
        }.toMap
        DwcaLayer(name, location, encoding, sepRegex, idIndex, isExtension, headers, terms)
      }

      val core = parseLayer(layersOf("core").head, isExtension = false)
      val exts = layersOf("extension").map(parseLayer(_, isExtension = true))
      DwcaArchive(core, exts)
    } finally zf.close()
  }

  /** First line of a member, split by the terminator as a regex
    * (`dwca.py:19-20`). */
  private def readHeaders(zf: ZipFile, location: String, encoding: String,
      sepRegex: String): Seq[String] = {
    val entry = Option(zf.getEntry(location)).getOrElse(
      throw new IllegalArgumentException(s"zip member $location missing"))
    val in = new InputStreamReader(zf.getInputStream(entry), Charset.forName(encoding))
    try {
      val line = new ArrayBuffer[Char]()
      var c = in.read()
      while (c != -1 && c != '\n') { line += c.toChar; c = in.read() }
      val first = new String(line.toArray).stripSuffix("\r")
      // literal single-char separators split literally (a bare "|"
      // compiled as a regex would shred the header); genuine regex
      // forms split as the regex, mirroring dwca.py:19-20
      val splitter = sepLiteralOf(sepRegex) match {
        case Some(lit) => Pattern.compile(Pattern.quote(lit))
        case None      => Pattern.compile(sepRegex)
      }
      splitter.split(first, -1).toSeq
    } finally in.close()
  }
}
