package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `duck_type_mask(s)` → bitmask of the DuckDB-sniffer candidate
  * types a string value satisfies — the hot inner loop of
  * [[graft.sources.SnifferCsv]]'s classification pass as ONE
  * hand-rolled scan instead of six regex/try-cast evaluations per
  * value (the SQL formulation ran 2 regexes, 2 date regexes + try_to,
  * a timestamp regex + try_to, and a try_cast per value; this is the
  * same SQL-chain→native-kernel move as [[SimHash64]] and
  * [[ByteFeatures]]).
  *
  * Bit semantics replicate the empirically-probed DuckDB rules
  * exactly (SnifferCsvSpec pins them, and a property spec asserts
  * mask-vs-regex agreement on adversarial generated strings):
  *   - BOOL (1): case-insensitive true/false
  *   - BIGINT (2): optional surrounding whitespace, optional '-',
  *     no leading zeros ("0" itself ok), fits int64
  *   - DOUBLE (4): NO padding, optional '-', no leading zeros,
  *     `.5`/`5.` ok, optional exponent, or nan/inf/-inf (any case)
  *   - DATE_ISO (8): yyyy-MM-dd, calendar-valid
  *   - DATE_DMY (16): d/M/yyyy (1-2 digit day/month), calendar-valid,
  *     day-first
  *   - DATE_MDY (64): M/d/yyyy, calendar-valid, month-first — an
  *     ambiguous slash date sets BOTH slash bits; which one wins is
  *     the per-FILE dateformat resolution in [[graft.sources.SnifferCsv]]
  *   - TS (32): yyyy-MM-dd HH:mm:ss, calendar- and clock-valid
  */
case class DuckTypeMask(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = IntegerType
  override def prettyName: String = "duck_type_mask"
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(s: Any): Any =
    DuckTypeMask.mask(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.DuckTypeMask.mask($c)")

  override protected def withNewChildInternal(newChild: Expression): DuckTypeMask =
    copy(child = newChild)
}

object DuckTypeMask {
  val BOOL = 1
  val BIGINT = 2
  val DOUBLE = 4
  val DATE_ISO = 8
  val DATE_DMY = 16
  val TS = 32
  val DATE_MDY = 64

  private def daysIn(y: Int, m: Int): Int = m match {
    case 1 | 3 | 5 | 7 | 8 | 10 | 12 => 31
    case 4 | 6 | 9 | 11 => 30
    case 2 => if ((y % 4 == 0 && y % 100 != 0) || y % 400 == 0) 29 else 28
    case _ => 0
  }

  private def validDate(y: Int, m: Int, d: Int): Boolean =
    m >= 1 && m <= 12 && d >= 1 && d <= daysIn(y, m)

  @inline private def dig(c: Char): Boolean = c >= '0' && c <= '9'

  /** int64 check over s[from, until): optional '-', digits, no
    * leading zero (lone "0" ok), magnitude fits. */
  private def isBigint(s: String, from: Int, until: Int): Boolean = {
    var i = from
    if (i < until && s.charAt(i) == '-') i += 1
    val d0 = i
    if (i >= until) return false
    while (i < until && dig(s.charAt(i))) i += 1
    if (i != until) return false
    val n = until - d0
    if (n > 1 && s.charAt(d0) == '0') return false // leading zero
    if (n < 19) return true
    if (n > 19) return false
    // 19 digits: lexicographic compare against the int64 boundary
    val limit = if (s.charAt(from) == '-') "9223372036854775808" else "9223372036854775807"
    s.substring(d0, until) <= limit
  }

  private def isDouble(s: String): Boolean = {
    val n = s.length
    if (n == 0) return false
    // special spellings
    if (s.equalsIgnoreCase("nan") || s.equalsIgnoreCase("inf") ||
        s.equalsIgnoreCase("-inf")) return true
    var i = 0
    if (s.charAt(i) == '-') i += 1
    var intDigits = 0
    val d0 = i
    while (i < n && dig(s.charAt(i))) { i += 1; intDigits += 1 }
    if (intDigits > 1 && s.charAt(d0) == '0') return false // leading zero
    var fracDigits = 0
    if (i < n && s.charAt(i) == '.') {
      i += 1
      while (i < n && dig(s.charAt(i))) { i += 1; fracDigits += 1 }
    }
    if (intDigits == 0 && fracDigits == 0) return false // ".", "-", "e3"
    if (i < n && (s.charAt(i) == 'e' || s.charAt(i) == 'E')) {
      i += 1
      if (i < n && (s.charAt(i) == '+' || s.charAt(i) == '-')) i += 1
      var expDigits = 0
      while (i < n && dig(s.charAt(i))) { i += 1; expDigits += 1 }
      if (expDigits == 0) return false
    }
    i == n
  }

  private def num(s: String, from: Int, until: Int): Int = {
    var v = 0
    var i = from
    while (i < until) { v = v * 10 + (s.charAt(i) - '0'); i += 1 }
    v
  }

  /** yyyy-MM-dd over s[from, from+10); caller guarantees length. */
  private def isIsoDate(s: String, from: Int): Boolean =
    dig(s.charAt(from)) && dig(s.charAt(from + 1)) && dig(s.charAt(from + 2)) &&
      dig(s.charAt(from + 3)) && s.charAt(from + 4) == '-' &&
      dig(s.charAt(from + 5)) && dig(s.charAt(from + 6)) && s.charAt(from + 7) == '-' &&
      dig(s.charAt(from + 8)) && dig(s.charAt(from + 9)) &&
      validDate(num(s, from, from + 4), num(s, from + 5, from + 7), num(s, from + 8, from + 10))

  /** Slash-date bits for a candidate `a/b/yyyy`: DATE_DMY if valid
    * day-first, DATE_MDY if valid month-first (ambiguous sets both);
    * 0 if not a slash date at all. */
  private def slashDateBits(s: String): Int = {
    val n = s.length
    val s1 = s.indexOf('/')
    if (s1 < 1 || s1 > 2) return 0
    val s2 = s.indexOf('/', s1 + 1)
    if (s2 < 0 || s2 - s1 - 1 < 1 || s2 - s1 - 1 > 2 || n - s2 - 1 != 4) return 0
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (i != s1 && i != s2 && !dig(c)) return 0
      i += 1
    }
    val y = num(s, s2 + 1, n)
    val a = num(s, 0, s1)
    val b = num(s, s1 + 1, s2)
    (if (validDate(y, b, a)) DATE_DMY else 0) | (if (validDate(y, a, b)) DATE_MDY else 0)
  }

  private def isTimestamp(s: String): Boolean =
    s.length == 19 && isIsoDate(s, 0) && s.charAt(10) == ' ' &&
      dig(s.charAt(11)) && dig(s.charAt(12)) && s.charAt(13) == ':' &&
      dig(s.charAt(14)) && dig(s.charAt(15)) && s.charAt(16) == ':' &&
      dig(s.charAt(17)) && dig(s.charAt(18)) &&
      num(s, 11, 13) < 24 && num(s, 14, 16) < 60 && num(s, 17, 19) < 60

  def mask(u: UTF8String): Int = {
    val s = u.toString
    val n = s.length
    if (n == 0) return 0
    var m = 0
    if (s.equalsIgnoreCase("true") || s.equalsIgnoreCase("false")) m |= BOOL
    // integers tolerate surrounding whitespace; nothing else does
    var a = 0
    var b = n
    while (a < b && s.charAt(a) == ' ') a += 1
    while (b > a && s.charAt(b - 1) == ' ') b -= 1
    if (a < b && isBigint(s, a, b)) m |= BIGINT
    if (isDouble(s)) m |= DOUBLE
    if (n == 10 && isIsoDate(s, 0)) m |= DATE_ISO
    m |= slashDateBits(s)
    if (isTimestamp(s)) m |= TS
    m
  }
}
