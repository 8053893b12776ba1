package graft.functions

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

class HashingSpec extends AnyFunSuite with SparkTestBase {

  private val rnd = new scala.util.Random(42)

  test("jvm32 matches the h32 SQL expression for random strings") {
    Hashing.register(spark) // don't depend on another suite's registration
    val strings = (Seq("", "a", "the quick brown fox", "0:key agg row") ++
      (0 until 200).map(_ => rnd.alphanumeric.take(rnd.nextInt(40) + 1).mkString))
      .distinct
    // one Spark job over the whole sample, not a job per case
    import spark.implicits._
    val fromSql = strings.toDF("s")
      .selectExpr("s", Hashing.h32Sql("s") + " as h")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    strings.foreach { s =>
      assert(fromSql(s) === Hashing.jvm32(s), s"mismatch for '$s'")
    }
  }

  test("native simhash64 equals the SQL-lambda formulation (incl. sign bit, empty, unicode)") {
    Hashing.register(spark)
    import spark.implicits._
    // fail loudly if the kernel's generated call doesn't compile —
    // with the default fallback a codegen bug silently runs
    // interpreted, which is exactly the regression this kernel exists
    // to prevent (a companion method named `eval` gets no static
    // forwarder and did exactly that)
    val fallback = spark.conf.get("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
    val texts = Seq("", "one", "a b c", "the the the unique",
      "ünïcødé tøkens π∆", "x " * 50 + "y") ++
      (0 until 100).map(_ => (0 until rnd.nextInt(12) + 1)
        .map(_ => rnd.alphanumeric.take(rnd.nextInt(8) + 1).mkString).mkString(" "))
    val rows = texts.distinct.toDF("text")
      .selectExpr("text", "simhash64(split(text, ' ')) as native",
        s"""aggregate(transform(sequence(0, 63),
              b -> if(2 * size(filter(transform(split(text, ' '), tok -> array(h32(tok), h32b(tok))),
                                      h -> (element_at(h, if(b < 32, 1, 2)) div shiftleft(cast(1 as bigint), b % 32)) % 2 = 1)) >= size(split(text, ' ')),
                      shiftleft(cast(1 as bigint), b), cast(0 as bigint))),
            cast(0 as bigint), (a, x) -> a + x) as lambda""")
      .collect()
    rows.foreach { r =>
      assert(r.getLong(1) === r.getLong(2), s"mismatch for '${r.getString(0)}'")
    }
    // the upper word is exercised: some hash sets a bit >= 32
    assert(rows.exists(r => r.getLong(1) < 0 || r.getLong(1) >= (1L << 32)))
    } finally spark.conf.set("spark.sql.codegen.fallback", fallback)
  }

  test("jvm32 range is unsigned 32-bit") {
    (0 until 1000).foreach { _ =>
      val h = Hashing.jvm32(rnd.nextString(12))
      assert(h >= 0L && h < (1L << 32))
    }
  }

  test("nfc kernel: composes decomposed forms, idempotent, ASCII fast-path is identity") {
    Hashing.register(spark)
    import org.apache.spark.unsafe.types.UTF8String
    val nfd = "Cafe\u0301" // e + combining acute
    val pre = "Caf\u00e9" // precomposed
    assert(nfd != pre && nfd.length == 5 && pre.length == 4)
    // SQL surface: the two spellings collapse to one fingerprint
    val r = spark.sql(
      s"SELECT nfc('$nfd') = nfc('$pre'), nfc('$nfd') = '$pre', " +
        s"nfc(nfc('$nfd')) = nfc('$nfd'), nfc(cast(null as string))").collect()(0)
    assert(r.getBoolean(0) && r.getBoolean(1) && r.getBoolean(2))
    assert(r.isNullAt(3))
    // already-normalized input returns the SAME UTF8String, no copy
    val ascii = UTF8String.fromString("plain ascii text")
    assert(TextNorm.nfc(ascii) eq ascii)
    val emoji = UTF8String.fromString("ok 😀 end") // non-BMP passthrough
    assert(TextNorm.nfc(emoji) eq emoji)
  }
}
