package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native one-pass text-statistics extractor for the text-analysis
  * tier: `text_features(text, stops)` → struct of the per-document
  * counts every heuristic filter is built from.
  *
  * The SQL formulations it replaces (t01/t02/t11/t14) each made
  * several passes over the token array as interpreted higher-order
  * lambdas — `split` materializes the array, then each of
  * `array_distinct`, `filter`+`array_contains`, `transform`+
  * `aggregate`, bigram `transform` re-walks it with one boxed eval
  * per element. This kernel tokenizes once in a tight JVM loop and
  * stays inside whole-stage codegen — the same SQL-lambda→native
  * pattern as [[SimHash64]] and [[ByteFeatures]].
  *
  * Parity contract (the t01/t02/t11/t14 DuckDB oracles are unchanged
  * and assert it end-to-end; TextFeatures props cross-check the
  * kernel against the builtin formulation on adversarial strings):
  * tokenization is `split(text, ' ')` — single-space separator,
  * empty tokens preserved (leading/trailing/consecutive spaces),
  * `""` → one empty token. All "lengths" count Unicode code points,
  * matching Spark's `length()`.
  *
  *   - n_chars:         length(text)
  *   - n_tokens:        size(split(text, ' '))
  *   - n_uniq:          size(array_distinct(tokens))
  *   - sum_tok_len:     sum of token lengths
  *   - n_sym:           code points outside [a-z0-9 ] (the t14
  *                      symbol-ratio numerator)
  *   - n_stop:          tokens ∈ stops, counted with multiplicity
  *   - n_stop_uniq:     DISTINCT tokens ∈ stops
  *   - n_bigrams:       n_tokens - 1 (adjacent "w1 w2" pairs)
  *   - n_uniq_bigrams:  distinct adjacent pairs
  *
  * The basis-point divisions stay in the query projections, so the
  * integer math the oracles pin is untouched. `stops` is a literal
  * string array resolved to a hash set once at plan time (registered
  * like [[HashedShingles]]'s literal n).
  */
case class TextFeatures(child: Expression, stops: Seq[String])
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StructType(Seq(
    StructField("n_chars", IntegerType, nullable = false),
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("n_uniq", IntegerType, nullable = false),
    StructField("sum_tok_len", LongType, nullable = false),
    StructField("n_sym", IntegerType, nullable = false),
    StructField("n_stop", LongType, nullable = false),
    StructField("n_stop_uniq", IntegerType, nullable = false),
    StructField("n_bigrams", IntegerType, nullable = false),
    StructField("n_uniq_bigrams", IntegerType, nullable = false)))
  override def prettyName: String = "text_features"

  @transient private lazy val stopSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](math.max(stops.size * 2, 8))
    stops.foreach(s.add)
    s
  }

  override def eval(input: InternalRow): Any = {
    val t = child.eval(input)
    if (t == null) null
    else TextFeatures.compute(t.asInstanceOf[UTF8String], stopSet)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("stopSet", stopSet, "java.util.HashSet")
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.TextFeatures.compute($c, $setRef);
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): TextFeatures =
    copy(child = newChild)
}

object TextFeatures {
  /** One code-point pass; total on every input (incl. ""). */
  def compute(text: UTF8String, stops: java.util.HashSet[String]): InternalRow = {
    val s = text.toString
    val n = s.length
    val uniq = new java.util.HashSet[String]()
    val uniqBi = new java.util.HashSet[String]()
    var nChars = 0
    var nTokens = 0
    var sumTokLen = 0L
    var nSym = 0
    var nStop = 0L
    var nStopUniq = 0
    var prev: String = null
    var start = 0  // UTF-16 offset of the current token's first unit
    var tokLen = 0 // code points in the current token
    var i = 0

    def closeToken(end: Int): Unit = {
      val tok = s.substring(start, end)
      nTokens += 1
      sumTokLen += tokLen
      val isStop = stops.contains(tok)
      if (isStop) nStop += 1
      if (uniq.add(tok) && isStop) nStopUniq += 1
      if (prev != null) uniqBi.add(prev + " " + tok)
      prev = tok
      tokLen = 0
    }

    while (i < n) {
      val cp = s.codePointAt(i)
      nChars += 1
      if (cp == ' ') {
        closeToken(i)
        start = i + 1
      } else {
        tokLen += 1
        if (!((cp >= 'a' && cp <= 'z') || (cp >= '0' && cp <= '9'))) nSym += 1
      }
      i += Character.charCount(cp)
    }
    closeToken(n)

    InternalRow(nChars, nTokens, uniq.size, sumTokLen, nSym, nStop, nStopUniq,
      nTokens - 1, uniqBi.size)
  }
}
