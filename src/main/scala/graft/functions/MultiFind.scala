package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Multi-pattern substring search as ONE pass per row — the
  * Aho-Corasick automaton the c08 Scaladoc promises for the
  * thousands-of-canaries regime: `filter(patterns, p ->
  * contains(text, p))` walks the text once PER PATTERN (O(|text|·k)),
  * this kernel walks it once TOTAL (O(|text| + hits)) whatever k is.
  * The automaton is built once per distinct pattern set and cached
  * process-wide (the hyperplane-matrix pattern), so executors pay
  * construction once, not per row.
  */
object MultiPattern {

  /** Classic Aho-Corasick: trie + BFS failure links with output-set
    * closure. Matching collects the DISTINCT pattern indices present
    * anywhere in the text, ascending. */
  final class AC(val patterns: Array[String]) extends Serializable {
    // build-time only (matching uses the frozen arrays below):
    // @transient so the reference object shipped to executors carries
    // the flat tables, not the boxed trie
    @transient private val children: Array[java.util.HashMap[Character, Integer]] = {
      val cap = patterns.map(_.length).sum + 1
      Array.fill(cap)(new java.util.HashMap[Character, Integer]())
    }
    @transient private val outBuild = Array.fill(children.length)(List.empty[Int])
    private var nNodes = 1
    patterns.zipWithIndex.foreach { case (p, pi) =>
      var cur = 0
      p.foreach { ch =>
        val nxt = children(cur).get(ch)
        if (nxt == null) {
          children(cur).put(ch, nNodes)
          cur = nNodes
          nNodes += 1
        } else cur = nxt
      }
      outBuild(cur) = pi :: outBuild(cur)
    }
    private val fail = new Array[Int](nNodes)
    locally {
      val q = new java.util.ArrayDeque[Integer]()
      children(0).values().forEach(c => { fail(c) = 0; q.add(c); () })
      while (!q.isEmpty) {
        val u = q.poll().intValue()
        val it = children(u).entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          val (ch, v) = (e.getKey, e.getValue.intValue())
          q.add(v)
          var f = fail(u)
          var c = children(f).get(ch)
          while (c == null && f != 0) { f = fail(f); c = children(f).get(ch) }
          fail(v) = if (c != null && c.intValue() != v) c.intValue() else 0
          // BFS order: fail(v) is shallower, its closure is final
          outBuild(v) = outBuild(v) ++ outBuild(fail(v))
        }
      }
    }
    private val outputs: Array[Array[Int]] =
      outBuild.take(nNodes).map(_.distinct.sorted.toArray)

    // The HashMap trie exists only during construction; matching runs
    // once per ROW over the whole corpus, so the hot loop must be
    // allocation- and boxing-free: per node, parallel sorted
    // (char, next-state) arrays probed by binary search.
    private val transChar: Array[Array[Char]] = Array.tabulate(nNodes) { u =>
      val ks = new Array[Char](children(u).size())
      val it = children(u).keySet().iterator()
      var i = 0
      while (it.hasNext) { ks(i) = it.next(); i += 1 }
      java.util.Arrays.sort(ks)
      ks
    }
    private val transNext: Array[Array[Int]] = Array.tabulate(nNodes) { u =>
      transChar(u).map(ch => children(u).get(ch).intValue())
    }

    private def step(node: Int, ch: Char): Int = {
      val i = java.util.Arrays.binarySearch(transChar(node), ch)
      if (i >= 0) transNext(node)(i) else -1
    }

    def findDistinct(text: UTF8String): ArrayData = {
      val s = text.toString
      val hit = new Array[Boolean](patterns.length)
      var cur = 0
      var i = 0
      while (i < s.length) {
        val ch = s.charAt(i)
        var c = step(cur, ch)
        while (c < 0 && cur != 0) { cur = fail(cur); c = step(cur, ch) }
        cur = if (c >= 0) c else 0
        val os = outputs(cur)
        var j = 0
        while (j < os.length) { hit(os(j)) = true; j += 1 }
        i += 1
      }
      var n = 0
      var k = 0
      while (k < hit.length) { if (hit(k)) n += 1; k += 1 }
      val ids = new Array[Int](n)
      var w = 0
      k = 0
      while (k < hit.length) { if (hit(k)) { ids(w) = k; w += 1 }; k += 1 }
      new GenericArrayData(ids)
    }
  }

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[Seq[String], AC]()

  def automaton(ps: Seq[String]): AC =
    cache.computeIfAbsent(ps, p => new AC(p.toArray))
}

/** `multi_find(text, 'p0', 'p1', …)` → array<int>: the distinct
  * pattern indices occurring in `text`, ascending. Patterns must be
  * string literals (the automaton is a plan-time constant, like the
  * hyperplane matrix). */
case class MultiFind(child: Expression, patterns: Seq[String])
    extends UnaryExpression with ImplicitCastInputTypes {
  require(patterns.nonEmpty && patterns.forall(_.nonEmpty),
    "multi_find needs at least one non-empty literal pattern")
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "multi_find"
  override def nullIntolerant: Boolean = true

  @transient private lazy val ac = MultiPattern.automaton(patterns)

  override protected def nullSafeEval(a: Any): Any =
    ac.findDistinct(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val acRef = ctx.addReferenceObj("ac", ac,
      classOf[MultiPattern.AC].getName)
    defineCodeGen(ctx, ev, c => s"$acRef.findDistinct($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): MultiFind =
    copy(child = newChild)
}
