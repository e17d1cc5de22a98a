package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Multi-pattern phrase matching as ONE text pass — the blocklist
  * primitive of corpus curation (profanity / boilerplate / banned-
  * phrase gates): the classic Aho-Corasick automaton (Aho & Corasick
  * 1975, CACM 18(6)) matches EVERY phrase of a dictionary in a single
  * left-to-right scan, O(|text| + matches), independent of dictionary
  * size — where the regex-alternation a naive gate reaches for
  * ("p1|p2|…") degrades with every added phrase.
  *
  * Matching is case-sensitive substring semantics over the raw text
  * (callers lowercase/normalize the column first when the dictionary
  * is case-insensitive — composes with [[TextNorm]]); ALL occurrences
  * are counted, including overlapping ones and phrases nested inside
  * longer dictionary phrases.
  *
  * Scale shape (the [[Bpe]] convention): the automaton is built once
  * on the driver from the phrase list, rides the expressions as
  * literal reference state (one task-binary broadcast per stage — real
  * blocklists are thousands of phrases, a few MB), the scan is
  * row-local, and every expression stays inside whole-stage codegen.
  */
/** Immutable matching automaton: goto transitions, BFS-computed fail
  * links, and per-node AGGREGATED output lists (phrase ids ending at
  * the node, its fail target, that one's fail target, …) so the scan
  * never walks fail chains for output. Top-level class so generated
  * code can name it (`ctx.addReferenceObj` casts need a Java-visible
  * class name). */
final class AcAutomaton(phrases: Seq[String]) extends Serializable {
    require(phrases.nonEmpty, "empty phrase list")
    require(phrases.forall(_.nonEmpty), "empty phrase")
    require(phrases.distinct.size == phrases.size, s"duplicate phrases")
    val nPhrases: Int = phrases.size

    // trie build
    private val gotoMaps = new java.util.ArrayList[java.util.HashMap[Character, Integer]]()
    private val ends = new java.util.ArrayList[java.util.ArrayList[Integer]]()
    private def newNode(): Int = {
      gotoMaps.add(new java.util.HashMap[Character, Integer]())
      ends.add(new java.util.ArrayList[Integer]())
      gotoMaps.size - 1
    }
    newNode() // root = 0
    phrases.zipWithIndex.foreach { case (p, id) =>
      var s = 0
      p.foreach { ch =>
        val m = gotoMaps.get(s)
        val nxt = m.get(ch)
        s = if (nxt != null) nxt.intValue()
        else { val n = newNode(); m.put(ch, n); n }
      }
      ends.get(s).add(id)
    }

    // BFS fail links + output aggregation
    val fail: Array[Int] = new Array[Int](gotoMaps.size)
    val out: Array[Array[Int]] = new Array[Array[Int]](gotoMaps.size)
    locally {
      val q = new java.util.ArrayDeque[Integer]()
      val rootIt = gotoMaps.get(0).values().iterator()
      while (rootIt.hasNext) { val c = rootIt.next().intValue(); fail(c) = 0; q.add(c) }
      out(0) = toInts(ends.get(0))
      val order = new java.util.ArrayList[Integer]()
      while (!q.isEmpty) {
        val u = q.poll().intValue()
        order.add(u)
        val it = gotoMaps.get(u).entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          val (ch, v) = (e.getKey.charValue(), e.getValue.intValue())
          var f = fail(u)
          while (f != 0 && !gotoMaps.get(f).containsKey(ch)) f = fail(f)
          val t = gotoMaps.get(f).get(ch)
          fail(v) = if (t != null && t.intValue() != v) t.intValue() else 0
          q.add(v)
        }
      }
      // BFS order guarantees fail(u) is finalized before u
      val oIt = order.iterator()
      while (oIt.hasNext) {
        val u = oIt.next().intValue()
        val own = toInts(ends.get(u))
        val inherited = out(fail(u))
        out(u) = if (inherited.isEmpty) own
        else if (own.isEmpty) inherited
        else own ++ inherited
      }
    }
    private def toInts(l: java.util.ArrayList[Integer]): Array[Int] = {
      val a = new Array[Int](l.size); var i = 0
      while (i < a.length) { a(i) = l.get(i).intValue(); i += 1 }
      a
    }

    def step(state: Int, ch: Char): Int = {
      var s = state
      while (true) {
        val t = gotoMaps.get(s).get(ch)
        if (t != null) return t.intValue()
        if (s == 0) return 0
        s = fail(s)
      }
    0
  }
}

object AcLoops {

  def build(phrases: Seq[String]): AcAutomaton = new AcAutomaton(phrases)

  /** Per-phrase occurrence counts (dictionary order), one scan. */
  def counts(text: String, ac: AcAutomaton): GenericArrayData = {
    val c = new Array[Long](ac.nPhrases)
    var s = 0
    var i = 0
    while (i < text.length) {
      s = ac.step(s, text.charAt(i))
      val o = ac.out(s)
      var j = 0
      while (j < o.length) { c(o(j)) += 1; j += 1 }
      i += 1
    }
    new GenericArrayData(c)
  }

  /** Any-match gate — stops at the FIRST hit. */
  def containsAny(text: String, ac: AcAutomaton): Boolean = {
    var s = 0
    var i = 0
    while (i < text.length) {
      s = ac.step(s, text.charAt(i))
      if (ac.out(s).length > 0) return true
      i += 1
    }
    false
  }

  /** Total occurrence count across the dictionary, one scan. */
  def totalCount(text: String, ac: AcAutomaton): Long = {
    var n = 0L
    var s = 0
    var i = 0
    while (i < text.length) {
      s = ac.step(s, text.charAt(i))
      n += ac.out(s).length
      i += 1
    }
    n
  }
}

/** array<bigint>: per-phrase occurrence counts, dictionary order. */
case class PhraseCountsExpr(child: Expression, phrases: Seq[String])
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "phrase_counts"

  @transient private lazy val ac = AcLoops.build(phrases)

  protected override def nullSafeEval(v: Any): Any =
    AcLoops.counts(v.asInstanceOf[UTF8String].toString, ac)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("acAuto", ac, "graft.ext.AcAutomaton")
    defineCodeGen(ctx, ev, c => s"graft.ext.AcLoops.counts($c.toString(), $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): PhraseCountsExpr =
    copy(child = newChild)
}

/** boolean: does ANY dictionary phrase occur (first-hit early exit). */
case class PhraseAnyExpr(child: Expression, phrases: Seq[String])
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = BooleanType
  override def prettyName: String = "phrase_any"

  @transient private lazy val ac = AcLoops.build(phrases)

  protected override def nullSafeEval(v: Any): Any =
    AcLoops.containsAny(v.asInstanceOf[UTF8String].toString, ac)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("acAuto", ac, "graft.ext.AcAutomaton")
    defineCodeGen(ctx, ev, c => s"graft.ext.AcLoops.containsAny($c.toString(), $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): PhraseAnyExpr =
    copy(child = newChild)
}

/** bigint: total occurrences across the dictionary. */
case class PhraseTotalExpr(child: Expression, phrases: Seq[String])
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "phrase_total"

  @transient private lazy val ac = AcLoops.build(phrases)

  protected override def nullSafeEval(v: Any): Any =
    AcLoops.totalCount(v.asInstanceOf[UTF8String].toString, ac)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("acAuto", ac, "graft.ext.AcAutomaton")
    defineCodeGen(ctx, ev, c => s"graft.ext.AcLoops.totalCount($c.toString(), $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): PhraseTotalExpr =
    copy(child = newChild)
}

object PhraseMatch {
  import org.apache.spark.sql.functions._

  /** Per-phrase occurrence counts (array<bigint>, dictionary order). */
  def counts(text: Column, phrases: Seq[String]): Column =
    bridge.column(PhraseCountsExpr(bridge.expression(text), phrases))

  /** Any-phrase gate (early exit on the first hit). */
  def containsAny(text: Column, phrases: Seq[String]): Column =
    bridge.column(PhraseAnyExpr(bridge.expression(text), phrases))

  /** Total occurrences across the dictionary. */
  def totalCount(text: Column, phrases: Seq[String]): Column =
    bridge.column(PhraseTotalExpr(bridge.expression(text), phrases))

  /** Drop documents containing ANY dictionary phrase — the blocklist
    * gate (map-only; null text passes, matching the [[Web]] gates'
    * "absent field is not a match" convention). */
  def blockByPhrases(docs: DataFrame, textCol: String,
                     phrases: Seq[String]): DataFrame =
    docs.filter(!coalesce(containsAny(col(textCol), phrases), lit(false)))
}
