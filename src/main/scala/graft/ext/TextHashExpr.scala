package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd twins of the TextHash rolling-hash kernels.
  *
  * The HOF forms (`split` → `transform` → `aggregate`) are the spec and
  * stay byte-for-byte compatible with the DuckDB oracle; these
  * expressions produce IDENTICAL values in one fused loop per string
  * (interpreted HOF char-hashing dominated the documents-family bench).
  * Tokenization matches Spark `split(text, " ")`: single-space
  * separators, empty tokens (incl. trailing) preserved. Characters are
  * UTF-16 units via String.charAt — identical to the HOF `ascii()` path
  * for all BMP text (the corpus is ASCII).
  */
object TextHashLoops {
  val P = 1000000007L

  def charHash(s: String): Long = {
    var acc = 0L
    var i = 0
    while (i < s.length) { acc = (acc * 31L + s.charAt(i)) % P; i += 1 }
    acc
  }

  def wordHashes(s: String): Array[Long] = {
    var nTokens = 1
    var i = 0
    while (i < s.length) { if (s.charAt(i) == ' ') nTokens += 1; i += 1 }
    val out = new Array[Long](nTokens)
    var acc = 0L
    var t = 0
    i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == ' ') { out(t) = acc; t += 1; acc = 0L }
      else acc = (acc * 31L + c) % P
      i += 1
    }
    out(t) = acc
    out
  }
}

case class CharHashExpr(child: Expression) extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "char_hash"

  protected override def nullSafeEval(v: Any): Any =
    TextHashLoops.charHash(v.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.ext.TextHashLoops.charHash($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): CharHashExpr =
    copy(child = newChild)
}

case class WordHashesExpr(child: Expression) extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "word_hashes"

  protected override def nullSafeEval(v: Any): Any =
    new GenericArrayData(TextHashLoops.wordHashes(v.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.ext.TextHashLoops.wordHashes($c.toString()))")

  override protected def withNewChildInternal(newChild: Expression): WordHashesExpr =
    copy(child = newChild)
}

object TextHashLoopsShingle {
  /** n-gram shingle hashes over a token-hash array (combined base-31 mod
    * P, same arithmetic as the HOF `TextHash.shingleHashes`). */
  def shingles(whs: org.apache.spark.sql.catalyst.util.ArrayData, n: Int): Array[Long] = {
    val len = whs.numElements()
    if (len < n) return Array.emptyLongArray
    val out = new Array[Long](len - n + 1)
    val P = TextHashLoops.P
    var i = 0
    while (i <= len - n) {
      var acc = whs.getLong(i)
      var j = 1
      while (j < n) { acc = (acc * 31L + whs.getLong(i + j)) % P; j += 1 }
      out(i) = acc
      i += 1
    }
    out
  }
}

case class ShingleHashesExpr(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(n >= 1)
  override def inputTypes: Seq[DataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  protected override def nullSafeEval(v: Any): Any =
    new GenericArrayData(TextHashLoopsShingle.shingles(
      v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], n))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.ext.TextHashLoopsShingle.shingles($c, $n))")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashesExpr =
    copy(child = newChild)
}

object TextHashExprs {
  def charHash(c: Column): Column = bridge.column(CharHashExpr(bridge.expression(c)))
  def wordHashes(c: Column): Column = bridge.column(WordHashesExpr(bridge.expression(c)))
  def shingleHashes(c: Column, n: Int): Column =
    bridge.column(ShingleHashesExpr(bridge.expression(c), n))
}
