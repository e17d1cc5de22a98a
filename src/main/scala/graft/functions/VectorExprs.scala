package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Codegen'd vector kernels for the similarity family.
  *
  * The HOF forms (`zip_with` + `aggregate` in Similarity/Ivf) are the
  * spec — they match the DuckDB oracle's `list_transform`/`list_sum`
  * arithmetic. But lambda HOFs are CodegenFallback: every row pays
  * interpreted eval over each element (the dominant cost of the
  * similarity bench family at 64-dim × corpus). These loops compute
  * IDENTICAL doubles — same element order, same cast points, so IEEE
  * results are bit-equal and every similarity oracle hash is preserved
  * (ExtSpec asserts the equivalence differentially).
  *
  * Contract: dense equal-length vectors (embeddings) — element nulls are
  * not expected; length mismatch uses the shorter prefix.
  */
object VectorLoops {
  @inline private def get(a: ArrayData, isDouble: Boolean, i: Int): Double =
    if (isDouble) a.getDouble(i) else a.getFloat(i).toDouble

  def dot(a: ArrayData, aD: Boolean, b: ArrayData, bD: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += get(a, aD, i) * get(b, bD, i); i += 1 }
    acc
  }

  def dist2(a: ArrayData, aD: Boolean, b: ArrayData, bD: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val d = get(a, aD, i) - get(b, bD, i)
      acc += d * d
      i += 1
    }
    acc
  }

  /** Plane component for flat index `k` = plane·dim + i (1-based i) —
    * pv=2, the MIXED family (r16): multiply → xor-shift → multiply →
    * xor-shift, every intermediate < 2^62 so the arithmetic is exact
    * in 64-bit integers AND in the DuckDB replay. The pv=1 family was
    * `(a·k + b) mod 2^31` — a LINEAR function of k, so sequential
    * plane indices produced near-shifted copies of one plane and bits
    * beyond ~6 added almost no bucket discrimination (measured at 1M
    * vectors: (8,2) → (14,2) cut candidates/vec only 1.24×, vs the
    * ~64× six honest bits should buy; bucket concentration ran 4.6×
    * above uniform). The xor-shifts break the linearity; occupancy
    * now tracks 2^bits as the LSH cost model assumes. */
  @inline def planeComponent(k: Long): Double = {
    val t1 = (k * 2654435761L) % 2147483648L
    val t2 = t1 ^ (t1 >> 15)
    val t3 = (t2 * 1103515245L + 12345L) % 2147483648L
    val t4 = t3 ^ (t3 >> 13)
    t4.toDouble / 2147483648.0 - 0.5
  }

  // plane VECTORS memoized per (dim, bits, planeOffset): the mixing
  // chain runs once per geometry per executor, not once per row per
  // component — the hot loop is a plain dot against a cached array
  // (cheaper than the retired pv=1 family, which recomputed its LCG
  // per row). Deterministic values, so a static cache is safe.
  private val planeCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int, Int), Array[Double]]()
  private def planesFor(dim: Int, bits: Int, planeOffset: Int): Array[Double] =
    planeCache.computeIfAbsent((dim, bits, planeOffset), _ =>
      Array.tabulate(bits * dim) { idx =>
        val j = idx / dim; val i = idx % dim + 1
        planeComponent((planeOffset + j).toLong * dim + i)
      })

  /** All `bits` hyperplane sign tests in ONE pass per row; same
    * arithmetic as Similarity.hyperplaneDot (both read
    * [[planeComponent]] — one owner, no drift). `planeOffset` selects
    * an independent plane family (band b uses planes b*bits ..
    * b*bits+bits-1) so multi-band embedding LSH needs no second hash
    * scheme. */
  def lshBucket(a: ArrayData, aD: Boolean, dim: Int, bits: Int, planeOffset: Int): Long = {
    val planes = planesFor(dim, bits, planeOffset)
    var bucket = 0L
    var j = 0
    while (j < bits) {
      var acc = 0.0
      var i = 0
      val off = j * dim
      while (i < dim) {
        acc += get(a, aD, i) * planes(off + i)
        i += 1
      }
      if (acc > 0) bucket += (1L << j)
      j += 1
    }
    bucket
  }
}

trait VectorInputCheck { self: Expression =>
  protected def vectorChildren: Seq[Expression]
  protected def isDoubleElem(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == DoubleType
  override def checkInputDataTypes(): TypeCheckResult = {
    val bad = vectorChildren.filterNot(_.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    })
    if (bad.isEmpty) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"${self.prettyName} expects array<float|double>, got ${bad.map(_.dataType.sql).mkString(", ")}")
  }
}

object IntVectorLoops {
  /** Element as long by type code: 0=byte, 1=short, 2=int, 3=long. */
  @inline private def get(a: ArrayData, t: Int, i: Int): Long = t match {
    case 0 => a.getByte(i).toLong
    case 1 => a.getShort(i).toLong
    case 2 => a.getInt(i).toLong
    case _ => a.getLong(i)
  }

  /** Exact integer dot — the quantized-scoring hot loop (int8 codes:
    * |q·q| ≤ 16129/term, overflow-safe to dim ≈ 2^47). */
  def dotQ(a: ArrayData, at: Int, b: ArrayData, bt: Int): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0L
    var i = 0
    while (i < n) { acc += get(a, at, i) * get(b, bt, i); i += 1 }
    acc
  }
}

/** Exact integer dot product of two integral arrays (any width mix —
  * the persisted index stores tinyint codes, in-flight probes carry
  * longs). Fused twin of the `zip_with`+`aggregate` HOF spec form in
  * Quantize (QuantizeSpec pins the differential). */
case class DotQExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "vec_dotq"

  private def typeCode(e: Expression): Int = e.dataType match {
    case ArrayType(ByteType, _) => 0
    case ArrayType(ShortType, _) => 1
    case ArrayType(IntegerType, _) => 2
    case _ => 3
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    val bad = Seq(left, right).filterNot(_.dataType match {
      case ArrayType(ByteType | ShortType | IntegerType | LongType, _) => true
      case _ => false
    })
    if (bad.isEmpty) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects integral arrays, got ${bad.map(_.dataType.sql).mkString(", ")}")
  }

  protected override def nullSafeEval(a: Any, b: Any): Any =
    IntVectorLoops.dotQ(a.asInstanceOf[ArrayData], typeCode(left),
      b.asInstanceOf[ArrayData], typeCode(right))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.IntVectorLoops.dotQ($a, ${typeCode(left)}, $b, ${typeCode(right)})")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotQExpr =
    copy(left = l, right = r)
}

case class DotExpr(left: Expression, right: Expression)
    extends BinaryExpression with VectorInputCheck {
  override protected def vectorChildren: Seq[Expression] = Seq(left, right)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  protected override def nullSafeEval(a: Any, b: Any): Any =
    VectorLoops.dot(a.asInstanceOf[ArrayData], isDoubleElem(left),
      b.asInstanceOf[ArrayData], isDoubleElem(right))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.VectorLoops.dot($a, ${isDoubleElem(left)}, $b, ${isDoubleElem(right)})")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotExpr =
    copy(left = l, right = r)
}

case class Dist2Expr(left: Expression, right: Expression)
    extends BinaryExpression with VectorInputCheck {
  override protected def vectorChildren: Seq[Expression] = Seq(left, right)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dist2"

  protected override def nullSafeEval(a: Any, b: Any): Any =
    VectorLoops.dist2(a.asInstanceOf[ArrayData], isDoubleElem(left),
      b.asInstanceOf[ArrayData], isDoubleElem(right))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.VectorLoops.dist2($a, ${isDoubleElem(left)}, $b, ${isDoubleElem(right)})")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Dist2Expr =
    copy(left = l, right = r)
}

case class LshBucketExpr(child: Expression, dim: Int, bits: Int, planeOffset: Int = 0)
    extends UnaryExpression with VectorInputCheck {
  override protected def vectorChildren: Seq[Expression] = Seq(child)
  override def dataType: DataType = LongType
  override def prettyName: String = "lsh_bucket"

  protected override def nullSafeEval(a: Any): Any =
    VectorLoops.lshBucket(a.asInstanceOf[ArrayData], isDoubleElem(child), dim, bits, planeOffset)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.VectorLoops.lshBucket($a, ${isDoubleElem(child)}, $dim, $bits, $planeOffset)")

  override protected def withNewChildInternal(newChild: Expression): LshBucketExpr =
    copy(child = newChild)
}
