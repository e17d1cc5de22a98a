package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Codegen kernels for weight-table lookups over hashed-feature bucket
  * arrays — the serve-time hot path of [[Dsir.scoreDocs]] and
  * [[LogReg.scoreHashed]]/`trainHashed`.
  *
  * The HOF form (`aggregate(buckets, init, (acc, b) => acc +
  * element_at(weightLit, b + 1))`) is the readable spec, but Catalyst
  * evaluates lambda HOFs interpreted (CodegenFallback) — a per-token
  * megamorphic call chain on the map stage that touches EVERY document.
  * These kernels do the identical fold (same element order, same double
  * addition sequence for the real-valued variant — bit-replicability
  * contract) as one tight loop over the weight table captured as a
  * plain JVM array in the generated code.
  *
  * Both kernels pin the HOF's `element_at(…, b + 1)` semantics under
  * ANSI mode: a bucket id outside [0, weights.length) RAISES (the
  * ANSI invalid-array-index error — never a silent null), and a null
  * bucket element nulls the fold (`acc + null`). Bucket ids from
  * [[Dsir.buckets]] are always in range (pmod m); the guard exists so
  * the kernel ≡ HOF equivalence is total, not fixture-shaped. */
object BucketLoops {
  /** Integer fold: init + Σ weights(b) in array order; null bucket →
    * null fold, out-of-range bucket → raises (ANSI element_at parity). */
  def sumLong(buckets: ArrayData, weights: Array[Long], init: Long): Any = {
    val n = buckets.numElements()
    var acc = init
    var i = 0
    while (i < n) {
      if (buckets.isNullAt(i)) return null
      val b = buckets.getLong(i)
      if (b < 0L || b >= weights.length)
        throw new ArrayIndexOutOfBoundsException(
          s"bucket $b outside the weight table [0, ${weights.length})")
      acc += weights(b.toInt)
      i += 1
    }
    acc
  }

  /** Double fold, same sequential order as the HOF (bit-replicable). */
  def dotDouble(buckets: ArrayData, weights: Array[Double], init: Double): Any = {
    val n = buckets.numElements()
    var acc = init
    var i = 0
    while (i < n) {
      if (buckets.isNullAt(i)) return null
      val b = buckets.getLong(i)
      if (b < 0L || b >= weights.length)
        throw new ArrayIndexOutOfBoundsException(
          s"bucket $b outside the weight table [0, ${weights.length})")
      acc += weights(b.toInt)
      i += 1
    }
    acc
  }
}

case class BucketSumLongExpr(child: Expression, weights: Array[Long], init: Long)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "bucket_sum"

  protected override def nullSafeEval(v: Any): Any =
    BucketLoops.sumLong(v.asInstanceOf[ArrayData], weights, init)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the table rides the generated class as a reference object — a
    // source-text literal of 10k elements would blow the 64KB method
    // limit and silently fall back to interpreted (the MaskGt lesson)
    val wRef = ctx.addReferenceObj("bucketWeights", weights, "long[]")
    val tmp = ctx.freshName("sum")
    nullSafeCodeGen(ctx, ev, c => s"""
      Object $tmp = graft.ext.BucketLoops.sumLong($c, $wRef, ${init}L);
      if ($tmp == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ((Long) $tmp).longValue(); }""")
  }

  override protected def withNewChildInternal(newChild: Expression): BucketSumLongExpr =
    copy(child = newChild)
}

case class BucketDotDoubleExpr(child: Expression, weights: Array[Double], init: Double)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "bucket_dot"

  protected override def nullSafeEval(v: Any): Any =
    BucketLoops.dotDouble(v.asInstanceOf[ArrayData], weights, init)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wRef = ctx.addReferenceObj("bucketWeights", weights, "double[]")
    val initLit =
      s"Double.longBitsToDouble(${java.lang.Double.doubleToLongBits(init)}L)"
    val tmp = ctx.freshName("dot")
    nullSafeCodeGen(ctx, ev, c => s"""
      Object $tmp = graft.ext.BucketLoops.dotDouble($c, $wRef, $initLit);
      if ($tmp == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ((Double) $tmp).doubleValue(); }""")
  }

  override protected def withNewChildInternal(newChild: Expression): BucketDotDoubleExpr =
    copy(child = newChild)
}

object BucketExprs {
  def sumLong(buckets: Column, weights: Array[Long], init: Long = 0L): Column =
    bridge.column(BucketSumLongExpr(bridge.expression(buckets), weights, init))
  def dotDouble(buckets: Column, weights: Array[Double], init: Double): Column =
    bridge.column(BucketDotDoubleExpr(bridge.expression(buckets), weights, init))
}
