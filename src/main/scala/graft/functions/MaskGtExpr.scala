package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._

/** Codegen'd per-call masking (the depth/GQ→missing rewrite,
  * `min_depth_gt_to_missing`): sample i's genotype becomes all -1 when
  * metric[i] is null or < threshold, else passes through unchanged.
  *
  * Matches GenotypeKernels.maskGtByDepth/maskGtByQual (interpreted
  * zip_with) exactly — FiltersSpec + the masking property test pin the
  * semantics; this form keeps the pipeline's mask stage inside
  * whole-stage codegen. Metric may be array<int> (DP) or array<double>
  * (GQ). NaN metric entries: `NaN < t` is false in both forms, so a NaN
  * GQ keeps its call — identical to the HOF `when(q < t, …)` behavior.
  */
case class MaskGt(gt: Expression, metric: Expression, threshold: Double)
    extends BinaryExpression with ExpectsInputTypes {

  override def left: Expression = gt
  override def right: Expression = metric

  private lazy val metricIsInt: Boolean =
    metric.dataType.asInstanceOf[ArrayType].elementType == IntegerType

  override def inputTypes: Seq[DataType] = Seq(
    ArrayType(ArrayType(IntegerType)),
    metric.dataType match {
      case a: ArrayType => a
      case _ => ArrayType(IntegerType)
    })

  // echoing the metric's own type back in inputTypes admits ANY element
  // type — but the kernel reads int or double slots only, and a float/
  // long metric would be read with the wrong width (garbage masking,
  // no error). Enforce the documented contract here.
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    metric.dataType match {
      case ArrayType(IntegerType, _) | ArrayType(DoubleType, _) =>
        super.checkInputDataTypes()
      case other => TypeCheckResult.TypeCheckFailure(
        s"mask_gt metric must be array<int> (DP) or array<double> (GQ), got ${other.sql}")
    }
  }

  override def dataType: DataType = gt.dataType
  override def prettyName: String = "mask_gt"

  protected override def nullSafeEval(gtVal: Any, mVal: Any): Any = {
    val g = gtVal.asInstanceOf[ArrayData]
    val m = mVal.asInstanceOf[ArrayData]
    val n = g.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      // a null sample stays null (the zip_with HOF twin's behavior) —
      // numElements() on the null array would NPE in the masked branch
      if (g.isNullAt(i)) out(i) = null
      else {
        val s = g.getArray(i)
        val masked = i >= m.numElements() || m.isNullAt(i) ||
          (if (metricIsInt) m.getInt(i) < threshold else m.getDouble(i) < threshold)
        out(i) =
          if (!masked) s
          else new GenericArrayData(Array.fill[Any](s.numElements())(-1))
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (gTerm, mTerm) => {
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val masked = ctx.freshName("masked")
      val j = ctx.freshName("j")
      val arr = ctx.freshName("arr")
      val getter = if (metricIsInt) s"$mTerm.getInt($i)" else s"$mTerm.getDouble($i)"
      // Bit-pattern literal: interpolating the raw double would render
      // NaN/Infinity as `NaN`/`Infinity` — not valid Java literals — and
      // Janino failure silently degrades the stage to interpreted eval.
      val thresholdLit =
        s"Double.longBitsToDouble(${java.lang.Double.doubleToLongBits(threshold)}L)"
      s"""
         |final int $n = $gTerm.numElements();
         |Object[] $out = new Object[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($gTerm.isNullAt($i)) { $out[$i] = null; continue; }
         |  org.apache.spark.sql.catalyst.util.ArrayData $s = $gTerm.getArray($i);
         |  boolean $masked = $i >= $mTerm.numElements() || $mTerm.isNullAt($i) ||
         |  $getter < $thresholdLit;
         |  if (!$masked) {
         |    $out[$i] = $s;
         |  } else {
         |    int[] $arr = new int[$s.numElements()];
         |    for (int $j = 0; $j < $arr.length; $j++) { $arr[$j] = -1; }
         |    $out[$i] = new org.apache.spark.sql.catalyst.util.GenericArrayData($arr);
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): MaskGt =
    copy(gt = newLeft, metric = newRight)
}

object MaskGt {
  def of(gt: Column, metric: Column, threshold: Double): Column =
    bridge.column(MaskGt(bridge.expression(gt), bridge.expression(metric), threshold))
}
