package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._

/** One-pass centered-dosage kernel for GRM/PCA (SURVEY §4.2 escalation
  * (2b), same rationale as [[GtStats]]): the HOF formulation in
  * `Kinship.withDosStats` + `centeredDosages` walks each variant's
  * 2000-wide gt array ~6 interpreted times (dosage transform, called
  * filter, size, sum, z transform); this expression does ONE fused,
  * codegen'd pass:
  *
  *   centered_dosages(gt) = struct<z: array<double>, p: double, w: double>
  *
  * with z_i = dosage_i − 2p for called samples and 0.0 for missing
  * (mean imputation — contributes nothing to any product), p the
  * alt-allele frequency over called dosages (T / 2n), w = 2p(1−p) the
  * VanRaden denominator weight. NULL when no sample is called (p
  * undefined — the row `Kinship.centeredDosages` drops).
  *
  * Semantics pinned ≡ the HOF path by KinshipSpec's property test; the
  * integer oracle path (`grmPairs`, q_grm) stays on the HOF kernels
  * unchanged. */
case class CenteredDosages(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(ArrayType(IntegerType)))
  override def nullable: Boolean = true
  override def prettyName: String = "centered_dosages"
  override def dataType: DataType = CenteredDosages.schema

  protected override def nullSafeEval(gtVal: Any): Any = {
    val arr = gtVal.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val dos = new Array[Int](n)
    var t = 0L
    var called = 0L
    var si = 0
    while (si < n) {
      // declared input type admits null sample arrays / null alleles
      // (containsNull=true); both mean "no call" — same as allele -1,
      // matching the null-tolerant HOF twin (Kinship.centeredDosagesHof)
      val s = if (arr.isNullAt(si)) null else arr.getArray(si)
      var d = 0
      var miss = s == null
      if (!miss) {
        val p = s.numElements()
        var j = 0
        while (j < p) {
          if (s.isNullAt(j)) miss = true
          else {
            val a = s.getInt(j)
            if (a == -1) miss = true else d += a
          }
          j += 1
        }
      }
      if (miss) dos(si) = -1
      else { dos(si) = d; t += d; called += 1 }
      si += 1
    }
    if (called == 0) return null
    val pHat = t.toDouble / (called.toDouble * 2.0)
    val z = new Array[Double](n)
    var i = 0
    while (i < n) {
      z(i) = if (dos(i) >= 0) dos(i).toDouble - 2.0 * pHat else 0.0
      i += 1
    }
    new GenericInternalRow(Array[Any](
      new GenericArrayData(z), pHat, 2.0 * pHat * (1.0 - pHat)))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val code = nullSafeCodeGen(ctx, ev, arrTerm => {
      val dos = ctx.freshName("dos")
      val t = ctx.freshName("t")
      val called = ctx.freshName("called")
      val n = ctx.freshName("n")
      val si = ctx.freshName("si")
      val s = ctx.freshName("s")
      val p = ctx.freshName("p")
      val d = ctx.freshName("d")
      val miss = ctx.freshName("miss")
      val j = ctx.freshName("j")
      val a = ctx.freshName("a")
      val pHat = ctx.freshName("pHat")
      val z = ctx.freshName("z")
      val i = ctx.freshName("i")
      s"""
         |final int $n = $arrTerm.numElements();
         |int[] $dos = new int[$n];
         |long $t = 0L;
         |long $called = 0L;
         |for (int $si = 0; $si < $n; $si++) {
         |  // null sample array / null allele = no call (matches nullSafeEval)
         |  org.apache.spark.sql.catalyst.util.ArrayData $s =
         |    $arrTerm.isNullAt($si) ? null : $arrTerm.getArray($si);
         |  int $d = 0;
         |  boolean $miss = ($s == null);
         |  if (!$miss) {
         |    final int $p = $s.numElements();
         |    for (int $j = 0; $j < $p; $j++) {
         |      if ($s.isNullAt($j)) { $miss = true; }
         |      else {
         |        final int $a = $s.getInt($j);
         |        if ($a == -1) { $miss = true; } else { $d += $a; }
         |      }
         |    }
         |  }
         |  if ($miss) { $dos[$si] = -1; }
         |  else { $dos[$si] = $d; $t += $d; $called++; }
         |}
         |if ($called == 0L) {
         |  ${ev.isNull} = true;
         |} else {
         |  final double $pHat = (double) $t / ((double) $called * 2.0);
         |  double[] $z = new double[$n];
         |  for (int $i = 0; $i < $n; $i++) {
         |    $z[$i] = $dos[$i] >= 0 ? (double) $dos[$i] - 2.0 * $pHat : 0.0;
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |    new Object[]{ new org.apache.spark.sql.catalyst.util.GenericArrayData($z),
         |                  java.lang.Double.valueOf($pHat),
         |                  java.lang.Double.valueOf(2.0 * $pHat * (1.0 - $pHat)) });
         |}
       """.stripMargin
    })
    // nullSafeCodeGen assumes non-null output for non-null input; the
    // called==0 branch above sets isNull itself, which it supports as
    // long as isNull is a var (it is, for nullable expressions)
    code
  }

  override protected def withNewChildInternal(newChild: Expression): CenteredDosages =
    copy(child = newChild)
}

object CenteredDosages {
  val schema: StructType = StructType(Seq(
    StructField("z", ArrayType(DoubleType, containsNull = false), nullable = false),
    StructField("p", DoubleType, nullable = false),
    StructField("w", DoubleType, nullable = false)))

  def of(gt: Column): Column = bridge.column(CenteredDosages(bridge.expression(gt)))
}
