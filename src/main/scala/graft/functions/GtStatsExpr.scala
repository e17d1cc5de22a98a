package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._

/** One-pass genotype statistics as a native codegen'd Catalyst expression
  * (SURVEY.md §4.2 escalation (2b): HOF kernels → custom Expression).
  *
  * The HOF kernels (GenotypeKernels) are correct but interpreted — lambda
  * higher-order functions are CodegenFallback, and a stats report scans
  * the gt matrix several times (call rate, counts, het). `gt_stats`
  * computes everything in ONE fused loop inside whole-stage codegen:
  *
  *   gt_stats(gt, nAlleles) =
  *     struct<n_samples:int, n_called:bigint, n_het:bigint,
  *            counts:array<bigint>>
  *
  * Semantics pinned to the HOF kernels (property-tested equal):
  *   - a sample is called iff NO ploidy entry is -1; empty sample = called
  *   - het = called sample with ≥ 2 distinct entries
  *   - counts[i] counts every entry equal to i (0 ≤ i < nAlleles) across
  *     ALL samples, including partially-missing ones
  * Everything downstream (MAF, MAC, obs/exp het, freqs) is cheap
  * arithmetic over the returned struct.
  */
case class GtStats(gt: Expression, nAlleles: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def left: Expression = gt
  override def right: Expression = nAlleles

  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(ArrayType(IntegerType)), IntegerType)

  override def dataType: DataType = GtStats.schema

  override def prettyName: String = "gt_stats"

  protected override def nullSafeEval(gtVal: Any, naVal: Any): Any = {
    val arr = gtVal.asInstanceOf[ArrayData]
    val na = naVal.asInstanceOf[Int]
    val counts = new Array[Long](math.max(na, 0))
    var called = 0L
    var het = 0L
    val n = arr.numElements()
    var si = 0
    while (si < n) {
      // null sample array / null allele entry = no call (the
      // CenteredDosages convention; the declared input type admits
      // containsNull at both levels) — getInt on a null slot would
      // silently read 0 (a ref allele) and corrupt every stat
      if (arr.isNullAt(si)) { si += 1 }
      else {
        val s = arr.getArray(si)
        val p = s.numElements()
        var miss = false
        var isHet = false
        val first =
          if (p > 0 && !s.isNullAt(0)) s.getInt(0) else -1
        var j = 0
        while (j < p) {
          if (s.isNullAt(j)) miss = true
          else {
            val a = s.getInt(j)
            if (a == -1) miss = true
            else if (a >= 0 && a < na) counts(a) += 1
            if (a != first) isHet = true
          }
          j += 1
        }
        if (!miss) { called += 1; if (isHet) het += 1 }
        si += 1
      }
    }
    new GenericInternalRow(Array[Any](n, called, het, new GenericArrayData(counts)))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (arrTerm, naTerm) => {
      val counts = ctx.freshName("counts")
      val called = ctx.freshName("called")
      val het = ctx.freshName("het")
      val n = ctx.freshName("n")
      val si = ctx.freshName("si")
      val s = ctx.freshName("s")
      val p = ctx.freshName("p")
      val miss = ctx.freshName("miss")
      val isHet = ctx.freshName("isHet")
      val first = ctx.freshName("first")
      val j = ctx.freshName("j")
      val a = ctx.freshName("a")
      s"""
         |long[] $counts = new long[java.lang.Math.max($naTerm, 0)];
         |long $called = 0L;
         |long $het = 0L;
         |final int $n = $arrTerm.numElements();
         |for (int $si = 0; $si < $n; $si++) {
         |  if ($arrTerm.isNullAt($si)) { continue; }
         |  org.apache.spark.sql.catalyst.util.ArrayData $s = $arrTerm.getArray($si);
         |  final int $p = $s.numElements();
         |  boolean $miss = false;
         |  boolean $isHet = false;
         |  final int $first = ($p > 0 && !$s.isNullAt(0)) ? $s.getInt(0) : -1;
         |  for (int $j = 0; $j < $p; $j++) {
         |    if ($s.isNullAt($j)) { $miss = true; continue; }
         |    final int $a = $s.getInt($j);
         |    if ($a == -1) { $miss = true; }
         |    else if ($a >= 0 && $a < $naTerm) { $counts[$a]++; }
         |    if ($a != $first) { $isHet = true; }
         |  }
         |  if (!$miss) { $called++; if ($isHet) { $het++; } }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |  new Object[]{ java.lang.Integer.valueOf($n), java.lang.Long.valueOf($called),
         |                java.lang.Long.valueOf($het),
         |                new org.apache.spark.sql.catalyst.util.GenericArrayData($counts) });
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): GtStats =
    copy(gt = newLeft, nAlleles = newRight)
}

object GtStats {
  val schema: StructType = StructType(Seq(
    StructField("n_samples", IntegerType, nullable = false),
    StructField("n_called", LongType, nullable = false),
    StructField("n_het", LongType, nullable = false),
    StructField("counts", ArrayType(LongType, containsNull = false), nullable = false)))

  /** Column API: `GtStats.of(col("gt"), nAllelesCol)`. */
  def of(gt: Column, nAlleles: Column): Column =
    bridge.column(GtStats(bridge.expression(gt), bridge.expression(nAlleles)))
}
