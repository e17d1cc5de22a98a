package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalar int8 embedding quantization — the 4× memory/bandwidth lever
  * for vector search at corpus scale (a 100 TB float32 embedding store
  * becomes 25 TB, and the ANN candidate scan becomes integer
  * arithmetic). Max-abs symmetric scheme, one scale per vector:
  * `q_i = round_half_up(v_i · 127 / max|v|)`, stored as
  * struct(scale = max|v|/127, q = array<long of int8 range>).
  *
  * Determinism: rounding is explicit `floor(x + 0.5)` (round half
  * toward +∞) — IEEE-identical on any engine given identical input
  * doubles, unlike engine-native round() (SURVEY §7.1: Spark rounds
  * doubles via decimal HALF_UP, DuckDB in binary FP). Float inputs
  * widen to double exactly, so the whole pipeline is cross-engine
  * byte-stable — proven by the q_quantize oracle row.
  *
  * Scale shape: map-only, shuffle-free; quantized dot products
  * ([[dotQ]]) are exact integer folds rescaled once per pair. */
object Quantize {

  /** Append `outCol` = struct(scale, q) int8 quantization of `vecCol`.
    * A DataFrame-level API (not a Column kernel) deliberately: the
    * max|v| reduction must be MATERIALIZED before the per-element
    * divide — as an inline expression argument Catalyst would re-inline
    * (and re-evaluate) it for every element (SURVEY §7.1 HOF-inlining
    * trap, dim× the work). Zero vectors quantize to scale 0, all-zero
    * q (no NaN escape). */
  def quantizeInt8(df: DataFrame, vecCol: String, outCol: String): DataFrame =
    df.withColumn("_qmax",
        array_max(transform(col(vecCol), v => abs(v.cast("double")))))
      .withColumn(outCol, struct(
        when(col("_qmax") === 0, lit(0.0))
          .otherwise(col("_qmax") / 127.0).as("scale"),
        transform(col(vecCol), v =>
          when(col("_qmax") === 0, lit(0L))
            .otherwise(floor(v.cast("double") * 127.0 / col("_qmax") + 0.5)
              .cast("long"))).as("q")))
      .drop("_qmax")

  /** Reconstruct the (lossy) double vector from a quantized struct. */
  def dequantize(qc: Column): Column =
    transform(qc.getField("q"), x => x.cast("double") * qc.getField("scale"))

  /** Dot product of two quantized vectors: exact integer fold, rescaled
    * once — `Σ qa_i·qb_i · scale_a·scale_b`. The integer fold is
    * overflow-safe to dim ≈ 2^47 (|q| ≤ 127 → |q·q| ≤ 16129 per term). */
  def dotQ(a: Column, b: Column): Column =
    dotQParts(a.getField("q"), a.getField("scale"),
      b.getField("q"), b.getField("scale"))

  /** [[dotQ]] over split (q, scale) columns — the persisted-index form
    * (Ivf.saveIndexQ stores q as array<tinyint> and scale separately).
    * The integer fold is the fused codegen DotQExpr (elements widen to
    * long inside the loop, so byte-typed storage can't overflow its
    * own width); [[dotQPartsHof]] is the spec twin. */
  def dotQParts(qa: Column, scaleA: Column, qb: Column, scaleB: Column): Column =
    org.apache.spark.sql.graft.bridge.column(graft.functions.DotQExpr(
      org.apache.spark.sql.graft.bridge.expression(qa),
      org.apache.spark.sql.graft.bridge.expression(qb)))
      .cast("double") * scaleA * scaleB

  /** HOF spec form of [[dotQParts]] — kept as the differential-test
    * reference (identical exact-integer fold, interpreted lambdas). */
  def dotQPartsHof(qa: Column, scaleA: Column, qb: Column, scaleB: Column): Column =
    aggregate(
      zip_with(qa, qb, (x, y) => x.cast("long") * y.cast("long")),
      lit(0L), (acc, v) => acc + v)
      .cast("double") * scaleA * scaleB
}
