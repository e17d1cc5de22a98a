package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) data layout: interleave the bits of several scan
  * dimensions into one sort key so that range-partitioning + sorting by
  * it co-locates rows that are close in EVERY dimension at once — the
  * multi-dimensional clustering trick behind Delta/Iceberg Z-ORDER
  * compaction, built here from plain Catalyst bit expressions.
  *
  * Why it matters at 100 TB: parquet prunes with per-file/rowgroup
  * min-max stats, which only help along the sort order. Sorting by
  * (a, b) makes pruning on `b` useless; sorting by `zvalue(a, b)` keeps
  * both columns' min-max ranges tight in every file, so a predicate on
  * EITHER dimension (or both) skips most files at the scan — no index
  * structure, no second copy of the data.
  *
  * The expression is a static tree of shift/and/or built-ins — fully
  * whole-stage-codegen'd, no UDF, no hashing — and deterministic, so
  * the arithmetic is replicable in any engine with integer division
  * (the q_zorder oracle recomputes it in DuckDB from first principles).
  */
object ZOrder {

  /** Morton code of non-negative integer columns, `bits` low bits each
    * (values are masked to `bits` bits first). Column i contributes its
    * bit j at output position `j * n + i` — the exact bit interleave.
    * Total output bits = `bits * cols.size` (≤ 63 enforced). */
  def zvalue(cols: Seq[Column], bits: Int): Column = {
    require(cols.nonEmpty, "zvalue needs at least one column")
    require(bits >= 1 && bits * cols.size <= 63,
      s"bits=$bits over ${cols.size} columns exceeds a signed 64-bit key")
    val n = cols.size
    val terms = for {
      (c, i) <- cols.zipWithIndex
      j <- 0 until bits
    } yield shiftleft(shiftright(c.cast("long"), j).bitwiseAND(lit(1L)), j * n + i)
    terms.reduce(_.bitwiseOR(_))
  }

  def zvalue(x: Column, y: Column, bits: Int): Column = zvalue(Seq(x, y), bits)

  /** Rewrite `df` into a Z-ordered layout: range-partition on the
    * Morton key (balanced output files via the range sampler), then
    * sort within partitions so parquet rowgroup min-max stats stay
    * tight on every constituent dimension. Write the result with any
    * sink; pruning needs no reader cooperation beyond standard
    * min-max skipping. */
  def layout(df: DataFrame, dims: Seq[String], bits: Int,
             numPartitions: Int): DataFrame = {
    val z = zvalue(dims.map(col), bits)
    df.withColumn("_z", z)
      .repartitionByRange(numPartitions, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
  }
}
