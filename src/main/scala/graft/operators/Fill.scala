package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap filling for sparse observations: replace nulls with the nearest
  * non-null value along an ordering, per key — the time-series
  * forward/backward fill every sensor/metrics pipeline runs before
  * aggregation, and the array-free analog of the reference's
  * missing-value masking (a masked cell is a null to be imputed).
  *
  * One window per direction over the SAME (key, order) sort — filling k
  * columns adds k window expressions, not k shuffles; Spark computes
  * them in a single Window operator. `last(ignoreNulls)` over an
  * unbounded-preceding frame is O(1) running state per partition, not
  * a per-row scan — this holds at any partition size. */
object Fill {

  private def ffillWindow(partitionCols: Seq[String], orderCols: Seq[String]) =
    Window.partitionBy(partitionCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

  private def bfillWindow(partitionCols: Seq[String], orderCols: Seq[String]) =
    Window.partitionBy(partitionCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)

  /** Nulls take the most recent non-null value per key (rows before the
    * first observation stay null). */
  def forwardFill(df: DataFrame, partitionCols: Seq[String],
                  orderCols: Seq[String], cols: Seq[String]): DataFrame = {
    val w = ffillWindow(partitionCols, orderCols)
    cols.foldLeft(df)((acc, c) => acc.withColumn(c, last(col(c), ignoreNulls = true).over(w)))
  }

  /** Nulls take the next non-null value per key (rows after the last
    * observation stay null). */
  def backwardFill(df: DataFrame, partitionCols: Seq[String],
                   orderCols: Seq[String], cols: Seq[String]): DataFrame = {
    val w = bfillWindow(partitionCols, orderCols)
    cols.foldLeft(df)((acc, c) => acc.withColumn(c, first(col(c), ignoreNulls = true).over(w)))
  }

  /** Forward fill, then backward fill the leading-null prefix, then a
    * constant for keys with no observation at all — the standard
    * "complete" imputation. */
  def fill(df: DataFrame, partitionCols: Seq[String], orderCols: Seq[String],
           cols: Seq[String], default: Column): DataFrame = {
    val filled = backwardFill(
      forwardFill(df, partitionCols, orderCols, cols),
      partitionCols, orderCols, cols)
    cols.foldLeft(filled)((acc, c) => acc.withColumn(c, coalesce(col(c), default)))
  }
}
