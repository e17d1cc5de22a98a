package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Table-maintenance operators: latest-wins upsert (the MERGE INTO of
  * changelog ingestion, without a table format) and SCD-2 validity
  * intervals. The reference engine has no analog; these are the
  * keep-a-100-TB-corpus-current operators of the SURVEY.md §2.5
  * extension surface.
  *
  * Scale shape: both operators are ONE key-partitioned window over the
  * union/changelog — no join, no driver collect. Spark 4 plans the
  * rank-1 filter of [[upsert]] as partial + final WindowGroupLimit
  * (each map task pre-drops losers before the shuffle), so the
  * exchange moves O(live keys), not O(history). A pathologically hot
  * key (millions of versions of one row) is the usual window skew
  * hazard — AQE splits the sort, and upstream compaction
  * (`sources.Compact`) is the durable fix.
  */
object Merge {

  /** Latest-wins upsert of `changes` into `base` (same schema, plus an
    * optional tombstone column in both): per key, the row with the
    * highest `versionCol` wins; `base` rows rank below `changes` rows
    * at equal version. When `deleteCol` is set, a winning row with
    * that boolean true deletes the key entirely (the MERGE ... WHEN
    * MATCHED AND del THEN DELETE clause); the flag column is dropped
    * from the output, `versionCol` is kept.
    *
    * Determinism: (version, source-rank) must totally order each key's
    * rows — with non-unique versions WITHIN `changes`, add a tie-break
    * to `versionCol` upstream (e.g. a change-sequence number). */
  def upsert(base: DataFrame, changes: DataFrame, keys: Seq[String],
             versionCol: String, deleteCol: Option[String] = None): DataFrame = {
    require(keys.nonEmpty, "upsert needs at least one key column")
    val all = base.withColumn("_src", lit(0))
      .unionByName(changes.withColumn("_src", lit(1)))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(versionCol).desc, col("_src").desc)
    val winner = all.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn", "_src")
    deleteCol match {
      case Some(d) => winner.filter(!coalesce(col(d), lit(false))).drop(d)
      case None    => winner
    }
  }

  /** SCD-2 validity intervals from a change log: each change row
    * becomes a version valid from its own `tsCol` until the key's next
    * change (`valid_to` null = still current). `tieBreak` columns make
    * the per-key order total when `tsCol` alone has ties (two changes
    * in one grain — the interval between them is empty but the order,
    * and therefore the surviving current row, stays deterministic).
    *
    * One window (lead) per key partition — embarrassingly parallel
    * across keys; history length per key is the sort cost. */
  def scd2(changeLog: DataFrame, keys: Seq[String], tsCol: String,
           tieBreak: Seq[String] = Nil): DataFrame = {
    require(keys.nonEmpty, "scd2 needs at least one key column")
    val order = (col(tsCol) +: tieBreak.map(col)).map(_.asc)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    changeLog
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }
}
