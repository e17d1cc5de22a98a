package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling primitives for the 100 TB path.
  *
  * AQE's skew-join splitting covers joins; these cover skewed
  * AGGREGATION keys (a handful of keys holding most rows — the classic
  * web-corpus "en" language bucket). `saltedAgg` shards each key into
  * `salt` sub-keys for the partial aggregate, so no single task owns a
  * heavy hitter, then merges the shards in a second (tiny) aggregate.
  * Only algebraic (re-mergeable) aggregates are offered — count/sum/
  * min/max — which is exactly what makes the two-phase split correct.
  */
object Skew {

  /** Salted two-phase aggregation. Result ≡ `df.groupBy(keys).agg(count,
    * sum(valueCol), min, max)` but with bounded per-task key volume.
    * Shuffle 1 carries (keys, salt) — `salt`× more groups, each `salt`×
    * smaller; shuffle 2 carries one row per (keys, shard). */
  def saltedAgg(df: DataFrame, keys: Seq[String], valueCol: String, salt: Int = 16): DataFrame = {
    require(salt >= 1)
    val keyCols = keys.map(col)
    df.withColumn("_salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(salt)))
      .groupBy(keyCols :+ col("_salt"): _*)
      .agg(
        count(lit(1)).as("_cnt"),
        sum(col(valueCol)).as("_sum"),
        min(col(valueCol)).as("_min"),
        max(col(valueCol)).as("_max"))
      .groupBy(keyCols: _*)
      .agg(
        sum(col("_cnt")).as("cnt"),
        sum(col("_sum")).as("sum"),
        min(col("_min")).as("min"),
        max(col("_max")).as("max"))
  }

  /** Salted join for a skewed fact against a small-ish dim that is too
    * big to broadcast whole: explode the dim `salt`× (one copy per
    * shard), salt the fact rows, equi-join on (key, shard). Removes the
    * single-task hot key at the cost of `salt`× the dim shuffle volume —
    * the standard trade when AQE splitting isn't available (e.g. the
    * join feeds a co-partitioned downstream op). */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String, salt: Int = 16): DataFrame = {
    val saltedFact = fact.withColumn(
      "_salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(salt)))
    val explodedDim = dim.withColumn("_salt", explode(sequence(lit(0L), lit(salt - 1L))))
    saltedFact.join(explodedDim, Seq(key, "_salt")).drop("_salt")
  }
}
