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

  /** Deterministic shard key: a content hash of the whole row, NOT
    * spark_partition_id/monotonically_increasing_id. Those are
    * recompute-unstable — after a fetch failure partially re-runs a map
    * stage, re-executed rows land in different (key, _salt) shuffle
    * partitions, and reducers that already fetched the old output can
    * double-count or drop rows (the SPARK-23207/SPARK-38388 class of
    * bug). Hashing row content is retry-stable: a re-executed map task
    * reproduces byte-identical shard assignments.
    *
    * Known limit, accepted on purpose: EXACT-duplicate rows co-shard
    * (identical content ⇒ identical hash). No retry-stable expression
    * can split them — any disambiguator that differs between identical
    * rows is, by definition, derived from physical position, which is
    * what breaks under partial stage retry. In practice this rarely
    * matters for [[saltedAgg]]: Spark's partial (map-side) hash
    * aggregate collapses duplicates of a (key, _salt) group within
    * each map partition before the shuffle, so reduce-side volume per
    * shard is bounded by the map-task count, not the duplicate count.
    * Callers whose hot rows are exact duplicates AND carry a stable
    * unique column (doc id, line id) should include it in the frame —
    * it feeds the hash and restores full spread. */
  private def shard(df: DataFrame, salt: Int): Column =
    pmod(abs(xxhash64(df.columns.map(col): _*)), lit(salt.toLong))

  /** Salted two-phase aggregation. Result ≡ `df.groupBy(keys).agg(count,
    * sum(valueCol), min, max)` but with bounded per-task key volume.
    * Shuffle 1 carries (keys, salt) — `salt`× more groups, each `salt`×
    * smaller; shuffle 2 carries one row per (keys, shard). */
  def saltedAgg(df: DataFrame, keys: Seq[String], valueCol: String, salt: Int = 16): DataFrame = {
    require(salt >= 1)
    val keyCols = keys.map(col)
    df.withColumn("_salt", shard(df, salt))
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
    val saltedFact = fact.withColumn("_salt", shard(fact, salt))
    val explodedDim = dim.withColumn("_salt", explode(sequence(lit(0L), lit(salt - 1L))))
    saltedFact.join(explodedDim, Seq(key, "_salt")).drop("_salt")
  }
}
