package graft.core

import org.apache.spark.sql.SparkSession

/** Shared join-planning helpers for the measured-broadcast discipline:
  * operators that know a side's real size (because they just
  * materialized it, or can bound it with one cheap aggregate) decide
  * broadcasts from MEASUREMENT against the session threshold instead
  * of trusting plan estimates — checkpointed frames inherit their
  * origin's estimate (clamped to "huge" by [[Checkpoints.cut]]), so
  * AQE alone systematically declines broadcasts these paths want
  * (`Dedup.maybeBroadcastDrops`, SURVEY §7.6) and would accept ones
  * they must not. */
object Joins {

  /** The session's auto-broadcast threshold in bytes; ≤ 0 means the
    * user disabled broadcasts for the session, and every measured
    * broadcast site honors that as "use the plain shuffle plan". */
  def broadcastThresholdBytes(spark: SparkSession): Long =
    spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
      // plain integers first: Spark itself accepts "-1"/"0" here, which
      // JavaUtils.byteStringAsBytes rejects (it requires a unit suffix
      // for anything it can't read as a non-negative byte count)
      .map(v => v.toLongOption.getOrElse(
        org.apache.spark.network.util.JavaUtils.byteStringAsBytes(v)))
      .getOrElse(10L * 1024 * 1024)
}
