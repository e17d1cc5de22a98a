package graft

import org.apache.spark.sql.SparkSession

/** One-call recommended session setup for the engine: registers the
  * optimizer extensions ([[graft.plans.GraftExtensions]] — without it
  * the library still works, but predicate shapes like
  * `jaccard(a,b) >= τ` stay unfused) and the configuration every main
  * and demo shares. Local-mode parallelism sizes the shuffle partition
  * count to the core count; on a real cluster drop `.master` and set
  * `spark.sql.shuffle.partitions` to 2-3× total executor cores (or
  * leave AQE coalescing to shrink it at runtime). */
object GraftSession {
  def builder(
      cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")): SparkSession.Builder =
    SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
}
