package graft.examples

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Events, Funnel}

/** Scale rehearsal for the event-analytics operators: a deterministic
  * synthetic event stream generated ON EXECUTORS (spark.range
  * arithmetic, no driver collect, no RNG), then wall-times for funnel,
  * retention, transition-matrix and funnel-conversion at a size where
  * per-task behavior matches a 1000-executor cluster reading 100 TB of
  * clickstream. Timings comparable WITHIN one run only (shared box).
  * Run: sbt "runMain graft.examples.EventsScaleDemo [nEvents]". */
object EventsScaleDemo {

  /** Synthetic clickstream: `nEvents` events over nEvents/200 users.
    * Each user's k-th event lands ~1.5 h after the previous (dense
    * enough that 24 h funnel deadlines actually convert), user start
    * dates stagger over 60 days (so retention cohorts span weeks); all
    * arithmetic deterministic per id. */
  def synthEvents(spark: SparkSession, nEvents: Long): DataFrame = {
    val i = col("_i")
    val nUsers = math.max(nEvents / 200L, 1L)
    val user = pmod(i * 48271L, lit(nUsers))
    val k = floor(i / nUsers) // the user's event sequence number
    // xxhash64, not a linear congruence: the per-user id stride is a
    // multiple of 100, so `i·c mod 100` would be CONSTANT per user
    // (every user one event type — nobody converts past stage 1)
    val stage = pmod(xxhash64(i), lit(100L)) // 0..99 deterministic mix
    spark.range(nEvents).select(col("id").as("_i")).select(
      user.as("user_id"),
      timestamp_seconds(lit(1700000000L) +
        pmod(user * 7919L, lit(60L * 86400L)) + // staggered start date
        k * 5400L +                             // ~1.5 h cadence
        pmod(i * 104729L, lit(3600L))).as("ts"),
      when(stage < 35, "view").when(stage < 55, "click")
        .when(stage < 70, "purchase").when(stage < 90, "signup")
        .otherwise("error").as("event_type"))
  }

  def main(args: Array[String]): Unit = {
    val nEvents = args.headOption.map(_.toLong).getOrElse(20000000L)
    val spark = SparkSession.builder()
      .appName("events-scale-demo")
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val events = synthEvents(spark, nEvents).localCheckpoint()
    ScaleDemo.time(s"generate ${nEvents / 1000000}M events")(events.count())

    // noop-sink writes, not count(): count() lets Catalyst prune the
    // computed columns (a funnel "timing" that never runs the funnel)
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    ScaleDemo.time("funnelTimes view→click→purchase (24 h deadline)") {
      noop(Funnel.funnelTimes(events, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"), Some(86400L)))
    }
    ScaleDemo.time("conversion report (same funnel)") {
      Funnel.conversion(events, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"), Some(86400L)).collect().foreach(r =>
        println(s"    stage ${r.get(0)} ${r.get(1)}: ${r.get(2)} users"))
    }
    ScaleDemo.time("retention triangle (signup cohorts)") {
      noop(Events.retention(events, "user_id", "ts", "event_type", "signup"))
    }
    ScaleDemo.time("transition matrix") {
      noop(Events.transitions(events, "user_id", "ts", "event_type"))
    }
    spark.stop()
  }
}
