package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.Streams

/** Replays the driver's events table through MemoryStream and checks the
  * stateful sessionizer agrees with the batch q_sessionize query on
  * closed sessions. Run: sbt "runMain graft.examples.StreamingDemo [sfDir]". */
object StreamingDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val events = graft.Queries.events(spark, sfDir)
      .select(col("user_id"), col("ts"), col("value"))
      .as[(Long, java.sql.Timestamp, Double)]
      .collect()
      .map { case (u, t, v) => Streams.Event(u, t, v) }
      .sortBy(_.ts.getTime)

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[Streams.Event]
    val q = Streams.sessionize(input.toDS(), gapMs = 30 * 60000L)
      .writeStream.format("memory").queryName("live_sessions").outputMode("append").start()

    // replay in 4 chunks (multi-batch state), then a far-future flush event
    val chunks = events.grouped(math.max(1, events.length / 4)).toSeq
    chunks.foreach { c => input.addData(c.toSeq); q.processAllAvailable() }
    val flushTs = new java.sql.Timestamp(events.last.ts.getTime + 365L * 86400000L)
    input.addData(Streams.Event(-1L, flushTs, 0.0))
    q.processAllAvailable()
    input.addData(Streams.Event(-1L, new java.sql.Timestamp(flushTs.getTime + 86400000L), 0.0))
    q.processAllAvailable()
    q.stop()

    val streamed = spark.sql(
      "SELECT userId, count(*) AS n_sessions FROM live_sessions WHERE userId >= 0 GROUP BY userId")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    val batch = graft.Queries.byName("q_sessionize").build(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    val mismatches = batch.filter { case (u, n) => streamed.getOrElse(u, -1L) != n }
    println(s"STREAMDEMO users=${batch.size} streamed_users=${streamed.size} mismatches=${mismatches.size}")
    if (mismatches.nonEmpty)
      mismatches.take(5).foreach { case (u, n) =>
        println(s"  user $u: batch=$n streamed=${streamed.getOrElse(u, -1L)}")
      }
    assert(mismatches.isEmpty, "streaming/batch sessionization disagree")
    spark.stop()
  }
}
