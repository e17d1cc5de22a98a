package graft

import java.sql.Timestamp
import graft.operators.AsOf

/** Unit coverage for the as-of join operator (its strict form is also
  * oracle-checked end-to-end via q_join_asof). */
class AsOfSpec extends SparkTestBase {

  import spark.implicits._

  private def ts(min: Long) = new Timestamp(1700000000000L + min * 60000L)

  private val left = Seq(
    (1L, 10L, ts(10), "p1"),   // user 10, t=10
    (2L, 10L, ts(30), "p2"),   // user 10, t=30
    (3L, 20L, ts(5), "p3"),    // user 20, t=5 (no prior right)
    (4L, 20L, ts(50), "p4")    // user 20, t=50
  ).toDF("event_id", "uid", "lts", "tag")

  private val right = Seq(
    (10L, ts(10)),  // user 10, t=10 — equal to p1's ts
    (10L, ts(20)),  // user 10, t=20
    (20L, ts(40))   // user 20, t=40
  ).toDF("uid", "rts")

  test("strict: equal timestamps on the right are NOT visible") {
    val out = AsOf.joinAsOf(left, right, "uid", "lts", "rts", strict = true)
      .collect().map(r => r.getAs[Long]("event_id") ->
        Option(r.getAs[Timestamp]("asof_ts")).map(_.getTime)).toMap
    assert(out(1L).isEmpty)                    // only right row at SAME ts → excluded
    assert(out(2L).contains(ts(20).getTime))   // latest of 10,20 before 30
    assert(out(3L).isEmpty)                    // nothing before t=5
    assert(out(4L).contains(ts(40).getTime))
  }

  test("non-strict: equal timestamps match; every left row preserved") {
    val out = AsOf.joinAsOf(left, right, "uid", "lts", "rts", strict = false)
      .collect().map(r => r.getAs[Long]("event_id") ->
        Option(r.getAs[Timestamp]("asof_ts")).map(_.getTime)).toMap
    assert(out.size === 4)                     // left rows all preserved
    assert(out(1L).contains(ts(10).getTime))   // equal ts now visible
    assert(out(2L).contains(ts(20).getTime))
    assert(out(3L).isEmpty)
    assert(out(4L).contains(ts(40).getTime))
  }

  test("left payload columns pass through unchanged") {
    val out = AsOf.joinAsOf(left, right, "uid", "lts", "rts")
      .select("event_id", "tag").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out === Map(1L -> "p1", 2L -> "p2", 3L -> "p3", 4L -> "p4"))
  }

  test("maxGap tolerance: stale matches become null, fresh ones survive") {
    import org.apache.spark.sql.functions.expr
    // non-strict so p1 (t=10) matches the t=10 quote exactly
    val out = AsOf.joinAsOf(left, right, "uid", "lts", "rts", strict = false,
      maxGap = Some(expr("INTERVAL 5 MINUTES")))
      .collect().map(r => r.getAs[Long]("event_id") ->
        Option(r.getAs[Timestamp]("asof_ts")).map(_.getTime)).toMap
    assert(out(1L) === Some(ts(10).getTime)) // gap 0 ≤ 5 min
    assert(out(2L) === None) // t=30 vs quote t=20: 10 min gap → stale
    assert(out(3L) === None) // no prior quote at all
    assert(out(4L) === None) // t=50 vs quote t=40: 10 min gap → stale
    // boundary is inclusive: exactly 10 minutes with a 10-minute gap
    val incl = AsOf.joinAsOf(left, right, "uid", "lts", "rts", strict = false,
      maxGap = Some(expr("INTERVAL 10 MINUTES")))
      .collect().map(r => r.getAs[Long]("event_id") ->
        Option(r.getAs[Timestamp]("asof_ts")).map(_.getTime)).toMap
    assert(incl(2L) === Some(ts(20).getTime) && incl(4L) === Some(ts(40).getTime))
  }
}
