package graft

import java.sql.Timestamp
import graft.operators.Events

class EventsSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("retention: cohort by signup week, pre-signup activity ignored") {
    val df = Seq(
      // user 1: signs up Mon 2024-01-01 week, active that week and +2
      (1L, ts("2024-01-02 10:00:00"), "signup"),
      (1L, ts("2024-01-03 10:00:00"), "click"),
      (1L, ts("2024-01-16 10:00:00"), "click"),
      // user 2: activity BEFORE signup must not count as retention
      (2L, ts("2024-01-01 09:00:00"), "view"),
      (2L, ts("2024-01-09 10:00:00"), "signup"),
      // user 3: never signs up → not in any cohort
      (3L, ts("2024-01-02 10:00:00"), "view"))
      .toDF("user_id", "ts", "event_type")
    val r = Events.retention(df, "user_id", "ts", "event_type", "signup")
      .collect()
      .map(x => (x.getAs[Timestamp]("cohort_week").toString.take(10),
        x.getAs[Long]("week_offset")) -> x.getAs[Long]("n_users")).toMap
    // user 1 cohort 2024-01-01: offsets 0 (signup+click) and 2
    assert(r(("2024-01-01", 0L)) === 1L)
    assert(r(("2024-01-01", 2L)) === 1L)
    // user 2 cohort 2024-01-08: offset 0 only (the 01-01 view is ignored)
    assert(r(("2024-01-08", 0L)) === 1L)
    assert(r.size === 3)
  }

  test("transitions: per-user adjacencies, last event emits nothing") {
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, ts("2024-01-01 10:01:00"), "click"),
      (1L, ts("2024-01-01 10:02:00"), "purchase"),
      (2L, ts("2024-01-01 10:00:00"), "view"),
      (2L, ts("2024-01-01 10:05:00"), "view"))
      .toDF("user_id", "ts", "event_type")
    val r = Events.transitions(df, "user_id", "ts", "event_type")
      .collect()
      .map(x => (x.getString(0), x.getString(1)) -> x.getAs[Long]("n")).toMap
    assert(r === Map(
      ("view", "click") -> 1L,
      ("click", "purchase") -> 1L,
      ("view", "view") -> 1L))
  }

  test("transitions: idCol breaks timestamp ties deterministically") {
    val t0 = ts("2024-01-01 10:00:00")
    val df = Seq( // both events share a timestamp — id decides the order
      (1L, t0, 2L, "b"),
      (1L, t0, 1L, "a"),
      (1L, ts("2024-01-01 10:01:00"), 3L, "c"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val r = Events.transitions(df, "user_id", "ts", "event_type", Some("event_id"))
      .collect()
      .map(x => (x.getString(0), x.getString(1)) -> x.getAs[Long]("n")).toMap
    assert(r === Map(("a", "b") -> 1L, ("b", "c") -> 1L))
  }

  test("attribution: last vs first touch, strictly-before, direct=null") {
    val df = Seq(
      // user 1: view, click, purchase → last=click, first=view
      (1L, ts("2024-01-01 10:00:00"), 1L, "view"),
      (1L, ts("2024-01-01 10:01:00"), 2L, "click"),
      (1L, ts("2024-01-01 10:02:00"), 3L, "purchase"),
      // user 2: purchase BEFORE any touch → direct (null); the later
      // view must not be credited (strictly-before frame)
      (2L, ts("2024-01-01 09:00:00"), 4L, "purchase"),
      (2L, ts("2024-01-01 09:30:00"), 5L, "view"),
      // user 3: two purchases share the earlier view; the click between
      // them only switches last-touch credit for the second
      (3L, ts("2024-01-01 08:00:00"), 6L, "view"),
      (3L, ts("2024-01-01 08:10:00"), 7L, "purchase"),
      (3L, ts("2024-01-01 08:20:00"), 8L, "click"),
      (3L, ts("2024-01-01 08:30:00"), 9L, "purchase"))
      .toDF("user_id", "ts", "event_id", "event_type")
    def credits(model: String): Map[Long, Option[String]] =
      Events.attribution(df, "user_id", "ts", "event_id", "event_type",
          Seq("view", "click"), "purchase", model)
        .collect()
        .map(r => r.getAs[Long]("event_id") ->
          Option(r.getAs[String]("channel"))).toMap
    assert(credits("last") === Map(
      3L -> Some("click"), 4L -> None, 7L -> Some("view"), 9L -> Some("click")))
    assert(credits("first") === Map(
      3L -> Some("view"), 4L -> None, 7L -> Some("view"), 9L -> Some("view")))
  }

  test("attributionLinear: equal split over preceding touches only") {
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "view"),
      (1L, ts("2024-01-01 10:01:00"), 2L, "click"),
      (1L, ts("2024-01-01 10:02:00"), 3L, "purchase"), // view+click → ½ each
      (1L, ts("2024-01-01 10:03:00"), 4L, "view"),
      (1L, ts("2024-01-01 10:04:00"), 5L, "purchase"), // 3 touches → ⅓ each
      (2L, ts("2024-01-01 09:00:00"), 6L, "purchase")) // no touches → no rows
      .toDF("user_id", "ts", "event_id", "event_type")
    val rows = Events.attributionLinear(df, "user_id", "ts", "event_id",
        "event_type", Seq("view", "click"), "purchase")
      .select("event_id", "channel", "n_touches", "weight").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(rows.count(_._1 == 3L) === 2)
    rows.filter(_._1 == 3L).foreach { case (_, _, n, w) =>
      assert(n === 2L && math.abs(w - 0.5) < 1e-12)
    }
    assert(rows.count(_._1 == 5L) === 3)
    rows.filter(_._1 == 5L).foreach { case (_, _, n, w) =>
      assert(n === 3L && math.abs(w - 1.0 / 3.0) < 1e-12)
    }
    assert(!rows.exists(_._1 == 6L))
    // total credit per conversion sums to 1
    assert(math.abs(rows.filter(_._1 == 3L).map(_._4).sum - 1.0) < 1e-12)
  }
}
