package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.Funnel

class FunnelSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def ev(rows: (Long, String, String)*) =
    rows.map { case (u, t, e) => (u, ts(t), e) }.toDF("user_id", "ts", "event_type")

  test("strict order: stage events before the predecessor don't convert") {
    val df = ev(
      (1L, "2024-01-01 10:00:00", "view"),
      (1L, "2024-01-01 09:00:00", "click"),  // before the view → ignored
      (1L, "2024-01-01 11:00:00", "click"),
      (1L, "2024-01-01 12:00:00", "purchase"),
      (2L, "2024-01-01 10:00:00", "view"))   // never clicks
    val r = Funnel.funnelTimes(df, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"))
      .collect().map(x => x.getAs[Long]("user_id") -> x).toMap
    assert(r(1L).getAs[Long]("reached") === 3L)
    assert(r(1L).getAs[Timestamp]("t2") === ts("2024-01-01 11:00:00"))
    assert(r(2L).getAs[Long]("reached") === 1L)
    assert(r(2L).isNullAt(r(2L).fieldIndex("t2")))
    assert(r(2L).isNullAt(r(2L).fieldIndex("t3")))
  }

  test("greedy pick: earliest valid event chosen, ties to later stages") {
    val df = ev(
      (1L, "2024-01-01 10:00:00", "view"),
      (1L, "2024-01-01 10:30:00", "click"),
      (1L, "2024-01-01 11:00:00", "click"),   // second click irrelevant
      (1L, "2024-01-01 10:45:00", "purchase")) // after the FIRST click
    val r = Funnel.funnelTimes(df, "user_id", "ts", "event_type",
      Seq("view", "click", "purchase")).head()
    assert(r.getAs[Timestamp]("t2") === ts("2024-01-01 10:30:00"))
    assert(r.getAs[Timestamp]("t3") === ts("2024-01-01 10:45:00"))
  }

  test("deadline: conversion past maxGap does not count, nor fall through") {
    val df = ev(
      (1L, "2024-01-01 10:00:00", "view"),
      (1L, "2024-01-01 13:00:00", "click"),   // 3 h after view
      (2L, "2024-01-01 10:00:00", "view"),
      (2L, "2024-01-01 10:30:00", "click"),
      (2L, "2024-01-01 14:00:00", "purchase")) // 3.5 h after click
    val r = Funnel.funnelTimes(df, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"), maxGapSeconds = Some(3600L))
      .collect().map(x => x.getAs[Long]("user_id") -> x).toMap
    assert(r(1L).getAs[Long]("reached") === 1L) // click missed the 1 h window
    assert(r(2L).getAs[Long]("reached") === 2L) // purchase missed it
  }

  test("deadline boundary is inclusive") {
    val df = ev(
      (1L, "2024-01-01 10:00:00", "view"),
      (1L, "2024-01-01 11:00:00", "click")) // exactly maxGap later
    val r = Funnel.funnelTimes(df, "user_id", "ts", "event_type",
      Seq("view", "click"), maxGapSeconds = Some(3600L)).head()
    assert(r.getAs[Long]("reached") === 2L)
  }

  test("conversion report: non-increasing stage counts") {
    val df = ev(
      (1L, "2024-01-01 10:00:00", "view"),
      (1L, "2024-01-01 10:10:00", "click"),
      (2L, "2024-01-01 10:00:00", "view"),
      (3L, "2024-01-01 09:00:00", "click")) // click with no view: stage-1 miss
    val c = Funnel.conversion(df, "user_id", "ts", "event_type",
        Seq("view", "click"))
      .collect().map(x => x.getLong(0) -> x.getAs[Long]("n_users")).toMap
    assert(c(1L) === 2L)
    assert(c(2L) === 1L)
  }

  test("conversion report: stage names with SQL metacharacters are literal-safe") {
    val df = ev(
      (1L, "2024-01-01 10:00:00", "it's a view"),
      (1L, "2024-01-01 10:10:00", "click -- not a comment"))
    val c = Funnel.conversion(df, "user_id", "ts", "event_type",
        Seq("it's a view", "click -- not a comment"))
      .collect().map(x => x.getString(1) -> x.getAs[Long]("n_users")).toMap
    assert(c === Map("it's a view" -> 1L, "click -- not a comment" -> 1L))
  }
}
