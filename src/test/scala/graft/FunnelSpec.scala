package graft

import org.apache.spark.sql.functions._

/** Round-9: conversion-funnel ordering semantics — a later step
  * counts only when it happens strictly AFTER the user's previous
  * step, not merely anywhere in their history. */
class FunnelSpec extends SparkSpec {

  import spark.implicits._

  test("funnel counts honor strict event order per user") {
    // u1: clean view→click→purchase; u2: click BEFORE its only view
    // (no step-2); u3: view+click but purchase precedes the click;
    // u4: view only
    val events = Seq(
      (1L, "view", 100L), (1L, "click", 200L), (1L, "purchase", 300L),
      (2L, "click", 100L), (2L, "view", 200L),
      (3L, "view", 100L), (3L, "purchase", 150L), (3L, "click", 200L),
      (4L, "view", 500L)
    ).toDF("user_id", "event_type", "ts")
    val v = events.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
    val c = events.filter(col("event_type") === "click").join(v, "user_id")
      .filter(col("ts") > col("t1"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t2"))
    val p = events.filter(col("event_type") === "purchase").join(c, "user_id")
      .filter(col("ts") > col("t2"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t3"))
    assert(v.collect().map(_.getLong(0)).toSet == Set(1L, 2L, 3L, 4L))
    assert(c.collect().map(_.getLong(0)).toSet == Set(1L, 3L),
      "u2's click precedes its first view and must not count")
    assert(p.collect().map(_.getLong(0)).toSet == Set(1L),
      "u3's purchase precedes its qualifying click and must not count")
  }
}
