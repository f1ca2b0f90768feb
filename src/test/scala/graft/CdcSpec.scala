package graft

import graft.ops.Cdc
import org.apache.spark.sql.functions._

class CdcSpec extends SparkSpec {

  private def feed = {
    import spark.implicits._
    Seq(
      // key 1: I then two Us — final state is seq 3
      (1L, 1L, "I", "a"), (1L, 2L, "U", "b"), (1L, 3L, "U", "c"),
      // key 2: inserted then deleted — must vanish
      (2L, 1L, "I", "x"), (2L, 2L, "D", "x"),
      // key 3: deleted then re-inserted — must survive with the re-insert
      (3L, 1L, "I", "p"), (3L, 2L, "D", "p"), (3L, 3L, "I", "q"),
      // key 4: lone insert
      (4L, 9L, "I", "z")
    ).toDF("id", "seq", "op", "payload")
  }

  test("applyLatest keeps latest version per key and drops final deletes") {
    import spark.implicits._
    val got = Cdc.applyLatest(feed, "id", Seq("seq"), "op")
      .select("id", "seq", "payload").as[(Long, Long, String)]
      .collect().toSet
    assert(got == Set((1L, 3L, "c"), (3L, 3L, "q"), (4L, 9L, "z")))
  }

  test("applyLatest is idempotent: re-applying the snapshot is a no-op") {
    import spark.implicits._
    val snap = Cdc.applyLatest(feed, "id", Seq("seq"), "op")
    val again = Cdc.applyLatest(snap, "id", Seq("seq"), "op")
    assert(again.as[(Long, Long, String, String)].collect().toSet ==
      snap.as[(Long, Long, String, String)].collect().toSet)
  }

  test("multi-column sequence orders lexicographically") {
    import spark.implicits._
    val f = Seq(
      (1L, 1L, 5L, "U", "old"), (1L, 2L, 0L, "U", "new")
    ).toDF("id", "lsn", "sub", "op", "payload")
    val got = Cdc.applyLatest(f, "id", Seq("lsn", "sub"), "op")
      .select("payload").as[String].collect().toSeq
    assert(got == Seq("new"))
  }

  test("single shuffle: one key-partitioned window, no extra exchange") {
    val plan = Cdc.applyLatest(feed, "id", Seq("seq"), "op")
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1, plan)
  }
}
