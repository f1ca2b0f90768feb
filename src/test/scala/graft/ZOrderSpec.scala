package graft

import graft.functions.ZOrder64
import graft.ops.Layout
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkSpec {

  test("bit interleave is exact") {
    assert(ZOrder64.zorder(3L, 0L) == 5L)   // 11 -> 0101
    assert(ZOrder64.zorder(0L, 3L) == 10L)  // 11 -> 1010
    assert(ZOrder64.zorder(0xffffffffL, 0L) == 0x5555555555555555L)
    assert(ZOrder64.zorder(0L, 0xffffffffL) == 0xaaaaaaaaaaaaaaaaL)
    // commutes with the reference bit-by-bit definition
    for (a <- Seq(0L, 1L, 7L, 12345L); b <- Seq(0L, 2L, 9L, 54321L)) {
      var want = 0L
      for (i <- 0 until 32) {
        want |= ((a >> i) & 1L) << (2 * i)
        want |= ((b >> i) & 1L) << (2 * i + 1)
      }
      assert(ZOrder64.zorder(a, b) == want)
    }
  }

  test("z-sorted layout keeps a 2-D box in one chunk; row-major spreads it") {
    // 16x16 grid; 16 chunks of 16 rows = simulated row groups
    val pts = for (x <- 0 until 16; y <- 0 until 16) yield (x.toLong, y.toLong)
    def chunksTouched(sorted: Seq[(Long, Long)]): Int =
      sorted.grouped(16).zipWithIndex
        .count { case (chunk, _) => chunk.exists { case (x, y) => x < 4 && y < 4 } }
    val zSorted = pts.sortBy { case (x, y) => ZOrder64.zorder(x, y) }
    val rowMajor = pts.sortBy { case (x, y) => (x, y) }
    assert(chunksTouched(zSorted) == 1)   // the 4x4 box IS the first z block
    assert(chunksTouched(rowMajor) == 4)  // x=0..3 each in a different chunk
  }

  test("codegen expression + SQL registration agree with the kernel") {
    import spark.implicits._
    val df = Seq((5L, 3L), (0L, 0L), (123456L, 654321L)).toDF("a", "b")
      .withColumn("z", ZOrder64(col("a"), col("b")))
    val rows = df.collect()
    rows.foreach(r => assert(r.getLong(2) == ZOrder64.zorder(r.getLong(0), r.getLong(1))))
    val viaSql = spark.sql("SELECT zorder64(5L, 3L) AS z").head().getLong(0)
    assert(viaSql == ZOrder64.zorder(5L, 3L))
  }

  test("writeZOrdered roundtrip preserves rows") {
    val out = tmpDir("zorder") + "/events_z"
    val ev = eventsUs(s"${sf()}/events.parquet")
      .withColumn("ts_bucket", expr("ts_us div 3600000000")) // hour buckets
    Layout.writeZOrdered(ev, out, "user_id", "ts_bucket")
    val back = spark.read.parquet(out)
    assert(back.count() == ev.count())
    assert(back.columns.sorted.toSeq == ev.columns.sorted.toSeq)
  }
}
