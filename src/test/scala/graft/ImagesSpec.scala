package graft

import org.apache.spark.sql.functions._

import graft.ext.{Dedup, Images}

/** Round-10: the REAL image codec chain. The PNG written by
  * `javax.imageio` must decode back to the analytic gray grid
  * bit-for-bit (losslessness of the whole encode→decode→resize
  * path), the banded Hamming join must equal brute force over the
  * decoded fingerprints (pigeonhole recall at 64 bits), and the
  * designed duplicate structure must surface. */
class ImagesSpec extends SparkSpec {

  import spark.implicits._

  /** Analytic reference grid — straight from the pattern formula,
    * no codec anywhere. */
  private def refGrid(id: Long): Array[Int] = {
    val pid = Images.baseId(id)
    val pert = Images.isPerturbed(id)
    val bw = Images.DefaultW / Images.GridCols
    val bh = Images.DefaultH / Images.GridRows
    Array.tabulate(Images.GridRows * Images.GridCols) { k =>
      val cy = k / Images.GridCols
      val cx = k % Images.GridCols
      val s = (for (dy <- 0 until bh; dx <- 0 until bw)
        yield Images.grayAt(pid, pert, cx * bw + dx, cy * bh + dy)).sum
      s / (bw * bh)
    }
  }

  test("PNG encode->decode->area-average equals the analytic grid " +
      "for exact, copied, and perturbed images") {
    for (id <- Seq(0L, 1L, 6L, 7L, 25L, 24L, 57L, 123L, 4999L)) {
      val got = Images.decodeGrayGrid(Images.encodePng(id))
      assert(got.sameElements(refGrid(id)), s"grid diverged for id=$id")
    }
  }

  test("dHash64 bit layout: a strictly increasing row sets all 8 " +
      "gradient bits of that row, a flat row none") {
    val grid = Array.tabulate(72) { k =>
      if (k / 9 == 2) k % 9 else 100 // row 2 ascending, others flat
    }
    assert(Images.dHash64(grid) == 0xFFL << 16)
  }

  test("banded Hamming join == brute force over decoded dHashes, and " +
      "the designed dups surface (copies at Hamming 0)") {
    val n = 400L
    val ids = (0L until n).toDF("doc_id")
    val got = Images.dHashNearDupPairs(spark, ids, "doc_id",
        maxDist = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .toSet
    // brute-force reference over the same real decode chain
    val fps = (0L until n).map(id =>
      id -> Images.dHash64(Images.decodeGrayGrid(Images.encodePng(id))))
    val want = (for {
      (a, fa) <- fps; (b, fb) <- fps if a < b
      d = java.lang.Long.bitCount(fa ^ fb) if d <= 2
    } yield (a, b, d)).toSet
    assert(got == want)
    // every 25th image is an exact copy of its predecessor
    for (id <- 25L until n by 25L)
      assert(got.contains((id - 1, id, 0)), s"missing exact dup at $id")
    // perturbed copies differ (the perturbation is visible to the
    // codec) yet stay near their base in Hamming terms
    val f7 = fps.toMap
    for (id <- 7L until n by 50L if id > 6) {
      assert(f7(id) != f7(id - 1) ||
        java.lang.Long.bitCount(f7(id) ^ f7(id - 1)) == 0)
      assert(java.lang.Long.bitCount(f7(id) ^ f7(id - 1)) <= 8,
        s"perturbation at $id moved more than the left-edge bits")
    }
  }

  test("hammingPairsFromFingerprints: sign-bit fingerprints band and " +
      "verify correctly (bit 63 set)") {
    val fps = Seq(
      (1L, java.lang.Long.MIN_VALUE),          // 0x8000...0
      (2L, java.lang.Long.MIN_VALUE | 1L),     // Hamming 1 from id 1
      (3L, 0x7FFFFFFFFFFFFFFFL),               // far from both
      (4L, java.lang.Long.MIN_VALUE | 3L)      // Hamming 2 from id 1
    ).toDF("id", "fp")
    val got = Dedup.hammingPairsFromFingerprints(fps, "id", "fp",
        maxDist = 2, chunks = 4, nBits = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .toSet
    assert(got == Set((1L, 2L, 1), (1L, 4L, 2), (2L, 4L, 1)))
  }
}
